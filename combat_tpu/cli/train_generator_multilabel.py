"""Multilabel (class-conditional) variant: G(x, class) can trigger toward any
class; the C-step poisons Bernoulli(pc) rows toward their own labels; the
G-step assigns each row a target class by contiguous chunks; eval loops every
target class.

Parity with reference ``train_generator_multilabel.py``
(``create_inputs_bd:67-75``, ``train:121-305``, ``eval:308-454``).
"""

from __future__ import annotations

from ..config import from_args
from ..train.variants import make_multilabel_eval_step, make_multilabel_train_step
from ._alternated import AlternatedSpec, run_alternated

SPEC = AlternatedSpec(
    name="multilabel",
    generator_kind="cunet",
    make_train_step=make_multilabel_train_step,
    make_eval_step=make_multilabel_eval_step,
    conditional=True,
)


def run(cfg):
    return run_alternated(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
