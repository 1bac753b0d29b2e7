"""Imperceptible variant: adds ``tv_weight * total_variation(x_bd).mean()``
to the generator loss; otherwise identical to the base alternated training.

Parity with reference ``train_generator_imperceptible.py`` (``:228,235-237``;
``train:114-312``, ``eval:315-454``).
"""

from __future__ import annotations

from ..config import from_args
from ..train.steps import make_attack_eval_step
from ..train.variants import make_imperceptible_train_step
from ._alternated import AlternatedSpec, run_alternated

SPEC = AlternatedSpec(
    name="imperceptible",
    generator_kind="unet",
    make_train_step=make_imperceptible_train_step,
    make_eval_step=make_attack_eval_step,
)


def run(cfg):
    return run_alternated(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
