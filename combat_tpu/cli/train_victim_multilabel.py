"""Multilabel victim — actually *continues* alternated G+C training from the
generator checkpoint (the reference script has the same structure as its
generator script and loads clean model + F detector + netG:
``train_victim_multilabel.py:121-305,495-520``)."""

from __future__ import annotations

from ..config import from_args
from ..train.variants import make_multilabel_eval_step, make_multilabel_train_step
from ._alternated import AlternatedSpec, run_alternated

SPEC = AlternatedSpec(
    name="victim_multilabel",
    generator_kind="cunet",
    make_train_step=make_multilabel_train_step,
    make_eval_step=make_multilabel_eval_step,
    conditional=True,
    load_g=True,
)


def run(cfg):
    return run_alternated(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
