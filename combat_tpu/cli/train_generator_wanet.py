"""WaNet-variant alternated training: G is a GridGenerator producing a
(B, s, s, 2) flow field; trigger = grid-sample through
``clamp(identity*(1-grid_rescale) + bicubic_upsample(flow)*grid_rescale)``.

Parity with reference ``train_generator_wanet.py`` (``train:95-305``,
``eval:308-456``, identity grid built in main ``:560-562``); the G L2 term is
``MSE(noise_grid, 0)`` (``:212``).
"""

from __future__ import annotations

from ..config import from_args
from ..train.variants import make_wanet_eval_step, make_wanet_train_step
from ._alternated import AlternatedSpec, run_alternated

SPEC = AlternatedSpec(
    name="wanet",
    generator_kind="grid",
    make_train_step=make_wanet_train_step,
    make_eval_step=make_wanet_eval_step,
)


def run(cfg):
    return run_alternated(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
