"""WaNet victim: fixed poisoned subset with the warp trigger; the checkpoint
additionally stores ``grid_rescale`` (reference ``train_victim_wanet.py:58-135``,
ckpt ``:196-205``)."""

from __future__ import annotations

from ..config import from_args
from ..train.variants import make_wanet_victim_eval_step, make_wanet_victim_train_step
from ._victim import VictimSpec, run_victim

SPEC = VictimSpec(
    name="victim_wanet",
    generator_kind="grid",
    make_train_step=make_wanet_victim_train_step,
    make_eval_step=make_wanet_victim_eval_step,
    extra_ckpt=lambda cfg: {"grid_rescale": cfg.grid_rescale},
)


def run(cfg):
    return run_victim(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
