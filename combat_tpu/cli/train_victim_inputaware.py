"""Input-aware victim: standard additive-trigger victim training plus a
cross-trigger accuracy eval against a second shuffled test stream (reference
``train_victim_inputaware.py:88-160`` train, ``:162-254`` eval)."""

from __future__ import annotations

from ..config import from_args
from ..train.variants import make_inputaware_victim_eval_step
from ._victim import VictimSpec, run_victim

SPEC = VictimSpec(
    name="victim_inputaware",
    make_eval_step=make_inputaware_victim_eval_step,
    eval_pair=True,
    track_cross=True,
)


def run(cfg):
    return run_victim(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
