"""Alternated training of trigger generator G + surrogate classifier C.

CLI/semantics parity with reference ``train_generator.py``: per batch, (1) a
C-step on Bernoulli(pc)-poisoned target-class rows with clean labels, (2) a
G-step minimizing ``CE(C(aug(x_bd)), target) + L2_weight*MSE +
clean_model_weight*CE(cleanModel(aug(x_bd)), y)`` against a frozen clean
model, with frequency-detector evasion tracked as a metric
(``train:131-318``); eval-side Clean/Bd/F/clean-model metrics over non-target
rows (``eval:321-465``); lexicographic (clean acc, bd acc) best gate and the
full checkpoint key layout (``:433-457``); loads the pretrained frequency
detector and clean model (``main:503-527``); ``--continue_training`` resume
(``:529-552``).

TPU-native: the whole alternated batch (2 fwd+bwd + 4 aux forwards + trigger
synthesis + augs + metrics) is one fused jitted step, scanned over the epoch
(train/steps.py, train/loop.py).

Example (synthetic smoke):
  python -m combat_tpu.cli.train_clean_classifier --synthetic_data --debug \
      --n_iters 2 --saving_prefix cleanrun
  python -m combat_tpu.cli.train_generator --synthetic_data --debug \
      --n_iters 2 --saving_prefix atk --load_checkpoint_clean cleanrun
"""

from __future__ import annotations

from ..config import from_args
from ..train.steps import make_alternated_train_step, make_attack_eval_step
from ._alternated import AlternatedSpec, run_alternated

SPEC = AlternatedSpec(
    name="attack",
    generator_kind="unet",
    make_train_step=make_alternated_train_step,
    make_eval_step=make_attack_eval_step,
)


def run(cfg):
    return run_alternated(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
