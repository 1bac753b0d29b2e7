"""Input-aware variant: a second independent shuffled stream feeds a
cross-trigger loss ``cross_weight * CE(C(x + trigger(x2)), y)`` that forces
trigger non-reusability; cross accuracy is tracked train- and eval-side.

Parity with reference ``train_generator_inputaware.py`` (``train:141-336``,
``eval:339-508``, dual loaders ``:535-538``); G uses lr_C*0.1 with C's
milestones (``:120-127``); the checkpoint additionally stores the vestigial
``mask``/``pattern`` buffers and ``best_cross_acc`` (``:480-498,616-618``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import from_args
from ..train.variants import make_inputaware_eval_step, make_inputaware_train_step
from ._alternated import AlternatedSpec, run_alternated


def _mask_pattern(cfg, key):
    # reference :616-618: mask zeros with a 0.1 patch at [2:6, 2:6]; random pattern
    mask = np.zeros((cfg.input_height, cfg.input_width), np.float32)
    mask[2:6, 2:6] = 0.1
    pattern = jax.random.uniform(key, (cfg.input_height, cfg.input_width, cfg.input_channel))
    return {"mask": jnp.asarray(mask), "pattern": pattern}


SPEC = AlternatedSpec(
    name="inputaware",
    generator_kind="unet",
    make_train_step=make_inputaware_train_step,
    make_eval_step=make_inputaware_eval_step,
    pair=True,
    g_lr_from_c=True,
    track_cross=True,
    extra_ckpt=_mask_pattern,
)


def run(cfg):
    return run_alternated(cfg, SPEC)


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
