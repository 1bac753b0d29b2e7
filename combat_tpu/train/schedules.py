"""Optimizers and LR schedules with torch-semantics parity.

The reference uses ``SGD(lr, momentum=0.9, weight_decay=5e-4, nesterov=True)``
+ ``MultiStepLR(milestones, gamma)`` stepped once per epoch for every net
(reference ``train_generator.py:123-126``).  Weight decay is applied to the
gradient before the momentum buffer (torch convention) — hence
``add_decayed_weights`` *before* the trace — and decays every parameter,
including BN affine params, as torch does.
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(base_lr: float, milestones_epochs: Sequence[int], gamma: float, steps_per_epoch: int):
    """MultiStepLR parity: lr = base * gamma^(#milestones passed), where the
    scheduler steps at the end of each epoch."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def sgd_torch(
    lr_schedule,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    nesterov: bool = True,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=lr_schedule, momentum=momentum, nesterov=nesterov),
    )
