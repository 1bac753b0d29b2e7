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


def multistep_lr_resume(
    base_lr: float,
    milestones_epochs: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
    epochs_done: int,
    resume_step: int,
):
    """Epoch-indexed MultiStepLR parity across a ``--continue_training`` resume.

    torch's MultiStepLR counts EPOCHS: decay fires when the epoch counter
    passes a milestone, independent of steps/epoch (the reference reloads the
    scheduler state dict on resume, so its epoch counter just continues —
    ``train_generator.py:529-552``).  The optax schedule is step-indexed, so
    a resume whose step cadence changed (``--debug`` resume of a full-data
    run, a different ``--bs``) must re-anchor the remaining milestones on the
    NEW cadence: milestone ``m > epochs_done`` fires at
    ``resume_step + (m - epochs_done) * steps_per_epoch``, and milestones
    already passed fold into a single boundary at step 0 (active for every
    resumed step).  With an unchanged cadence (``resume_step ==
    epochs_done * steps_per_epoch``) this reproduces ``multistep_lr``
    exactly for all post-resume steps.
    """
    past = sum(1 for m in milestones_epochs if int(m) <= epochs_done)
    boundaries = {0: float(gamma) ** past} if past else {}
    for m in milestones_epochs:
        if int(m) > epochs_done:
            boundaries[int(resume_step) + (int(m) - epochs_done) * steps_per_epoch] = gamma
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
