"""Deterministic poison-index selection for victim training.

Parity with the reference ``PoisonedDataset._poison_flags``
(``utils/dataloader_cleanbd.py:142-150``): collect the indices whose label is
in the target set (the single ``--target_label`` for all2one, every class for
all2all), then sample a *fixed* subset of size ``int(pc * count)`` without
replacement.  The subset is chosen once per run from an explicit seed, so
victim training is reproducible — the reference relies on the global
``random`` module state instead.

The boolean-mask representation also fixes the reference's
``(poisoned is False).nonzero()`` bug (``train_victim.py:121``) by
construction: the train step consumes the mask directly
(``where(mask, x_bd, x)``), so non-poisoned rows can never be dropped.
"""

from __future__ import annotations

import numpy as np


def poison_flags(
    labels: np.ndarray,
    pc: float,
    target_label: int,
    attack_mode: str = "all2one",
    seed: int = 0,
) -> np.ndarray:
    """Return a fixed boolean (N,) mask of poisoned rows."""
    labels = np.asarray(labels)
    if attack_mode == "all2one":
        candidates = np.flatnonzero(labels == target_label)
    elif attack_mode == "all2all":
        candidates = np.arange(labels.shape[0])
    else:
        raise ValueError(f"{attack_mode} attack mode is not implemented")
    num_poisoned = max(0, int(pc * candidates.shape[0]))
    rng = np.random.RandomState(seed)
    chosen = rng.choice(candidates, size=num_poisoned, replace=False)
    mask = np.zeros(labels.shape[0], dtype=bool)
    mask[chosen] = True
    return mask
