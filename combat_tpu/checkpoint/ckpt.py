"""Checkpoint save/restore with the reference's key layout and gating.

The reference serializes flat dicts of ``state_dict()``s + best-metric floats
+ ``epoch_current`` via ``torch.save`` under
``checkpoints/<prefix>[_clean]/<dataset>/<dataset>_<prefix>[_clean].pth.tar``
(reference ``train_generator.py:441-457,497-499``), saving on a new best
clean accuracy (tie-broken by bd accuracy in the generator scripts,
``train_generator.py:433``).  We keep the same top-level keys (``netC``,
``optimizerC``, ``netG`` …) and path scheme (with ``.ckpt`` directories —
orbax checkpoints are directories, not tarballs) so resume semantics match
``--continue_training`` (``train_generator.py:529-552``).

Orbax gives TPU-friendly async-capable saves; here we use the synchronous
StandardCheckpointer over a pure-numpy pytree, which is preemption-safe
(atomic rename on finalize).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config


def ckpt_paths(cfg: Config, clean_suffix: bool = True) -> Tuple[str, str]:
    """(folder, path) under the reference scheme; ``clean_suffix`` matches the
    ``{prefix}_clean`` convention of the generator scripts."""
    mode = cfg.saving_prefix or "run"
    name = f"{mode}_clean" if clean_suffix else mode
    folder = os.path.join(cfg.checkpoints, name, cfg.dataset)
    path = os.path.join(folder, f"{cfg.dataset}_{name}.ckpt")
    return folder, path


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy(payload))


def load_checkpoint(path: str, template: Dict[str, Any] | None = None) -> Dict[str, Any]:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)


def load_checkpoint_compat(
    path: str,
    template: Dict[str, Any],
    optional: Tuple[str, ...] = ("F_detector_loaded", "scheduler_steps_per_epoch"),
) -> Dict[str, Any]:
    """Restore with ``template``, tolerating checkpoints written before the
    ``optional`` top-level keys existed (orbax structure matching rejects a
    template key with no on-disk counterpart).  Tries the full template
    first, then with all optional keys dropped, then each individually."""
    try:
        return load_checkpoint(path, template)
    except Exception:
        pass
    reduced = {k: v for k, v in template.items() if k not in optional}
    try:
        return load_checkpoint(path, reduced)
    except Exception:
        pass
    for k in optional:
        t = {kk: vv for kk, vv in template.items() if kk != k}
        try:
            return load_checkpoint(path, t)
        except Exception:
            continue
    return load_checkpoint(path, template)  # re-raise the original failure


def best_gate_clean(acc_clean: float, best_clean: float) -> bool:
    """Clean-classifier / victim save gate (train_clean_classifier.py:150)."""
    return acc_clean > best_clean


def best_gate_attack(acc_clean: float, acc_bd: float, best_clean: float, best_bd: float) -> bool:
    """Generator-script lexicographic gate (train_generator.py:433)."""
    return acc_clean > best_clean or (acc_clean == best_clean and acc_bd > best_bd)
