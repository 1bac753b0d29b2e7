"""Shared CLI harness: device data, mesh placement, resume, run dirs."""

from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import ArrayDataset, get_dataset
from ..train.mesh import make_mesh, replicate

BANNER = "combat-tpu"


def setup_run_dirs(cfg: Config, ckpt_folder: str, log_subdir: str = "log_dir", fresh: Optional[bool] = None) -> str:
    """Create/clean the run directory tree.  Starting fresh deletes the
    checkpoint folder like the reference (``train_generator.py:562``)."""
    if fresh is None:
        fresh = not cfg.continue_training
    if fresh:
        shutil.rmtree(ckpt_folder, ignore_errors=True)
    log_dir = os.path.join(ckpt_folder, log_subdir)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def device_dataset(cfg: Config, mesh, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray, ArrayDataset]:
    """Load a split and replicate it into HBM on every mesh device."""
    ds = get_dataset(cfg, train)
    images = replicate(mesh, jnp.asarray(ds.images, dtype=jnp.float32))
    labels = replicate(mesh, jnp.asarray(ds.labels, dtype=jnp.int32))
    return images, labels, ds


def build_mesh(cfg: Config):
    from ..models.layers import set_compute_dtype

    set_compute_dtype(cfg.compute_dtype)
    mesh = make_mesh(cfg.n_devices, cfg.dp_axis)
    print(f"[{BANNER}] mesh: {mesh.devices.size} device(s) on axis {mesh.axis_names!r}: "
          f"{[str(d) for d in mesh.devices.flat]}")
    return mesh


def ref_ckpt_path(checkpoints_root: str, name: str, dataset: str) -> str:
    """Reference path scheme ``<root>/<name>/<dataset>/<dataset>_<name>.ckpt``
    (reference ``train_generator.py:497-499,515-520``)."""
    return os.path.join(checkpoints_root, name, dataset, f"{dataset}_{name}.ckpt")


def steps_per_epoch(n: int, bs: int) -> int:
    return max(1, n // bs)


def fmt_pct(x: float) -> str:
    return f"{x:.4f}"
