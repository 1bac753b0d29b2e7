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


# Above this size a split rides to (and lives on) the chip as uint8 —
# real image corpora are uint8 on disk anyway (the reference's tensors come
# from uint8 PIL frames, utils/dataloader.py ToTensor), and u8 residency
# quarters both HBM footprint and upload time (this container's device
# tunnel moves ~8-10 MB/s: a 13k-image 224px float32 split is an ~18-minute
# device_put and OOMs training).  CIFAR-scale splits (614 MB) stay float32,
# keeping the committed 32px evidence bit-identical.
_U8_RESIDENCY_BYTES = 1 << 30
# Row-block size for host-side quantization below: bounds the float
# temporaries of the quantize expression to ~this many bytes per block.
_QUANT_BLOCK_BYTES = 256 << 20


def device_dataset(cfg: Config, mesh, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray, ArrayDataset]:
    """Load a split and replicate it into HBM on every mesh device.

    Splits larger than ``_U8_RESIDENCY_BYTES`` are stored quantized
    (uint8); the epoch runners dequantize per batch
    (train/loop.py ``gather_batch``), which XLA fuses into the step."""
    ds = get_dataset(cfg, train)
    if ds.images.nbytes > _U8_RESIDENCY_BYTES:
        print(
            f"[combat-tpu] {'train' if train else 'test'} split "
            f"({ds.images.nbytes / 2**30:.2f} GB float32) stored on-device as uint8 "
            "(lossless for uint8-sourced corpora; <=1/255 quantization otherwise)"
        )
        # Quantize in ~256 MB row blocks: whole-split arithmetic would allocate
        # several full-size float temporaries (~5x the split) on exactly the
        # large-corpus path this branch exists to protect.
        u8 = np.empty(ds.images.shape, np.uint8)
        rows = max(1, _QUANT_BLOCK_BYTES // max(1, ds.images[0].nbytes))
        for i in range(0, ds.images.shape[0], rows):
            blk = ds.images[i : i + rows]
            u8[i : i + rows] = np.clip(np.round((blk + 1.0) * 127.5), 0, 255)
        images = replicate(mesh, jnp.asarray(u8))
    else:
        images = replicate(mesh, jnp.asarray(ds.images, dtype=jnp.float32))
    labels = replicate(mesh, jnp.asarray(ds.labels, dtype=jnp.int32))
    return images, labels, ds


def distributed_init_kwargs(cfg: Config) -> Optional[dict]:
    """kwargs for ``jax.distributed.initialize`` (None = single-process).

    On TPU pod slices the empty-kwargs form auto-detects coordinator and
    process topology from the TPU metadata; the explicit flags cover manual
    bring-up (e.g. DCN between CPU hosts).  Split out from :func:`build_mesh`
    so the decision logic is unit-testable without multiple processes."""
    if not cfg.multihost:
        return None
    kw: dict = {}
    if cfg.coordinator_address:
        kw["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes >= 0:
        kw["num_processes"] = cfg.num_processes
    if cfg.process_id >= 0:
        kw["process_id"] = cfg.process_id
    return kw


def build_mesh(cfg: Config):
    from ..models.layers import set_compute_dtype

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    kw = distributed_init_kwargs(cfg)
    if kw is not None:
        jax.distributed.initialize(**kw)
        print(f"[{BANNER}] multi-host: process {jax.process_index()}/{jax.process_count()}")
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
    """Optimizer steps per epoch: full batches + the ragged tail batch
    (train/loop.py runs the tail at its true shape, drop_last=False parity)."""
    return max(1, -(-n // bs))


def fmt_pct(x: float) -> str:
    return f"{x:.4f}"
