"""Observability: per-epoch metrics to console + JSONL (+ tensorboard).

Replaces the reference's per-batch ``progress_bar`` (reference
``utils/utils.py:55-94``) and per-epoch ``SummaryWriter.add_scalars``
(``train_generator.py:292-308``).  Per-batch console syncs are exactly what
the fused TPU step eliminates, so logging here is per-epoch: one JSONL line
(machine-readable, the primary record) and an optional tensorboard scalar
dump when the package is importable.  Wall-clock timing brackets each epoch
with ``block_until_ready`` already applied by the metric read-back, giving
honest images/sec (SURVEY.md §5 tracing note).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def log(self, epoch: int, scalars: Dict[str, float], group: str = "train") -> None:
        rec = {"epoch": epoch, "group": group, "time": time.time(), **scalars}
        self._file.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{group}/{k}", v, epoch)

    def log_images(self, epoch: int, images, tag: str = "Images", ncol: int = 16) -> None:
        """Tensorboard image grid of an NHWC [-1, 1] batch (the reference logs
        ``make_grid(cat([inputs, inputs_bd], dim=2))`` every 20 epochs,
        ``train_generator.py:310-315``).  No-op without tensorboard."""
        if self._tb is None:
            return
        import numpy as np

        arr = np.clip((np.asarray(images, dtype=np.float32) + 1.0) / 2.0, 0.0, 1.0)
        n, h, w, c = arr.shape
        ncol = min(ncol, n)
        nrow = (n + ncol - 1) // ncol
        grid = np.zeros((nrow * h, ncol * w, c), dtype=np.float32)
        for i in range(n):
            r, q = divmod(i, ncol)
            grid[r * h : (r + 1) * h, q * w : (q + 1) * w] = arr[i]
        self._tb.add_image(tag, grid.transpose(2, 0, 1), global_step=epoch)

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False


@contextmanager
def profile_epoch(profile_dir: str, epoch: int, first_epoch: int):
    """``jax.profiler.trace`` around one epoch (SURVEY.md §5 tracing plan).

    Traces the epoch AFTER the first one of the run (the first epoch is
    dominated by XLA compilation); no-op when ``profile_dir`` is empty.
    View with tensorboard's profile plugin or xprof."""
    if profile_dir and epoch == first_epoch + 1:
        import jax

        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield
