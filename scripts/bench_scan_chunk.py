"""Overhead of --scan_chunk at the headline operating point (internal tool).

scan_chunk bounds every epoch dispatch to <= N scan steps (the shared-TPU
tunnel kills the worker on multi-minute single executions — config.py).
Each extra dispatch costs one tunnel RPC (~75 ms in this container), so the
overhead is ~(#chunks - 1) * RPC / epoch.  This measures it directly: one
CIFAR-geometry epoch (391 steps of bs=128, the reference's 50k/128 epoch
shape) timed whole (chunk=0) vs chunked, on the real backend.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 128
N = 50048  # 391 full batches, no tail — isolates chunking from tail effects
REPS = 3


def main():
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
    from combat_tpu.models.layers import set_compute_dtype
    from combat_tpu.train import (
        init_frozen,
        init_train_state,
        multistep_lr,
        sgd_torch,
        train_epoch_alternated,
    )
    from combat_tpu.train.steps import make_alternated_train_step

    base = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
        bs=BATCH, compute_dtype="bfloat16"
    )
    set_compute_dtype(base.compute_dtype)
    C = get_classifier(base)
    G = get_generator(base, "unet")
    F = get_frequency_detector(base)
    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))
    tx = lambda lr: sgd_torch(multistep_lr(lr, base.schedulerC_milestones, base.schedulerC_lambda, 391))  # noqa: E731
    stateC = init_train_state(C, key, sample, tx(base.lr_C))
    stateG = init_train_state(G, jax.random.key(1), sample, tx(base.lr_G))
    cm = init_frozen(C, jax.random.key(2), sample)
    nF = init_frozen(F, jax.random.key(3), sample)
    step = make_alternated_train_step(base, C, G)
    # uint8 residency as in production (cli/common.py device_dataset)
    images = jax.random.randint(jax.random.key(4), (N, 32, 32, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    labels = jax.random.randint(jax.random.key(5), (N,), 0, 10)

    for chunk in (0, 128, 64, 32, 16):
        # warm compile + steady-state reps
        out = train_epoch_alternated(step, stateC, stateG, cm, nF, images, labels, key, BATCH, chunk=chunk)
        float(out[-1]["loss_ce"])
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = train_epoch_alternated(step, stateC, stateG, cm, nF, images, labels, key, BATCH, chunk=chunk)
            float(out[-1]["loss_ce"])  # value read fences the remote execution
            best = min(best, time.perf_counter() - t0)
        n_disp = 1 if chunk == 0 else -(-391 // chunk)
        print(
            f"chunk={chunk or 'off':>4}  dispatches/epoch={n_disp:3d}  "
            f"epoch={best * 1e3:8.1f} ms  {N / best:9.0f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
