"""Batch-size throughput sweep of the fused alternated step (internal tool;
feeds PERF.md).

The reference's canonical operating point is bs=128 (README.md:88-93) and
bench.py reports that point for parity.  This sweep measures where the chip's
MFU ceiling actually is when the batch grows (128 -> 1024): 32px conv layers
are arithmetic-intensity-poor at small batch, so throughput/MFU should rise
until HBM or VMEM pressure flattens it.  Prints one JSON row per batch size.

Run on the TPU (serialize with other TPU work):
  PYTHONPATH=/root/repo python scripts/bench_bs_sweep.py
CPU smoke:  BS_LIST=8,16 SWEEP_STEPS=2 JAX_PLATFORMS=cpu python scripts/bench_bs_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import PEAK_BF16  # single source of truth for per-chip peaks

STEPS = int(os.environ.get("SWEEP_STEPS", "64"))
BS_LIST = [int(b) for b in os.environ.get("BS_LIST", "128,256,512,1024").split(",")]


def main():
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.data import synthetic_dataset
    from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
    from combat_tpu.models.layers import set_compute_dtype
    from combat_tpu.train import (
        init_frozen,
        init_train_state,
        make_alternated_train_step,
        multistep_lr,
        sgd_torch,
        train_epoch_alternated,
    )

    device_kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(device_kind)
    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))

    for bs in BS_LIST:
        cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
            bs=bs, compute_dtype="bfloat16"
        )
        set_compute_dtype(cfg.compute_dtype)
        C = get_classifier(cfg)
        G = get_generator(cfg, "unet")
        F = get_frequency_detector(cfg)
        tx = lambda lr: sgd_torch(  # noqa: E731
            multistep_lr(lr, cfg.schedulerC_milestones, cfg.schedulerC_lambda, STEPS)
        )
        stateC = init_train_state(C, key, sample, tx(cfg.lr_C))
        stateG = init_train_state(G, jax.random.key(1), sample, tx(cfg.lr_G))
        clean_model = init_frozen(C, jax.random.key(2), sample)
        netF = init_frozen(F, jax.random.key(3), sample)
        step = make_alternated_train_step(cfg, C, G)

        ds = synthetic_dataset(cfg, True, n=bs * STEPS)
        images = jnp.asarray(ds.images)
        labels = jnp.asarray(ds.labels)

        flops_per_img = None
        try:
            x1 = jnp.zeros((bs, 32, 32, 3))
            y1 = jnp.zeros((bs,), jnp.int32)
            compiled = jax.jit(step).lower(stateC, stateG, clean_model, netF, (x1, y1), key).compile()
            flops_per_img = float(compiled.cost_analysis().get("flops", 0.0)) / bs
        except Exception:
            pass

        # warm-up epoch, then one timed scan epoch (value-read fenced — see bench.py)
        sC, sG, m = train_epoch_alternated(step, stateC, stateG, clean_model, netF, images, labels, jax.random.key(10), bs)
        float(m["loss_ce"])
        t0 = time.perf_counter()
        sC, sG, m = train_epoch_alternated(step, sC, sG, clean_model, netF, images, labels, jax.random.key(11), bs)
        float(m["loss_ce"])
        dt = time.perf_counter() - t0

        img_s = bs * STEPS / dt
        row = {"bs": bs, "img_s_chip": round(img_s, 1), "ms_per_step": round(dt / STEPS * 1e3, 2)}
        if flops_per_img:
            row["gflops_per_img"] = round(flops_per_img / 1e9, 2)
            if peak:
                row["mfu"] = round(flops_per_img * img_s / peak, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
