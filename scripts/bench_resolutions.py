"""Alternated-step throughput across the reference's dataset geometries
(internal tool; feeds PERF.md).

The headline bench (bench.py) measures the canonical CIFAR-10 32px point;
the reference also claims CelebA 64px (bs=128) and ImageNet-10 224px
(bs=32) (`/root/reference/train_generator.py:470-487` dataset overrides).
This times one compiled scan epoch of the fused alternated step at each
geometry and reports img/s/chip + MFU — arithmetic intensity grows with
resolution, so MFU should rise toward the large-image regime.

Run on the TPU (serialize with other TPU work):
  PYTHONPATH=/root/repo python scripts/bench_resolutions.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PEAK_BF16

STEPS = 32


def main():
    from combat_tpu.config import Config, apply_dataset_preset
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

    peak = PEAK_BF16.get(jax.devices()[0].device_kind)

    # (dataset, bs) per the reference's per-dataset overrides
    for dataset, bs in (("cifar10", 128), ("celeba", 128), ("imagenet10", 32)):
        cfg = apply_dataset_preset(Config(dataset=dataset, synthetic_data=True)).replace(
            bs=bs, compute_dtype="bfloat16", synthetic_size=bs * STEPS
        )
        set_compute_dtype(cfg.compute_dtype)
        h, w, c = cfg.input_height, cfg.input_width, cfg.input_channel

        C = get_classifier(cfg)
        G = get_generator(cfg, "unet")
        F = get_frequency_detector(cfg)
        key = jax.random.key(0)
        sample = jnp.zeros((1, h, w, c))
        tx = lambda lr: sgd_torch(multistep_lr(lr, cfg.schedulerC_milestones, cfg.schedulerC_lambda, STEPS))  # noqa: E731
        stateC = init_train_state(C, key, sample, tx(cfg.lr_C))
        stateG = init_train_state(G, jax.random.key(1), sample, tx(cfg.lr_G))
        clean_model = init_frozen(C, jax.random.key(2), sample)
        netF = init_frozen(F, jax.random.key(3), sample)

        from combat_tpu.data import synthetic_dataset

        ds = synthetic_dataset(cfg, True, n=bs * STEPS)
        images = jnp.asarray(ds.images)
        labels = jnp.asarray(ds.labels)

        step = make_alternated_train_step(cfg, C, G)
        x1 = jnp.zeros((bs, h, w, c))
        y1 = jnp.zeros((bs,), jnp.int32)
        flops = None
        try:
            compiled = jax.jit(step).lower(stateC, stateG, clean_model, netF, (x1, y1), key).compile()
            flops = float(compiled.cost_analysis().get("flops", 0.0)) / bs
        except Exception:
            pass

        _, _, m = train_epoch_alternated(step, stateC, stateG, clean_model, netF, images, labels, jax.random.key(10), bs)
        float(m["loss_ce"])  # value-read fence
        t0 = time.perf_counter()
        _, _, m = train_epoch_alternated(step, stateC, stateG, clean_model, netF, images, labels, jax.random.key(11), bs)
        float(m["loss_ce"])
        dt = time.perf_counter() - t0

        img_s = bs * STEPS / dt
        row = {"geometry": f"{dataset} {h}px bs={bs}", "img_s_chip": round(img_s, 1)}
        if flops:
            row["gflops_per_img"] = round(flops / 1e9, 2)
            if peak:
                row["mfu"] = round(flops * img_s / peak, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
