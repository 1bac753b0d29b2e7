"""Roofline analysis of the fused alternated step (internal tool; feeds
PERF.md).

Quantifies how close the step runs to the hardware bound set by its own
shape mix: from the compiled executable's cost model take total FLOPs F and
HBM traffic B, compute arithmetic intensity I = F/B, and compare measured
step time against the roofline prediction max(F/peak_flops, B/peak_bw).
measured/predicted ~= 1 means the step is at the speed of light for its
shapes — the MFU gap is the workload's arithmetic-intensity profile (32px
convs + BN reductions), not scheduling or fusion waste.

TPU v5e (one chip): 197 TFLOP/s bf16, 819 GB/s HBM.

Run on the TPU (serialize with other TPU work):
  PYTHONPATH=/root/repo python scripts/roofline.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PEAK_BF16

PEAK_HBM_BW = {"TPU v5 lite": 819e9, "TPU v4": 1228e9, "TPU v5": 2765e9, "TPU v6 lite": 1640e9}

BATCH = 128
STEPS = 64


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

    cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
        bs=BATCH, compute_dtype="bfloat16"
    )
    set_compute_dtype(cfg.compute_dtype)
    kind = jax.devices()[0].device_kind
    peak_f, peak_b = PEAK_BF16.get(kind), PEAK_HBM_BW.get(kind)

    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    F = get_frequency_detector(cfg)
    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))
    tx = lambda lr: sgd_torch(multistep_lr(lr, cfg.schedulerC_milestones, cfg.schedulerC_lambda, STEPS))  # noqa: E731
    stateC = init_train_state(C, key, sample, tx(cfg.lr_C))
    stateG = init_train_state(G, jax.random.key(1), sample, tx(cfg.lr_G))
    clean_model = init_frozen(C, jax.random.key(2), sample)
    netF = init_frozen(F, jax.random.key(3), sample)

    step = make_alternated_train_step(cfg, C, G)
    x1 = jnp.zeros((BATCH, 32, 32, 3))
    y1 = jnp.zeros((BATCH,), jnp.int32)
    ca = jax.jit(step).lower(stateC, stateG, clean_model, netF, (x1, y1), key).compile().cost_analysis()
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))

    ds = synthetic_dataset(cfg, True, n=BATCH * STEPS)
    images, labels = jnp.asarray(ds.images), jnp.asarray(ds.labels)
    sC, sG, m = train_epoch_alternated(step, stateC, stateG, clean_model, netF, images, labels, jax.random.key(10), BATCH)
    float(m["loss_ce"])  # value-read fence
    t0 = time.perf_counter()
    sC, sG, m = train_epoch_alternated(step, sC, sG, clean_model, netF, images, labels, jax.random.key(11), BATCH)
    float(m["loss_ce"])
    step_s = (time.perf_counter() - t0) / STEPS

    out = {
        "device": kind,
        "step_gflops": round(flops / 1e9, 1),
        "step_hbm_gb": round(bytes_ / 1e9, 3),
        "arithmetic_intensity_flop_per_byte": round(flops / bytes_, 1) if bytes_ else None,
        "measured_step_ms": round(step_s * 1e3, 2),
    }
    if peak_f and peak_b:
        out["ridge_point_flop_per_byte"] = round(peak_f / peak_b, 1)
        t_compute, t_mem = flops / peak_f, bytes_ / peak_b
        out["roofline_pred_ms"] = round(max(t_compute, t_mem) * 1e3, 2)
        out["compute_bound_fraction"] = round(t_compute / (t_compute + t_mem), 3)
        out["measured_over_roofline"] = round(step_s / max(t_compute, t_mem), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
