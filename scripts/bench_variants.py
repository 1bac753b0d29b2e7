"""Variant-pipeline step throughput (internal tool; feeds PERF.md).

Times one compiled epoch (lax.scan over 64 steps) of each trigger-variant
alternated train step — base additive, WaNet warp, input-aware (dual
stream), imperceptible (+TV), multilabel (per-class chunks) — plus the
victim step, at the canonical bs=128 bf16 operating point, and reports
img/s/chip and MFU from the compiled executable's cost model.

Run on the TPU (serialize with other TPU work):
  PYTHONPATH=/root/repo python scripts/bench_variants.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PEAK_BF16  # single source of truth for per-chip peaks

BATCH = 128
STEPS = 64

_X1 = None  # set in main() once BATCH geometry is known
_Y1 = None


def lower_flops(step, *args):
    """FLOPs/img from the compiled executable's cost model (None if the
    backend has no cost model)."""
    try:
        compiled = jax.jit(step).lower(*args).compile()
        return float(compiled.cost_analysis().get("flops", 0.0)) / BATCH
    except Exception:
        return None


def timed_row(name, run_epoch, carry, flops, peak):
    """Warm-up epoch, then one timed scan epoch (value-read fenced)."""
    carry, m = run_epoch(*carry, jax.random.key(10))
    float(m["loss_ce"])  # value-read fence
    t0 = time.perf_counter()
    carry, m = run_epoch(*carry, jax.random.key(11))
    float(m["loss_ce"])
    dt = time.perf_counter() - t0
    img_s = BATCH * STEPS / dt
    row = {"variant": name, "img_s_chip": round(img_s, 1)}
    if flops:
        row["gflops_per_img"] = round(flops / 1e9, 2)
        if peak:
            row["mfu"] = round(flops * img_s / peak, 3)
    print(json.dumps(row))
    return row


def main():
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.data import synthetic_dataset
    from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
    from combat_tpu.models.layers import set_compute_dtype
    from combat_tpu.train import (
        init_frozen,
        init_train_state,
        make_alternated_train_step,
        make_victim_train_step,
        multistep_lr,
        sgd_torch,
        train_epoch_alternated,
        train_epoch_classifier,
    )
    from combat_tpu.train.loop import train_epoch_alternated_pair
    from combat_tpu.train.variants import (
        make_imperceptible_train_step,
        make_inputaware_train_step,
        make_multilabel_train_step,
        make_wanet_train_step,
    )

    cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
        bs=BATCH, compute_dtype="bfloat16"
    )
    set_compute_dtype(cfg.compute_dtype)
    device_kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(device_kind)

    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))
    tx = lambda lr: sgd_torch(multistep_lr(lr, cfg.schedulerC_milestones, cfg.schedulerC_lambda, STEPS))  # noqa: E731

    C = get_classifier(cfg)
    F = get_frequency_detector(cfg)
    netF = init_frozen(F, jax.random.key(3), sample)
    clean_model = init_frozen(C, jax.random.key(2), sample)

    ds = synthetic_dataset(cfg, True, n=BATCH * STEPS)
    images = jnp.asarray(ds.images)
    labels = jnp.asarray(ds.labels)

    variants = {
        "base (additive)": ("unet", make_alternated_train_step, train_epoch_alternated, ()),
        "wanet (warp)": ("grid", make_wanet_train_step, train_epoch_alternated, ()),
        "inputaware (dual stream)": ("unet", make_inputaware_train_step, train_epoch_alternated_pair, ()),
        "imperceptible (+TV)": ("unet", make_imperceptible_train_step, train_epoch_alternated, ()),
        "multilabel (per-class)": ("cunet", make_multilabel_train_step, train_epoch_alternated,
                                   (jnp.zeros((1,), jnp.int32),)),
    }
    global _X1, _Y1
    _X1 = jnp.zeros((BATCH, 32, 32, 3))
    _Y1 = jnp.zeros((BATCH,), jnp.int32)
    rows = []
    for name, (gkind, mk_step, runner, g_extra) in variants.items():
        G = get_generator(cfg, gkind)
        stateC = init_train_state(C, key, sample, tx(cfg.lr_C))
        stateG = init_train_state(G, jax.random.key(1), sample, tx(cfg.lr_G), extra_args=g_extra)
        step = mk_step(cfg, C, G)
        batch = (_X1, _Y1, _X1) if runner is train_epoch_alternated_pair else (_X1, _Y1)
        flops = lower_flops(step, stateC, stateG, clean_model, netF, batch, key)

        def run_epoch(sC, sG, k, step=step, runner=runner):
            sC, sG, m = runner(step, sC, sG, clean_model, netF, images, labels, k, BATCH)
            return (sC, sG), m

        rows.append(timed_row(name, run_epoch, (stateC, stateG), flops, peak))

    # victim training step (classifier-only, frozen G)
    G = get_generator(cfg, "unet")
    stateC = init_train_state(C, key, sample, tx(cfg.lr_C))
    varsG = G.init({"params": jax.random.key(1)}, sample)
    vstep = make_victim_train_step(cfg, C, G)
    poisoned = jnp.asarray((ds.labels == cfg.target_label))
    flops = lower_flops(vstep, stateC, varsG["params"], (_X1, _Y1, jnp.zeros((BATCH,), bool)), key)

    def run_victim(sC, k):
        sC, m = train_epoch_classifier(
            vstep, sC, varsG["params"], images, labels, poisoned, k, BATCH, has_poison=True
        )
        return (sC,), m

    rows.append(timed_row("victim (classifier-only)", run_victim, (stateC,), flops, peak))


if __name__ == "__main__":
    main()
