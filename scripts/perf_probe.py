"""One-config throughput probe for the alternated step (internal tool).

Usage: python scripts/perf_probe.py <label> [cfg overrides as k=v ...]
Runs ONE configuration per process (each config is a separate XLA program;
keeping one per process avoids long multi-compile runs and mid-RPC kills).
"""

import os
import sys
import time

# runnable as `python scripts/perf_probe.py` from anywhere (the repo root is
# NOT on sys.path for direct script invocation — only scripts/ is)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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

STEPS = 32
BS = 128


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    overrides = {}
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        field_type = type(getattr(Config(), k))
        overrides[k] = field_type(v) if field_type is not bool else v == "True"
    # dataset=... re-applies that dataset's geometry preset (input size /
    # class count), so 224px imagenet10 operating points are probeable;
    # remaining k=v overrides (bs, remat, train_metrics, ...) apply on top.
    # BS is only a fallback when neither the preset nor the CLI names a
    # batch size (a hardcoded bs would probe 224px presets at 128 — OOM
    # risk and unrepresentative of the preset's operating point).
    dataset = overrides.pop("dataset", "cifar10")
    cfg = apply_dataset_preset(Config(dataset=dataset, synthetic_data=True))
    if "bs" not in overrides and dataset == "cifar10":
        overrides["bs"] = BS
    cfg = cfg.replace(**overrides)
    bs = cfg.bs
    from combat_tpu.models.layers import set_compute_dtype

    set_compute_dtype(cfg.compute_dtype)

    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    F = get_frequency_detector(cfg)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    tx = sgd_torch(multistep_lr(0.01, (100,), 0.1, STEPS))
    sC = init_train_state(C, key, x0, tx)
    sG = init_train_state(G, jax.random.key(1), x0, tx)
    cm = init_frozen(C, jax.random.key(2), x0)
    nf = init_frozen(F, jax.random.key(3), x0)
    ds = synthetic_dataset(cfg, True, n=bs * STEPS)
    imgs, labs = jnp.asarray(ds.images), jnp.asarray(ds.labels)
    step = make_alternated_train_step(cfg, C, G)

    t0 = time.perf_counter()
    sC, sG, m = train_epoch_alternated(step, sC, sG, cm, nf, imgs, labs, jax.random.key(5), bs)
    float(m["loss_ce"])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        sC, sG, m = train_epoch_alternated(step, sC, sG, cm, nf, imgs, labs, jax.random.fold_in(key, i), bs)
        float(m["loss_ce"])
        best = min(best, time.perf_counter() - t0)
    print(f"PERF {label}: {bs * STEPS / best:.0f} img/s  ({best:.3f}s/{STEPS} steps; compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
