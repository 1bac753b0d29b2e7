"""Ablation timing of the fused alternated step: where does the time go?

Times the canonical step (bs=128, bf16) and variants with one component
removed, on the real backend.  The deltas bound what any kernel-level work
on that component could win — run before writing Pallas (SURVEY.md §7.1.6:
kernelize only with benchmarks justifying each).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 128
STEPS = 64


def time_step(step, args, label):
    """Times STEPS scanned steps per dispatch (one epoch-style scan).

    Per-dispatch RPC latency to the remote chip is ~75 ms in this container
    — single-step timing measures the tunnel, not the compute (measured:
    90.9 ms/step dispatched singly vs 15.3 ms/step inside the scan).  The
    production loop (train/loop.py) always scans whole epochs, so the scan
    number is the real one."""
    from combat_tpu.train import train_epoch_alternated

    stateC, stateG, cm, nF, (x, y), key = args
    images = jnp.tile(x, (STEPS, 1, 1, 1))
    labels = jnp.tile(y, (STEPS,))
    out = train_epoch_alternated(step, stateC, stateG, cm, nF, images, labels, key, BATCH)
    float(out[-1]["loss_ce"])
    t0 = time.perf_counter()
    out = train_epoch_alternated(step, stateC, stateG, cm, nF, images, labels, key, BATCH)
    float(out[-1]["loss_ce"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{label:36s} {dt * 1e3:8.2f} ms/step  {BATCH / dt:9.0f} img/s", flush=True)
    return dt


def main():
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
    from combat_tpu.models.layers import set_compute_dtype
    from combat_tpu.train import init_frozen, init_train_state, multistep_lr, sgd_torch
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
    tx = lambda lr: sgd_torch(multistep_lr(lr, base.schedulerC_milestones, base.schedulerC_lambda, 100))  # noqa: E731
    stateC = init_train_state(C, key, sample, tx(base.lr_C))
    stateG = init_train_state(G, jax.random.key(1), sample, tx(base.lr_G))
    cm = init_frozen(C, jax.random.key(2), sample)
    nF = init_frozen(F, jax.random.key(3), sample)
    x = jax.random.uniform(jax.random.key(4), (BATCH, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.randint(jax.random.key(5), (BATCH,), 0, 10)
    args = lambda cfg: (stateC, stateG, cm, nF, (x, y), key)  # noqa: E731

    t_full = time_step(make_alternated_train_step(base, C, G), args(base), "full step (canonical)")
    variants = {
        "no augmentation": base.replace(post_transform_option="no_use"),
        "no blur (kernel_size=1)": base.replace(kernel_size=1, sigma=(1e-6, 1e-6)),
        "pallas low-pass": base.replace(pallas_lowfreq=True),
        "pallas fused trigger": base.replace(pallas_trigger=True),
        # production mode: metric-only forwards skipped, trajectory-identical
        # (tests/test_attack_train.py::test_loss_only_metrics_mode_is_trajectory_identical)
        "loss_only metrics": base.replace(train_metrics="loss_only"),
        # backward recomputes loss forwards instead of reading stored
        # activations — bandwidth<->FLOPs trade on the HBM-bound step
        # (tests/test_attack_train.py::test_remat_step_is_trajectory_identical)
        "remat step": base.replace(remat="step"),
        "remat + loss_only": base.replace(remat="step", train_metrics="loss_only"),
    }
    for label, cfg in variants.items():
        time_step(make_alternated_train_step(cfg, C, G), args(cfg), label)

    # float32 reference point
    set_compute_dtype("float32")
    C32 = get_classifier(base)
    G32 = get_generator(base, "unet")
    time_step(make_alternated_train_step(base.replace(compute_dtype="float32"), C32, G32),
              args(base), "float32 compute")
    set_compute_dtype(base.compute_dtype)
    print(f"full step baseline: {t_full * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
