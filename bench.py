"""Benchmark: alternated-training throughput (images/sec/chip).

Measures the fused alternated train step (C-step + G-step + trigger synthesis
+ augmentations + metrics — the hot loop of reference
``train_generator.py:170-290``) at the canonical operating point: CIFAR-10
geometry, PreActResNet18 surrogate + UNet generator, global batch 128
(reference ``README.md:88-93``, ``config.py:23-39``).  Data is synthetic and
device-resident (content doesn't affect throughput); timing uses a value read
(device_get) as the fence — some experimental PJRT backends report readiness
before remote execution completes, so ``block_until_ready`` alone is not one.
After a warm-compile epoch, two chained-dispatch windows (1 and 7 epochs,
fenced once each) are timed and the per-epoch slope is reported: this
subtracts the constant per-dispatch tunnel RPC latency (``dispatch_latency_s``
in the output; ~75 ms healthy, observed in the seconds when the shared tunnel
degrades), which production amortizes the same way by dispatching epochs
back-to-back asynchronously.

Baseline denominator (``vs_baseline``): the reference repo publishes no
throughput numbers (BASELINE.md) and this container has no CUDA GPU, so the
measured denominator is the reference's own hot loop re-created in torch and
run on this host's CPU (``bench_reference.py`` → ``BASELINE_MEASURED.json``).
That is a cross-hardware ratio (TPU chip vs host CPU) and is labeled as such.
Context published alongside it:

  * ``flops_per_img`` — XLA ``cost_analysis()`` of the compiled step;
  * ``mfu`` — achieved FLOP/s over the chip's bf16 peak;
  * ``jax_cpu_img_s`` — OUR step on the same host CPU: identical hardware
    and identical math land it in the same few-img/s band as torch (both
    FLOP-bound on one core), evidencing like-for-like work;
  * ``vs_est_gpu_range`` — first-principles bracket of the reference loop
    on a datacenter GPU, from the reference loop's FLOPs/img over
    peak×utilization (the reference runs the generator forward twice per
    batch; our step shares one forward via ``jax.vjp``, so the bracket is
    costed at ours + one extra G forward).
    Utilization for small-batch 32px torch conv training is measured in
    public practice at ~3-8% on A100-class parts (CIFAR ResNet18 loops run
    ~2.5-4.5k img/s ≈ 4-7.5 TFLOP/s vs a 156 TFLOP/s TF32 peak), and this
    loop adds per-batch host syncs and ``set_detect_anomaly(True)``; the
    bracket spans a generous [V100 fp32 @ 40%, A100 TF32 @ 15%] =
    [0.3k, 2.2k] img/s so the low multiplier is conservative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BATCH = 128
WARMUP_STEPS = 8
TIMED_STEPS = 64

# documented fallback if BASELINE_MEASURED.json is absent: the round-1
# engineering estimate of the reference loop on a modern datacenter GPU
FALLBACK_BASELINE_IMG_S = 1000.0

# bf16 peak FLOP/s per chip by device kind (public spec sheets)
PEAK_BF16 = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e (Trillium)
}

# first-principles GPU-estimate bracket (see module docstring):
# [generous A100 TF32 @ 15% util, V100 fp32 @ 40% util]
GPU_EST_HI_FLOPS, GPU_EST_LO_FLOPS = 156e12 * 0.15, 15.7e12 * 0.40


def _wait_for_backend() -> None:
    """Ride out transient axon-tunnel outages (init can block ~25 min then
    raise UNAVAILABLE; a failed backend is cached in-process, so retry by
    re-exec'ing)."""
    import sys

    try:
        jax.devices()
    except Exception as e:
        attempt = int(os.environ.get("BENCH_INIT_ATTEMPT", "0"))
        if attempt >= 4:
            raise
        print(f"backend init failed ({e}); retry {attempt + 1}/4 in 5 min", flush=True)
        os.environ["BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        time.sleep(300)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    _wait_for_backend()
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
    device_kind = jax.devices()[0].device_kind

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

    # FLOPs of one fused step from the compiled executable's cost model
    x1 = jnp.zeros((BATCH, 32, 32, 3))
    y1 = jnp.zeros((BATCH,), jnp.int32)
    flops_per_img = ref_flops_per_img = None
    try:
        compiled = jax.jit(step).lower(stateC, stateG, clean_model, netF, (x1, y1), key).compile()
        flops_per_img = float(compiled.cost_analysis().get("flops", 0.0)) / BATCH
        # The reference's loop runs the generator forward TWICE per batch
        # (C-step + inside the G-loss, train_generator.py:186,223); our step
        # shares one forward via jax.vjp (train/steps.py).  The GPU-estimate
        # bracket models the REFERENCE loop, so cost it with its own FLOPs:
        # ours + one extra G forward.
        g_fwd = (
            jax.jit(lambda p, xx: G.apply({"params": p}, xx))
            .lower(stateG.params, x1)
            .compile()
        )
        ref_flops_per_img = flops_per_img + float(g_fwd.cost_analysis().get("flops", 0.0)) / BATCH
    except Exception:
        pass  # cost model not available on every backend; fields stay null

    # Two-window chained-dispatch timing: each window dispatches a chain of
    # whole-epoch executions (fully async — states thread call-to-call) and
    # fences ONCE at the end, so the constant per-dispatch tunnel RPC latency
    # (~75 ms healthy, but observed seconds when the shared tunnel degrades)
    # appears once per window; the slope (t_long - t_short)/(n_long - n_short)
    # is the pure steady-state epoch time, which is what production pays
    # (train/loop.py dispatches epochs back-to-back the same way).
    def timed_epochs(step_fn, sC, sG, n, key0):
        m = None
        t0 = time.perf_counter()
        for i in range(n):
            sC, sG, m = train_epoch_alternated(
                step_fn, sC, sG, clean_model, netF, images, labels, jax.random.key(key0 + i), BATCH
            )
        float(m["loss_ce"])  # value-read fence (see module docstring)
        return sC, sG, time.perf_counter() - t0

    N_SHORT, N_LONG = 1, 7
    with mesh:
        stateC, stateG, m = train_epoch_alternated(
            step, stateC, stateG, clean_model, netF, images, labels, jax.random.key(10), BATCH
        )
        float(m["loss_ce"])  # warm compile
        stateC, stateG, t_short = timed_epochs(step, stateC, stateG, N_SHORT, 11)
        stateC, stateG, t_long = timed_epochs(step, stateC, stateG, N_LONG, 20)

    epoch_s = (t_long - t_short) / (N_LONG - N_SHORT)
    if epoch_s <= 0:  # pathological jitter: fall back to the long window whole
        epoch_s = t_long / N_LONG
    dispatch_latency_s = max(t_short - epoch_s * N_SHORT, 0.0)
    img_s = BATCH * TIMED_STEPS / epoch_s
    img_s_chip = img_s / n_chips

    # Production mode: --train_metrics loss_only drops the three metric-only
    # forwards the reference computes every batch (train_generator.py:214,227,
    # 245-247).  Trajectory-identical (tests/test_attack_train.py); reported
    # as a secondary number — the headline stays the full-metrics loop so the
    # vs_baseline ratio compares identical per-step work.
    step_fast = make_alternated_train_step(cfg.replace(train_metrics="loss_only"), C, G)
    with mesh:
        sC2, sG2, m = train_epoch_alternated(
            step_fast, stateC, stateG, clean_model, netF, images, labels, jax.random.key(12), BATCH
        )
        float(m["loss_ce"])  # warm compile
        sC2, sG2, tf_short = timed_epochs(step_fast, stateC, stateG, N_SHORT, 13)
        sC2, sG2, tf_long = timed_epochs(step_fast, sC2, sG2, N_LONG, 30)
    epoch_fast_s = (tf_long - tf_short) / (N_LONG - N_SHORT)
    if epoch_fast_s <= 0:
        epoch_fast_s = tf_long / N_LONG
    loss_only_img_s_chip = BATCH * TIMED_STEPS / epoch_fast_s / n_chips

    measured = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            measured = json.load(f)

    out = {
        "metric": "alternated-train images/sec/chip (CIFAR-10 PreActResNet18+UNet, bs=128)",
        "value": round(img_s_chip, 1),
        "unit": "images/sec/chip",
        "loss_only_img_s_chip": round(loss_only_img_s_chip, 1),
        "dispatch_latency_s": round(dispatch_latency_s, 3),
    }
    if measured:
        out["vs_baseline"] = round(img_s_chip / measured["img_s"], 1)
        out["baseline"] = (
            f"measured: reference hot loop in torch {measured['torch']} on this host's CPU "
            f"({measured['cores']} core) = {measured['img_s']} img/s (bench_reference.py)"
        )
        if "jax_cpu_img_s" in measured:
            out["jax_cpu_img_s"] = measured["jax_cpu_img_s"]
    else:
        out["vs_baseline"] = round(img_s_chip / FALLBACK_BASELINE_IMG_S, 2)
        out["baseline"] = "estimate: reference loop on a datacenter GPU ~1000 img/s (no measurement file)"
    if flops_per_img:
        peak = PEAK_BF16.get(device_kind)
        out["flops_per_img"] = round(flops_per_img / 1e9, 2)  # GFLOP
        out["tflops_achieved"] = round(flops_per_img * img_s_chip / 1e12, 1)
        if peak:
            out["mfu"] = round(flops_per_img * img_s_chip / peak, 3)
            out["peak_ref"] = f"{device_kind} bf16 {peak / 1e12:.0f} TFLOP/s"
        ref_fpi = ref_flops_per_img or flops_per_img
        out["vs_est_gpu_range"] = [
            round(img_s_chip / (GPU_EST_HI_FLOPS / ref_fpi), 2),
            round(img_s_chip / (GPU_EST_LO_FLOPS / ref_fpi), 2),
        ]
        out["ref_loop_flops_per_img"] = round(ref_fpi / 1e9, 2)
        if measured and "anomaly_mode_slowdown" in measured:
            # vs_est_gpu_range models an IDEALIZED reference loop.  The
            # as-shipped reference additionally pays always-on
            # torch.autograd.set_detect_anomaly(True) in every entry point
            # (train_generator.py:145, train_victim.py:94, ...); its measured
            # same-host slowdown factor is applied below.  The CPU-measured
            # factor is conservative for a GPU: anomaly mode's per-op host
            # bookkeeping is a LARGER fraction of step time on fast hardware.
            slow = measured["anomaly_mode_slowdown"]
            out["ref_anomaly_mode_slowdown_measured_cpu"] = slow
            out["vs_asshipped_gpu_range"] = [
                round(v * slow, 2) for v in out["vs_est_gpu_range"]
            ]
            # production mode (--train_metrics loss_only): trajectory-
            # identical training (tests/test_attack_train.py), compared
            # against the same as-shipped reference loop
            out["loss_only_vs_asshipped_gpu_range"] = [
                round(loss_only_img_s_chip / (GPU_EST_HI_FLOPS / ref_fpi) * slow, 2),
                round(loss_only_img_s_chip / (GPU_EST_LO_FLOPS / ref_fpi) * slow, 2),
            ]
        # BASELINE.md's stated target hardware is TPU v4 (275 TFLOP/s bf16);
        # this container exposes a v5e.  Equal-MFU projection onto the
        # stated target, labeled as such:
        peak_here, peak_v4 = PEAK_BF16.get(device_kind), PEAK_BF16["TPU v4"]
        if peak_here and device_kind != "TPU v4":
            out["projected_img_s_chip_tpu_v4_equal_mfu"] = round(
                img_s_chip * peak_v4 / peak_here, 1
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
