"""Benchmark: alternated-training throughput (images/sec/chip).

Measures the fused alternated train step (C-step + G-step + trigger synthesis
+ augmentations — the hot loop of reference ``train_generator.py:170-290``)
at the canonical operating point: CIFAR-10 geometry, PreActResNet18 surrogate
+ UNet generator, global batch 128 (reference ``README.md:88-93``,
``config.py:23-39``).  Data is synthetic and device-resident (content doesn't
affect throughput); timing uses a value read (device_get) as the fence — some
experimental PJRT backends report readiness before remote execution
completes, so ``block_until_ready`` alone is not one.

**Headline ("value"): production mode** (``--train_metrics loss_only``),
which computes exactly the work needed to produce the training trajectory and
is PROVEN trajectory-identical to the full-metrics loop
(``tests/test_attack_train.py::test_loss_only_metrics_mode_is_trajectory_identical``).
The reference's as-shipped loop additionally computes three metric-only
forwards per batch (``train_generator.py:214,227,245-247``) and runs with
``torch.autograd.set_detect_anomaly(True)`` always on (``:145``); the
like-for-like full-metrics parity mode (identical per-step work to the
idealized reference loop) is published alongside as
``parity_full_metrics_img_s_chip``.

Timing method: after a warm-compile epoch, (1-epoch, 7-epoch) chained-
dispatch window pairs are timed — each window dispatches whole-epoch
executions back-to-back asynchronously and fences once — and the per-epoch
slope is taken.  The slope isolates steady-state *device* throughput by
subtracting the constant per-dispatch tunnel RPC latency (published
separately as ``dispatch_latency_s``; ~75 ms healthy, seconds when the
shared tunnel degrades).  Note the production loop fences once per epoch
(metrics read-back at ``combat_tpu/cli/_alternated.py``), so end-to-end
wall-clock additionally pays one dispatch latency per epoch — on healthy
links that is <1% of a full-dataset epoch, but it is not amortized away;
the slope is a device-throughput figure, labeled as such.  Window pairs are
repeated (up to 3×, budget permitting) and the MIN slope is reported with a
``jitter`` field (max/min slope spread) so a noisy capture is visible in
the output rather than silently wrong.

Tunnel resilience (the round-3 driver capture timed out under a diagnosed
~100× tunnel degradation): a persistent XLA compilation cache
(``.jax_cache/``), a wall-clock budget (``BENCH_BUDGET_S``, default 420 s)
that skips later phases and still emits the JSON line with whatever
completed (plus ``degraded``/``skipped`` fields), recorded-FLOPs fallbacks
for the bracket fields when the cost-analysis compile doesn't fit the
budget, and a SIGTERM/SIGALRM handler that prints the best-so-far JSON —
so an external timeout still yields a parsed result.

Baseline denominator (``vs_baseline``): the reference repo publishes no
throughput numbers (BASELINE.md) and this container has no CUDA GPU, so the
measured denominator is the reference's own hot loop re-created in torch and
run on this host's CPU (``bench_reference.py`` → ``BASELINE_MEASURED.json``).
That is a cross-hardware ratio (TPU chip vs host CPU) and is labeled as
such.  Context published alongside it:

  * ``flops_per_img`` — XLA ``cost_analysis()`` of the compiled step;
  * ``mfu`` — achieved FLOP/s over the chip's bf16 peak;
  * ``jax_cpu_img_s`` — OUR step on the same host CPU: identical hardware
    and identical math land it in the same few-img/s band as torch (both
    FLOP-bound on one core), evidencing like-for-like work;
  * ``vs_asshipped_gpu_range`` — the headline gate bracket: production mode
    vs a first-principles estimate of the reference loop AS SHIPPED
    (anomaly mode on) on a datacenter GPU.  The reference loop is costed at
    its own FLOPs (it runs the generator forward twice per batch; our step
    shares one via ``jax.vjp``), over a generous utilization span
    [A100 TF32 @ 15%, V100 fp32 @ 40%] (small-batch 32px torch conv
    training measures ~3-8% util on A100-class parts in public practice),
    times the MEASURED 1.22× anomaly-mode slowdown
    (``BASELINE_MEASURED.json``; conservative for a GPU — anomaly mode's
    per-op host bookkeeping is a larger fraction of step time on fast
    hardware).  ``parity_vs_est_gpu_range`` is the like-for-like secondary:
    full-metrics parity mode vs the idealized (no-anomaly) reference loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import signal
import time

# Persistent compilation cache — must be configured before jax initializes.
# Probed 2026-08-20: the axon PJRT backend silently ignores it (nothing is
# written even with RAISE_PERSISTENT_CACHE_ERRORS), so cross-process compile
# reuse is NOT available here; kept because it is free and works on real
# (non-tunneled) TPU runtimes.  The budget/phase logic below is the actual
# defense: compiles are minimized (live cost analysis is opt-in) and every
# phase is skippable.
_HERE = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

BATCH = 128
TIMED_STEPS = 64
N_SHORT, N_LONG = 1, 7
MAX_PAIRS = 3

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))
_T0 = time.time()

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

# Recorded cost-analysis FLOPs (v5e capture, re-verified this round with
# BENCH_COST_ANALYSIS=1; guarded against code drift by
# tests/test_bench_flops.py on the CPU backend).  The compiled program is
# deterministic, so these don't drift between runs of the same code; the
# live cost-analysis compile costs ~2 extra full XLA compiles, so it is
# opt-in (BENCH_COST_ANALYSIS=1) and the default run stays ~2 compiles
# (one per timing mode), labeled via "flops_source".
RECORDED_FLOPS_PER_IMG = 10.20e9
RECORDED_REF_LOOP_FLOPS_PER_IMG = 10.64e9

# Best-so-far payload; the signal handler prints it if an external timeout
# (driver `timeout` sends SIGTERM) or our own alarm fires mid-phase.
_result: dict = {}


def _remaining() -> float:
    return BUDGET_S - (time.time() - _T0)


def _emit_partial(signum, frame):
    if _result.get("value"):
        _result["degraded"] = True
        _result.setdefault("note", "emitted by timeout handler before all phases completed")
        print("\n" + json.dumps(_result), flush=True)
        os._exit(0)
    os._exit(1)


signal.signal(signal.SIGTERM, _emit_partial)
signal.signal(signal.SIGALRM, _emit_partial)
signal.alarm(int(BUDGET_S) + 60)


def _wait_for_backend() -> None:
    """Ride out transient axon-tunnel outages (init can block then raise
    UNAVAILABLE; a failed backend is cached in-process, so retry by
    re-exec'ing).  Bounded so retries fit inside the driver's timeout."""
    import sys

    try:
        jax.devices()
    except Exception as e:
        attempt = int(os.environ.get("BENCH_INIT_ATTEMPT", "0"))
        if attempt >= 2:
            raise
        print(f"backend init failed ({e}); retry {attempt + 1}/2 in 2 min", flush=True)
        os.environ["BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        time.sleep(120)
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

    def timed_epochs(step_fn, sC, sG, n, key0):
        m = None
        t0 = time.perf_counter()
        for i in range(n):
            sC, sG, m = train_epoch_alternated(
                step_fn, sC, sG, clean_model, netF, images, labels, jax.random.key(key0 + i), BATCH
            )
        float(m["loss_ce"])  # value-read fence (see module docstring)
        return sC, sG, time.perf_counter() - t0

    def measure_mode(step_fn, key0, min_budget_next=0.0):
        """Warm-compile then time up to MAX_PAIRS (short, long) window pairs.

        Returns (epoch_s = min slope, dispatch_latency_s, jitter, n_pairs).
        The min over repeated slopes rejects one-sided jitter spikes; the
        spread is published so noise is visible (ADVICE r3).  Each mode
        starts from the pristine stateC/stateG (captured, not mutated)."""
        sC, sG, m = train_epoch_alternated(
            step_fn, stateC, stateG, clean_model, netF, images, labels, jax.random.key(key0), BATCH
        )
        float(m["loss_ce"])  # warm compile
        slopes, shorts = [], []
        k = key0 + 1
        for p in range(MAX_PAIRS):
            if p > 0 and _remaining() < min_budget_next + 20:
                break
            sC, sG, t_s = timed_epochs(step_fn, sC, sG, N_SHORT, k)
            k += N_SHORT
            sC, sG, t_l = timed_epochs(step_fn, sC, sG, N_LONG, k)
            k += N_LONG
            slopes.append((t_l - t_s) / (N_LONG - N_SHORT))
            shorts.append(t_s)
        valid = [s for s in slopes if s > 0]
        if not valid:  # pathological jitter: fall back to whole-window rate
            valid = [t_l / N_LONG]
        epoch_s = min(valid)
        jitter = round(max(valid) / min(valid) - 1.0, 3) if len(valid) > 1 else None
        dispatch = max(min(shorts) - epoch_s * N_SHORT, 0.0)
        return epoch_s, dispatch, jitter, len(slopes)

    measured = None
    path = os.path.join(_HERE, "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            measured = json.load(f)

    # ---- Phase 1 (headline): production mode, trajectory-identical ----
    step_fast = make_alternated_train_step(cfg.replace(train_metrics="loss_only"), C, G)
    with mesh:
        epoch_fast_s, disp_fast, jit_fast, pairs_fast = measure_mode(step_fast, 100, min_budget_next=60)
    value = BATCH * TIMED_STEPS / epoch_fast_s / n_chips

    _result.update(
        {
            "metric": (
                "alternated-train images/sec/chip, production mode "
                "(CIFAR-10 PreActResNet18+UNet, bs=128, loss_only — "
                "trajectory-identical to full-metrics, see bench.py docstring)"
            ),
            "value": round(value, 1),
            "unit": "images/sec/chip",
            "dispatch_latency_s": round(disp_fast, 3),
            "jitter": jit_fast,
            "timing_pairs": pairs_fast,
            "degraded": bool(disp_fast > 1.0),
        }
    )
    if measured:
        _result["vs_baseline"] = round(value / measured["img_s"], 1)
        _result["baseline"] = (
            f"measured: reference hot loop in torch {measured['torch']} on this host's CPU "
            f"({measured['cores']} core) = {measured['img_s']} img/s idealized, "
            f"{measured.get('img_s_anomaly_mode', '?')} as-shipped (bench_reference.py)"
        )
        if "jax_cpu_img_s" in measured:
            _result["jax_cpu_img_s"] = measured["jax_cpu_img_s"]
    else:
        _result["vs_baseline"] = round(value / FALLBACK_BASELINE_IMG_S, 2)
        _result["baseline"] = "estimate: reference loop on a datacenter GPU ~1000 img/s (no measurement file)"

    # ---- GPU-estimate brackets (recorded FLOPs; refined by phase 3) ----
    anomaly_slow = (measured or {}).get("anomaly_mode_slowdown", 1.0)

    def gpu_brackets(img_s_chip, ref_fpi, slow=1.0):
        return [
            round(img_s_chip / (GPU_EST_HI_FLOPS / ref_fpi) * slow, 2),
            round(img_s_chip / (GPU_EST_LO_FLOPS / ref_fpi) * slow, 2),
        ]

    flops_per_img, ref_fpi = RECORDED_FLOPS_PER_IMG, RECORDED_REF_LOOP_FLOPS_PER_IMG
    _result["flops_source"] = "recorded_r3"
    _result["vs_asshipped_gpu_range"] = gpu_brackets(value, ref_fpi, anomaly_slow)
    if anomaly_slow != 1.0:
        _result["ref_anomaly_mode_slowdown_measured_cpu"] = anomaly_slow

    # ---- Phase 2: full-metrics parity mode (like-for-like secondary) ----
    if _remaining() > 60:
        step_full = make_alternated_train_step(cfg, C, G)
        with mesh:
            epoch_s, disp, jit_full, pairs_full = measure_mode(step_full, 200, min_budget_next=45)
        parity = BATCH * TIMED_STEPS / epoch_s / n_chips
        _result["parity_full_metrics_img_s_chip"] = round(parity, 1)
        _result["parity_jitter"] = jit_full
        _result["parity_vs_est_gpu_range"] = gpu_brackets(parity, ref_fpi)
        _result["parity_vs_asshipped_gpu_range"] = gpu_brackets(parity, ref_fpi, anomaly_slow)
        _result["degraded"] = _result["degraded"] or bool(disp > 1.0)
    else:
        _result["skipped"] = _result.get("skipped", []) + ["parity_full_metrics"]
        parity = None

    # ---- Phase 3 (opt-in): live cost analysis (refines recorded FLOPs) ----
    if os.environ.get("BENCH_COST_ANALYSIS") == "1" and _remaining() > 45:
        try:
            step_full = make_alternated_train_step(cfg, C, G)
            x1 = jnp.zeros((BATCH, 32, 32, 3))
            y1 = jnp.zeros((BATCH,), jnp.int32)
            compiled = (
                jax.jit(step_full).lower(stateC, stateG, clean_model, netF, (x1, y1), key).compile()
            )
            flops_per_img = float(compiled.cost_analysis().get("flops", 0.0)) / BATCH
            # The reference's loop runs the generator forward TWICE per batch
            # (train_generator.py:186,223); our step shares one via jax.vjp,
            # so the reference loop is costed at ours + one extra G forward.
            g_fwd = (
                jax.jit(lambda p, xx: G.apply({"params": p}, xx)).lower(stateG.params, x1).compile()
            )
            ref_fpi = flops_per_img + float(g_fwd.cost_analysis().get("flops", 0.0)) / BATCH
            _result["flops_source"] = "cost_analysis"
            _result["vs_asshipped_gpu_range"] = gpu_brackets(value, ref_fpi, anomaly_slow)
            if parity is not None:
                _result["parity_vs_est_gpu_range"] = gpu_brackets(parity, ref_fpi)
                _result["parity_vs_asshipped_gpu_range"] = gpu_brackets(parity, ref_fpi, anomaly_slow)
        except Exception:
            pass  # cost model not available on every backend; recorded values stand
    elif os.environ.get("BENCH_COST_ANALYSIS") == "1":
        _result["skipped"] = _result.get("skipped", []) + ["cost_analysis"]

    _result["flops_per_img"] = round(flops_per_img / 1e9, 2)  # GFLOP
    _result["ref_loop_flops_per_img"] = round(ref_fpi / 1e9, 2)
    peak = PEAK_BF16.get(device_kind)
    mfu_basis = parity if parity is not None else value
    _result["tflops_achieved"] = round(flops_per_img * mfu_basis / 1e12, 1)
    if peak:
        # MFU is quoted for the full-metrics parity step when measured (its
        # FLOPs match the cost analysis); production mode does fewer FLOPs.
        _result["mfu"] = round(flops_per_img * mfu_basis / peak, 3)
        _result["mfu_basis"] = "parity_full_metrics" if parity is not None else "production_loss_only"
        _result["peak_ref"] = f"{device_kind} bf16 {peak / 1e12:.0f} TFLOP/s"
        # BASELINE.md's stated target hardware is TPU v4 (275 TFLOP/s bf16);
        # this container exposes a v5e.  Equal-MFU projection, labeled:
        if device_kind != "TPU v4":
            _result["projected_img_s_chip_tpu_v4_equal_mfu"] = round(
                value * PEAK_BF16["TPU v4"] / peak, 1
            )
    signal.alarm(0)
    print(json.dumps(_result))


if __name__ == "__main__":
    main()
