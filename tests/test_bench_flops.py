"""Guard bench.py's recorded FLOPs constants against code drift.

bench.py defaults to RECORDED_FLOPS_PER_IMG / RECORDED_REF_LOOP_FLOPS_PER_IMG
instead of a live cost-analysis compile (two extra full XLA compiles the
driver-timeout budget cannot always afford; the axon backend also lacks a
persistent compile cache).  A recorded constant is only honest while the
compiled program it describes is unchanged — this test recomputes the
cost analysis on the hermetic CPU backend and fails if the step's FLOPs
drift from the recorded value by more than the cross-backend tolerance
(optimized-HLO flop counts differ slightly per backend; structural changes
like an added forward pass are 20%+)."""

import jax
import jax.numpy as jnp
import pytest

from combat_tpu.config import Config, apply_dataset_preset
from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
from combat_tpu.train import (
    init_frozen,
    init_train_state,
    make_alternated_train_step,
    multistep_lr,
    sgd_torch,
)

import bench

BATCH = bench.BATCH


@pytest.mark.slow
def test_recorded_bench_flops_match_cost_analysis():
    cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
        bs=BATCH, compute_dtype="bfloat16"
    )
    from combat_tpu.models.layers import set_compute_dtype

    set_compute_dtype(cfg.compute_dtype)
    try:
        C = get_classifier(cfg)
        G = get_generator(cfg, "unet")
        F = get_frequency_detector(cfg)
        sample = jnp.zeros((1, 32, 32, 3))
        tx = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, 64))
        sC = init_train_state(C, jax.random.key(0), sample, tx)
        sG = init_train_state(G, jax.random.key(1), sample, tx)
        cm = init_frozen(C, jax.random.key(2), sample)
        nf = init_frozen(F, jax.random.key(3), sample)

        step = make_alternated_train_step(cfg, C, G)
        x1 = jnp.zeros((BATCH, 32, 32, 3))
        y1 = jnp.zeros((BATCH,), jnp.int32)
        compiled = jax.jit(step).lower(sC, sG, cm, nf, (x1, y1), jax.random.key(4)).compile()
        ca = compiled.cost_analysis()
        if not ca or not ca.get("flops"):
            pytest.skip("cost_analysis unavailable on this backend")
        flops_per_img = float(ca["flops"]) / BATCH

        g_fwd = jax.jit(lambda p, xx: G.apply({"params": p}, xx)).lower(sG.params, x1).compile()
        ref_fpi = flops_per_img + float(g_fwd.cost_analysis().get("flops", 0.0)) / BATCH
    finally:
        set_compute_dtype("float32")

    assert flops_per_img == pytest.approx(bench.RECORDED_FLOPS_PER_IMG, rel=0.15), (
        f"fused-step FLOPs drifted: cost_analysis {flops_per_img / 1e9:.2f} GFLOP/img vs "
        f"recorded {bench.RECORDED_FLOPS_PER_IMG / 1e9:.2f} — re-measure with "
        "BENCH_COST_ANALYSIS=1 python bench.py and update bench.py's constants"
    )
    assert ref_fpi == pytest.approx(bench.RECORDED_REF_LOOP_FLOPS_PER_IMG, rel=0.15)
