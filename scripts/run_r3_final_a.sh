#!/bin/bash
# Round-3 TPU evidence queue, part A (internal tool): previously-exercised
# steps — pallas TPU tests, perf ablation, variant throughput, r11 pipeline
# rebuild (checkpoints lost to the inter-session container reset), frequency
# detector training.  Part B (scripts/run_r3_final_b.sh) holds the
# never-executed paths and launches after their CPU smokes pass.
# ONE python process on the TPU at a time; probe-gated per step.
set -x
cd /root/repo
mkdir -p quality_logs checkpoints

probe() {
    until timeout 900 python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
        echo "tunnel down; sleeping 3 min"
        sleep 180
    done
}

probe
echo "=== [A1/5] pallas kernel tests on the real TPU ==="
COMBAT_TESTS_TPU=1 timeout 3600 python -m pytest tests/test_pallas.py -q -p no:cacheprovider \
    2>&1 | tee quality_logs/pallas_tpu_r3.log

probe
echo "=== [A2/5] perf ablation (incl. pallas fused-trigger row) ==="
timeout 3600 python scripts/perf_ablation.py 2>&1 | tee quality_logs/perf_ablation_r3.log

probe
echo "=== [A3/5] variant step throughput ==="
timeout 5400 python scripts/bench_variants.py 2>&1 | tee quality_logs/bench_variants_r3.log

probe
echo "=== [A4/5] rebuild the r11 pipeline (full 400-epoch run, fresh container) ==="
Q_PREFIX=r11 Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 10800 python scripts/quality_run.py 2>&1 | tee quality_logs/r11_rebuild.log

probe
echo "=== [A5/5] frequency detector training (synthetic, 50 epochs) ==="
timeout 5400 python -m combat_tpu.defenses.frequency_train --dataset cifar10 --synthetic_data \
    --bs 128 --compute_dtype bfloat16 --n_iters 50 --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee quality_logs/frequency_train_r3.log

echo "=== part A done ==="
