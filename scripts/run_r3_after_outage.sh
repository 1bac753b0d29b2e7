#!/bin/bash
# Round-3 TPU evidence queue, outage-resilient relaunch (internal tool).
# Waits for the axon tunnel to come back (probe every 5 min), then runs the
# remaining evidence steps serially (ONE python process on the TPU at a time).
# Run: nohup bash scripts/run_r3_after_outage.sh > quality_logs/r3_relaunch.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

# wait for any still-running TPU python to exit (serialization)
n=0; while pgrep -x python > /dev/null && [ $n -lt 30 ]; do sleep 60; n=$((n+1)); done

# probe until the backend initializes (each probe is itself a TPU process;
# init can legitimately take 25 min on a cold tunnel, so no timeout here)
until python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
    echo "tunnel still down; sleeping 5 min"
    sleep 300
done

echo "=== [1/8] pallas kernel tests on the real TPU ==="
COMBAT_TESTS_TPU=1 python -m pytest tests/test_pallas.py -q -p no:cacheprovider \
    2>&1 | tee -a quality_logs/pallas_tpu_r3.log

echo "=== [2/8] perf ablation (incl. pallas fused-trigger row) ==="
python scripts/perf_ablation.py 2>&1 | tee -a quality_logs/perf_ablation_r3.log

echo "=== [3/8] variant step throughput ==="
python scripts/bench_variants.py 2>&1 | tee -a quality_logs/bench_variants_r3.log

echo "=== [4/8] frequency detector training (synthetic, 50 epochs) ==="
python -m combat_tpu.defenses.frequency_train --dataset cifar10 --synthetic_data \
    --bs 128 --compute_dtype bfloat16 --n_iters 50 --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee -a quality_logs/frequency_train_r3.log

echo "=== [5/8] frequency eval: r11 generator vs shipped-reference detector ==="
python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    2>&1 | tee -a quality_logs/frequency_eval_refdet_r3.log

echo "=== [6/8] frequency eval: r11 generator vs freshly trained detector ==="
python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee -a quality_logs/frequency_eval_trained_r3.log

echo "=== [7/8] celeba 64px full quality pipeline (canonical epochs) ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    python scripts/quality_run.py 2>&1 | tee -a quality_logs/quality_celeba_r3.log

echo "=== [8/8] imagenet10 224px quality pipeline (reduced synthetic size / epochs) ==="
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 4000" \
    Q_EPOCHS_CLEAN=30 Q_EPOCHS_GEN=60 Q_EPOCHS_VICTIM=40 \
    python scripts/quality_run.py 2>&1 | tee -a quality_logs/quality_imagenet10_r3.log

echo "=== relaunch queue done ==="
