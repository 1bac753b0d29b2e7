#!/bin/bash
# Round-3 TPU evidence queue, TRIMMED for the remaining round time
# (internal tool; outage cost ~9h).  Quick evidence first, then reduced
# 64px/224px pipelines.  ONE python process on the TPU at a time.
set -x
cd /root/repo
mkdir -p quality_logs

until python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
    echo "tunnel still down; sleeping 3 min"
    sleep 180
done

echo "=== [1/7] pallas kernel tests on the real TPU ==="
COMBAT_TESTS_TPU=1 python -m pytest tests/test_pallas.py -q -p no:cacheprovider \
    2>&1 | tee -a quality_logs/pallas_tpu_r3.log

echo "=== [2/7] perf ablation (incl. pallas fused-trigger row) ==="
python scripts/perf_ablation.py 2>&1 | tee -a quality_logs/perf_ablation_r3.log

echo "=== [3/7] variant step throughput ==="
python scripts/bench_variants.py 2>&1 | tee -a quality_logs/bench_variants_r3.log

echo "=== [4/7] frequency detector training (synthetic, 30 epochs) ==="
python -m combat_tpu.defenses.frequency_train --dataset cifar10 --synthetic_data \
    --bs 128 --compute_dtype bfloat16 --n_iters 30 --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee -a quality_logs/frequency_train_r3.log

echo "=== [5/7] frequency eval: r11 generator vs shipped-reference detector ==="
python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    2>&1 | tee -a quality_logs/frequency_eval_refdet_r3.log

echo "=== [6/7] frequency eval: r11 generator vs freshly trained detector ==="
python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee -a quality_logs/frequency_eval_trained_r3.log

echo "=== [7/7] celeba 64px quality pipeline (reduced epochs for remaining time) ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=30 Q_EPOCHS_GEN=80 Q_EPOCHS_VICTIM=50 \
    python scripts/quality_run.py 2>&1 | tee -a quality_logs/quality_celeba_r3.log

echo "=== bonus if time remains: imagenet10 224px reduced ==="
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 2000" \
    Q_EPOCHS_CLEAN=10 Q_EPOCHS_GEN=25 Q_EPOCHS_VICTIM=15 \
    python scripts/quality_run.py 2>&1 | tee -a quality_logs/quality_imagenet10_r3.log

echo "=== trimmed queue done ==="
