#!/bin/bash
# Round-3 TPU evidence queue, part B (internal tool): the paths that had
# never executed before this session — frequency-detector end-to-end evals,
# the 64px/224px multi-resolution pipelines — plus the batch-size sweep and
# a fresh headline bench.  CPU-smoked first (tiny shapes, scrubbed-env CPU
# backend); run only after part A (scripts/run_r3_final_a.sh) finishes so a
# single python process owns the TPU.  Probe-gated per step to ride out
# tunnel outages.
#
# Run: nohup bash scripts/run_r3_final_b.sh > quality_logs/r3_final_b.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

probe() {
    until timeout 900 python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
        echo "tunnel down; sleeping 3 min"
        sleep 180
    done
}

probe
echo "=== [B1/6] frequency eval: r11 generator vs shipped-reference detector ==="
timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    2>&1 | tee quality_logs/frequency_eval_refdet_r3.log

probe
echo "=== [B2/6] frequency eval: r11 generator vs freshly trained detector ==="
timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee quality_logs/frequency_eval_trained_r3.log

probe
echo "=== [B3/6] celeba 64px full quality pipeline ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 18000 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_celeba_r3.log

probe
echo "=== [B4/6] imagenet10 224px quality pipeline (reduced synthetic size / epochs) ==="
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 4000" \
    Q_EPOCHS_CLEAN=30 Q_EPOCHS_GEN=60 Q_EPOCHS_VICTIM=40 \
    timeout 14400 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3.log

probe
echo "=== [B5/6] batch-size sweep (MFU headroom beyond the bs=128 parity point) ==="
timeout 5400 python scripts/bench_bs_sweep.py 2>&1 | tee quality_logs/bench_bs_sweep_r3.log

probe
echo "=== [B6/6] fresh headline bench ==="
timeout 3600 python bench.py 2>&1 | tee quality_logs/bench_headline_r3.log

echo "=== part B done ==="
