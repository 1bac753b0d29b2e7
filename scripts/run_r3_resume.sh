#!/bin/bash
# Round-3 TPU evidence queue, resume (internal tool): the steps still
# outstanding after the session reset killed run_r3_final_a.sh mid-A3.
# Short / high-value steps first, multi-hour pipelines last so a second
# reset loses the least.  ONE python process on the TPU at a time;
# probe-gated per step to ride out tunnel outages.
#
# Run: nohup bash scripts/run_r3_resume.sh > quality_logs/r3_resume.log 2>&1 &
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
echo "=== [R1/9] variant step throughput (A3 rerun; prior run cut off) ==="
timeout 5400 python scripts/bench_variants.py 2>&1 | tee quality_logs/bench_variants_r3.log

probe
echo "=== [R2/9] rebuild the r11 pipeline (checkpoints lost to container reset) ==="
Q_PREFIX=r11 Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 10800 python scripts/quality_run.py 2>&1 | tee quality_logs/r11_rebuild.log

probe
echo "=== [R3/9] frequency detector training (synthetic, 50 epochs) ==="
timeout 5400 python -m combat_tpu.defenses.frequency_train --dataset cifar10 --synthetic_data \
    --bs 128 --compute_dtype bfloat16 --n_iters 50 --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee quality_logs/frequency_train_r3.log

probe
echo "=== [R4/9] frequency eval: r11 generator vs shipped-reference detector ==="
timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    2>&1 | tee quality_logs/frequency_eval_refdet_r3.log

probe
echo "=== [R5/9] frequency eval: r11 generator vs freshly trained detector ==="
timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee quality_logs/frequency_eval_trained_r3.log

probe
echo "=== [R6/9] batch-size sweep (MFU headroom beyond the bs=128 parity point) ==="
timeout 5400 python scripts/bench_bs_sweep.py 2>&1 | tee quality_logs/bench_bs_sweep_r3.log

probe
echo "=== [R7/9] fresh headline bench ==="
timeout 3600 python bench.py 2>&1 | tee quality_logs/bench_headline_r3.log

probe
echo "=== [R8/9] celeba 64px full quality pipeline ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 18000 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_celeba_r3.log

probe
echo "=== [R9/9] imagenet10 224px quality pipeline (reduced synthetic size / epochs) ==="
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 4000" \
    Q_EPOCHS_CLEAN=30 Q_EPOCHS_GEN=60 Q_EPOCHS_VICTIM=40 \
    timeout 14400 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3.log

echo "=== resume queue done ==="
