#!/bin/bash
# Round-3 TPU evidence queue, relaunch 2 (internal tool): the steps that
# failed in run_r3_resume.sh — quality_run.py was missing its repo-root
# sys.path insert (fixed), so the r11 rebuild and the 64px/224px pipelines
# crashed on import, and the two frequency evals then failed on the
# checkpoint the rebuild never produced.  This pass gates each dependent
# step on its prerequisite actually existing, so one failure can't cascade
# into misleading downstream logs.  ONE python process on the TPU at a
# time; probe-gated per step.
#
# Run: nohup bash scripts/run_r3_resume2.sh > quality_logs/r3_resume2.log 2>&1 &
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
echo "=== [S1/5] rebuild the r11 pipeline (full 400-epoch run) ==="
Q_PREFIX=r11 Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 10800 python scripts/quality_run.py 2>&1 | tee quality_logs/r11_rebuild.log

if [ -d checkpoints/r11_atk_clean/cifar10 ]; then
    probe
    echo "=== [S2/5] frequency eval: r11 generator vs shipped-reference detector ==="
    timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
        --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
        2>&1 | tee quality_logs/frequency_eval_refdet_r3.log

    probe
    echo "=== [S3/5] frequency eval: r11 generator vs freshly trained detector ==="
    timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
        --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
        --F_checkpoints ./checkpoints/F_trained \
        2>&1 | tee quality_logs/frequency_eval_trained_r3.log
else
    echo "SKIP S2/S3: r11 rebuild did not produce checkpoints/r11_atk_clean"
fi

probe
echo "=== [S4/5] celeba 64px full quality pipeline ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 18000 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_celeba_r3.log

probe
echo "=== [S5/5] imagenet10 224px quality pipeline (reduced synthetic size / epochs) ==="
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 4000" \
    Q_EPOCHS_CLEAN=30 Q_EPOCHS_GEN=60 Q_EPOCHS_VICTIM=40 \
    timeout 14400 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3.log

echo "=== resume2 queue done ==="
