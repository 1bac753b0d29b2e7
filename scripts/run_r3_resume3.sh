#!/bin/bash
# Round-3 TPU evidence queue, relaunch 3 (internal tool): resume the r11
# rebuild from stage 2 (stage 1's clean classifier survived at
# checkpoints/r11_clean_cls; the session reset killed resume2 at the start
# of the generator stage), then the two frequency-detector end-to-end
# evals gated on the rebuilt checkpoint, then the celeba-64px and
# imagenet10-224px pipelines that previously died on the (since fixed)
# sys.path import bug.  ONE python process on the TPU at a time;
# probe-gated per step; each landed step is committed immediately so a
# container reset cannot lose evidence.
#
# Run: nohup bash scripts/run_r3_resume3.sh > quality_logs/r3_resume3.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs checkpoints

probe() {
    until timeout 900 python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
        echo "tunnel down; sleeping 3 min"
        sleep 180
    done
}

land() {  # land <msg> <files...>
    local msg="$1"; shift
    git add "$@" && git commit -m "$msg" || echo "commit failed (non-fatal): $msg"
}

probe
echo "=== [T1/5] r11 rebuild stages 2-4 (generator -> victim -> eval) ==="
Q_PREFIX=r11 Q_STAGES=2,3,4 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 14400 python scripts/quality_run.py 2>&1 | tee quality_logs/r11_rebuild2.log
land "Evidence: r11 rebuild stages 2-4 (generator/victim/eval) log" quality_logs/r11_rebuild2.log quality_logs/r11_rebuild.log

if ls checkpoints/r11_atk_clean/cifar10/*.ckpt >/dev/null 2>&1; then
    probe
    echo "=== [T2/5] frequency eval: r11 generator vs shipped-reference detector ==="
    timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
        --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
        2>&1 | tee quality_logs/frequency_eval_refdet_r3.log
    land "Evidence: frequency eval vs shipped-reference detector" quality_logs/frequency_eval_refdet_r3.log

    probe
    echo "=== [T3/5] frequency eval: r11 generator vs freshly trained detector ==="
    timeout 3600 python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
        --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
        --F_checkpoints ./checkpoints/F_trained \
        2>&1 | tee quality_logs/frequency_eval_trained_r3.log
    land "Evidence: frequency eval vs freshly trained detector" quality_logs/frequency_eval_trained_r3.log quality_logs/frequency_train_r3.log
else
    echo "SKIP T2/T3: r11 rebuild did not produce checkpoints/r11_atk_clean/*.ckpt"
fi

probe
echo "=== [T4/5] celeba 64px full quality pipeline ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 21600 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_celeba_r3.log
land "Evidence: celeba 64px end-to-end quality pipeline" quality_logs/quality_celeba_r3.log

probe
echo "=== [T5/5] imagenet10 224px quality pipeline (reduced synthetic size / epochs) ==="
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 4000" \
    Q_EPOCHS_CLEAN=30 Q_EPOCHS_GEN=60 Q_EPOCHS_VICTIM=40 \
    timeout 14400 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3.log
land "Evidence: imagenet10 224px end-to-end quality pipeline" quality_logs/quality_imagenet10_r3.log

echo "=== resume3 queue done ==="
