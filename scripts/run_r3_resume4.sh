#!/bin/bash
# Round-3 TPU evidence queue, relaunch 4 (internal tool): only the two
# steps the resume3 queue did not reach before the container reset — the
# celeba-64px and imagenet10-224px end-to-end quality pipelines.  T1-T3
# (r11 rebuild + both frequency-detector evals) landed and are committed.
# ONE python process on the TPU at a time; probe-gated per step; each
# landed step is committed immediately so a container reset cannot lose
# evidence.
#
# Run: nohup bash scripts/run_r3_resume4.sh > quality_logs/r3_resume4.log 2>&1 &
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

echo "=== resume4 queue done ==="
