#!/bin/bash
# Round-3 TPU evidence queue, part i (internal tool): second recovery of the
# 10k-image imagenet10 pipeline. r3e (no remat) and r3h (--remat step, bs=32)
# both killed the TPU worker at the first alternated epoch's read-back.
# scripts/hbm_probe.py (AOT memory analysis, committed) shows why:
#   bs=32 remat=step : peak <= 13.07 GB + ~0.5 GB other residents -> over the
#                      v5e usable ceiling (the 2k run that survived sat at
#                      13.78 GB peak with 1.1 GB smaller args)
#   bs=16 remat=step : peak <=  8.32 GB  -> comfortable
# So: stages 2-4 at Q_BS=16 (stage-1 checkpoint in10c_clean_cls, best clean
# acc 29.80 at bs=32, is reused — eval batching is independent of train bs).
# ONE python process on the TPU at a time.
#
# Run: nohup setsid bash scripts/run_r3i_queue.sh > quality_logs/r3i_queue.log 2>&1 &
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
echo "=== imagenet10 10k pipeline, stages 2-4, bs=16 --remat step ==="
rm -rf checkpoints/in10c_atk_clean checkpoints/in10c_victim_clean checkpoints/in10c_eval_clean
Q_DATASET=imagenet10 Q_BS=16 Q_PREFIX=in10c Q_STAGES=2,3,4 \
    Q_EXTRA="--synthetic_size 10000 --schedulerC_milestones 50,75 --schedulerG_milestones 50,75 --scheduler_clean_milestones 50,75 --remat step" \
    Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=100 Q_EPOCHS_VICTIM=100 \
    timeout 28800 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3i.log
land "Evidence: imagenet10 10k pipeline stages 2-4 (bs=16, --remat step, post HBM analysis)" \
    quality_logs/quality_imagenet10_r3i.log

echo "=== r3i queue done ==="
