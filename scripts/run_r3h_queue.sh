#!/bin/bash
# Round-3 TPU evidence queue, part h (internal tool): recover the r3e
# 10k-image imagenet10 pipeline. Stage 1 completed (in10c_clean_cls, best
# clean acc 29.80) but stage 2 died at the first alternated step with
# "TPU worker process crashed" — the same recipe ran fine at 2k images
# (r3c), and the only delta is ~1.4 GB more HBM resident data, so the
# prime suspect is activation-memory overflow at 224px. Resume stages
# 2-4 with --remat step (backward recomputes the loss forwards,
# trading ~25% step time for roughly half the stored activations).
# Waits for r3f/r3g. ONE python process on the TPU at a time.
#
# Run: nohup setsid bash scripts/run_r3h_queue.sh > quality_logs/r3h_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs checkpoints

while pid=$(ps -eo pid,cmd | awk '/run_r3[cdefg]_queue.sh$/ && !/awk/ {print $1; exit}'); [ -n "$pid" ]; do
    echo "earlier queue (pid $pid) still running; sleeping 5 min"
    sleep 300
done

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
echo "=== imagenet10 10k pipeline, stages 2-4 with --remat step ==="
rm -rf checkpoints/in10c_atk_clean checkpoints/in10c_victim_clean checkpoints/in10c_eval_clean
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10c Q_STAGES=2,3,4 \
    Q_EXTRA="--synthetic_size 10000 --schedulerC_milestones 50,75 --schedulerG_milestones 50,75 --scheduler_clean_milestones 50,75 --remat step" \
    Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=100 Q_EPOCHS_VICTIM=100 \
    timeout 28800 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3h.log
land "Evidence: imagenet10 10k pipeline stages 2-4 under --remat (post worker-crash recovery)" \
    quality_logs/quality_imagenet10_r3h.log

echo "=== r3h queue done ==="
