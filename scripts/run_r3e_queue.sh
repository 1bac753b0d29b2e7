#!/bin/bash
# Round-3 TPU evidence queue, part e (internal tool). The r3c and r3d queue
# daemons turned out to have SURVIVED their parent session (like r3b did):
# r3c is finishing the 2000-image imagenet10 pipeline and r3d will then run
# the celeba defense suite. This queue therefore only waits for both, then
# runs the SECOND imagenet10 strengthening: the r3c attempt (100/100/100 at
# synthetic_size 2000) overfit stage 1 badly (train 67% / eval 15%, eval
# falling) — 2000 images at 224px is memorization territory. 5x the corpus
# (10000 train / 2000 test, ~1.5 GB uint8 on-device) at the same
# 100/100/100 + 50,75-milestone recipe.
# ONE python process on the TPU at a time.
#
# Run: nohup setsid bash scripts/run_r3e_queue.sh > quality_logs/r3e_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs checkpoints

while pid=$(ps -eo pid,cmd | awk '/run_r3[cd]_queue.sh$/ && !/awk/ {print $1; exit}'); [ -n "$pid" ]; do
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
echo "=== imagenet10 224px pipeline (10k-image 100/100/100 recipe) ==="
rm -rf checkpoints/in10c_clean_cls checkpoints/in10c_atk_clean checkpoints/in10c_victim_clean checkpoints/in10c_eval_clean
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10c \
    Q_EXTRA="--synthetic_size 10000 --schedulerC_milestones 50,75 --schedulerG_milestones 50,75 --scheduler_clean_milestones 50,75" \
    Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=100 Q_EPOCHS_VICTIM=100 \
    timeout 28800 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3e.log
land "Evidence: imagenet10 224px pipeline (10k-image 100/100/100 recipe)" \
    quality_logs/quality_imagenet10_r3e.log

echo "=== r3e queue done ==="
