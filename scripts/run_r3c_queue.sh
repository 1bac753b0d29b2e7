#!/bin/bash
# Round-3 (second continuation) TPU evidence queue (internal tool).
#
# The r3b queue (scripts/run_r3b_queue.sh) turned out to have SURVIVED its
# parent session as a daemonized bash — it is finishing the imagenet10
# reduced pipeline and will then run and land the post-vjp benches, the
# roofline analysis, and the resolution sweep itself. This queue therefore
# only (a) waits for r3b to exit, then (b) reruns the imagenet10 pipeline at
# a strengthened recipe: the r3b attempt used 20/50/30 epochs, leaving the
# clean classifier at 15% accuracy — too weak to say anything about the
# attack. 100/100/100 epochs with half-scale LR milestones (50,75) so every
# stage actually enters the decay phase.
# ONE python process on the TPU at a time.
#
# Run: nohup bash scripts/run_r3c_queue.sh > quality_logs/r3c_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs checkpoints

# Wait for the surviving r3b queue (and any straggler python) to finish.
while pid=$(ps -eo pid,cmd | awk '/run_r3b_queue.sh$/ && !/awk/ {print $1; exit}'); [ -n "$pid" ]; do
    echo "r3b queue (pid $pid) still running; sleeping 5 min"
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
echo "=== imagenet10 224px pipeline (strengthened 100/100/100 recipe) ==="
rm -rf checkpoints/in10b_clean_cls checkpoints/in10b_atk_clean checkpoints/in10b_victim_clean checkpoints/in10b_eval_clean
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10b \
    Q_EXTRA="--synthetic_size 2000 --schedulerC_milestones 50,75 --schedulerG_milestones 50,75 --scheduler_clean_milestones 50,75" \
    Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=100 Q_EPOCHS_VICTIM=100 \
    timeout 21600 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3c.log
land "Evidence: imagenet10 224px pipeline (100/100/100-epoch recipe)" quality_logs/quality_imagenet10_r3c.log

echo "=== r3c queue done ==="
