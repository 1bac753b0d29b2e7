#!/bin/bash
# Round-3 TPU evidence queue, relaunch 5 (internal tool): clean celeba-64px
# rerun.  Relaunch 4 collided with the still-alive relaunch-3 queue — both
# ran the celeba pipeline concurrently against the same checkpoint paths,
# so each one's fresh-start rmtree deleted the other's open OCDBT store
# (the NOT_FOUND save failures in the committed log).  This queue WAITS for
# the relaunch-3 queue (imagenet10 step) to exit, wipes the contested
# celeba checkpoints, and reruns celeba as the sole TPU client.
#
# Run: nohup bash scripts/run_r3_resume5.sh > quality_logs/r3_resume5.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs checkpoints

OLD_QUEUE_PID=15100
while kill -0 "$OLD_QUEUE_PID" 2>/dev/null; do
    echo "relaunch-3 queue ($OLD_QUEUE_PID) still running; sleeping 2 min"
    sleep 120
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

rm -rf checkpoints/cel_clean_cls checkpoints/cel_atk_clean checkpoints/cel_victim_clean checkpoints/cel_eval_clean

probe
echo "=== [T4-redo] celeba 64px full quality pipeline (sole TPU client) ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    timeout 21600 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_celeba_r3.log
land "Evidence: clean celeba 64px pipeline rerun (replaces queue-collision log)" quality_logs/quality_celeba_r3.log

echo "=== resume5 queue done ==="
