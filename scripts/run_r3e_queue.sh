#!/bin/bash
# Round-3 TPU evidence queue, part e (internal tool). The r3c/r3d daemons
# died with their parent session; this queue resumes their pending work:
#   1. Defense suite vs the celeba 64px victim (r3d's job — the cel_*
#      checkpoints survived on disk), benign-calibrated.
#   2. imagenet10 224px pipeline, SECOND strengthening: the r3c attempt
#      (100/100/100 at synthetic_size 2000) overfit stage 1 badly
#      (train 67% / eval 15%, eval falling) — 2000 images at 224px is
#      memorization territory. 5x the corpus (10000 train / 2000 test,
#      ~1.5 GB uint8 on-device) at the same 100/100/100 + 50,75-milestone
#      recipe.
# ONE python process on the TPU at a time.
#
# Run: nohup setsid bash scripts/run_r3e_queue.sh > quality_logs/r3e_queue.log 2>&1 &
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
echo "=== defense suite vs celeba 64px victim (+ benign calibration) ==="
DATASET=celeba VICTIM_PREFIX=cel_victim CLEAN_PREFIX=cel_clean_cls NC_EPOCHS=50 \
    OUT=./quality_logs/defenses_celeba \
    timeout 21600 python scripts/run_defense_evidence.py 2>&1 | tee quality_logs/defenses_celeba_r3.log
land "Evidence: defense suite vs the celeba 64px victim, benign-calibrated" \
    quality_logs/defenses_celeba_r3.log quality_logs/defenses_celeba

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
