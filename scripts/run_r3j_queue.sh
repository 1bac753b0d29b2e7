#!/bin/bash
# Round-3 TPU evidence queue, part j (internal tool): third recovery of the
# 10k-image imagenet10 pipeline, now with --scan_chunk.
#
# Post-mortem of r3e/r3h/r3i: all three died with "TPU worker process
# crashed" at the FIRST alternated epoch's metric read-back, across
# HBM-safe configs (hbm_probe: bs=16 remat=step peaks at 8.32 GB, far
# under the ceiling) — while the same pipeline's stage-1 epochs (~25 s
# per whole-epoch scan) survived hundreds of dispatches.  The common
# factor is a single XLA *execution* lasting minutes (625-step alternated
# scan at 224px ~= 2-4 min): the shared-TPU tunnel kills the worker on
# long executions.  Fix: --scan_chunk 64 bounds every dispatch (train AND
# eval) to <= 64 scan steps (~15-25 s), numerically identical to the
# whole-epoch scan (tests/test_scan_chunk.py).
#
# The container reset wiped checkpoints/, so stage 1 reruns too.
# ONE python process on the TPU at a time.
#
# Run: nohup setsid bash scripts/run_r3j_queue.sh > quality_logs/r3j_queue.log 2>&1 &
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
echo "=== imagenet10 10k pipeline, stages 1-4, bs=16 --remat step --scan_chunk 64 ==="
rm -rf checkpoints/in10d_clean_cls checkpoints/in10d_atk_clean checkpoints/in10d_victim_clean checkpoints/in10d_eval_clean
Q_DATASET=imagenet10 Q_BS=16 Q_PREFIX=in10d Q_STAGES=1,2,3,4 \
    Q_EXTRA="--synthetic_size 10000 --schedulerC_milestones 50,75 --schedulerG_milestones 50,75 --scheduler_clean_milestones 50,75 --remat step --scan_chunk 64" \
    Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=100 Q_EPOCHS_VICTIM=100 \
    timeout 36000 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3j.log
land "Evidence: imagenet10 10k pipeline (bs=16, --remat step, --scan_chunk 64)" \
    quality_logs/quality_imagenet10_r3j.log

echo "=== r3j queue done ==="
