#!/bin/bash
# Round-3 TPU evidence queue, part n (internal tool): supervised restart of
# the r3j plan after the tunnel wedged the stage-1 run at epoch 84/100 (log
# silent 50+ min, 0 CPU — the process never died, so r3j's `timeout 36000`
# would have burned 10 h).  Every TPU invocation now runs under
# scripts/watchdog_run.py: if its log stops growing for STALL seconds the
# child pgroup is killed and the stage restarts with --continue_training
# from the last best-gate checkpoint.
#
# Plan (one TPU process at a time):
#   1. imagenet10 10k pipeline stages 1-4 (resumes the surviving
#      in10d_clean_cls checkpoint, epoch 82)
#   2. scan_chunk dispatch-overhead bench (ex-r3k)
#   3. imagenet10 defense suite, benign-calibrated (ex-r3l)
#   4. long-execution tunnel probe (ex-r3m, DESTRUCTIVE-LAST)
#
# Run: nohup setsid bash scripts/run_r3n_queue.sh > quality_logs/r3n_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs checkpoints

PIPE_LOG=quality_logs/quality_imagenet10_r3n.log
BASE_EXTRA="--synthetic_size 10000 --schedulerC_milestones 50,75 --schedulerG_milestones 50,75 --scheduler_clean_milestones 50,75 --remat step --scan_chunk 64"

probe() {
    until timeout 900 python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
        echo "tunnel down; sleeping 3 min"
        sleep 180
    done
}

land() {
    local msg="$1"; shift
    git add "$@" && git commit -m "$msg" || echo "commit failed (non-fatal): $msg"
}

# run_stage N CKPT_PROBE STALL — run pipeline stage N under the watchdog,
# resuming via --continue_training whenever CKPT_PROBE exists.
run_stage() {
    local stage="$1" ckpt_probe="$2" stall="$3" resume
    for attempt in $(seq 1 12); do
        resume=""
        # stage 4 (eval) has no trainable state to resume
        if [ "$stage" != 4 ] && [ -e "$ckpt_probe" ]; then
            resume="--continue_training"
        fi
        probe
        echo "=== stage $stage attempt $attempt (resume: '$resume') ==="
        Q_DATASET=imagenet10 Q_BS=16 Q_PREFIX=in10d Q_STAGES="$stage" \
            Q_EXTRA="$BASE_EXTRA $resume" \
            Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=100 Q_EPOCHS_VICTIM=100 \
            python scripts/watchdog_run.py "$PIPE_LOG" "$stall" -- \
            python scripts/quality_run.py
        rc=$?
        if [ "$rc" -eq 0 ]; then return 0; fi
        echo "stage $stage attempt $attempt exited rc=$rc; retrying after tunnel recovery"
        sleep 90
    done
    return 1
}

echo "=== imagenet10 10k pipeline, supervised (bs=16 --remat step --scan_chunk 64) ==="
run_stage 1 checkpoints/in10d_clean_cls/imagenet10/imagenet10_in10d_clean_cls.ckpt 900 || exit 1
land "Evidence: imagenet10 10k stage 1 complete (supervised rerun)" "$PIPE_LOG"
run_stage 2 checkpoints/in10d_atk_clean/imagenet10/imagenet10_in10d_atk_clean.ckpt 1500 || exit 1
land "Evidence: imagenet10 10k stage 2 complete" "$PIPE_LOG"
run_stage 3 checkpoints/in10d_victim_clean/imagenet10/imagenet10_in10d_victim_clean.ckpt 1500 || exit 1
run_stage 4 - 900 || exit 1
land "Evidence: imagenet10 10k pipeline stages 3-4 complete" "$PIPE_LOG"

echo "=== scan_chunk overhead bench (headline point, 391-step epoch) ==="
probe
rm -f quality_logs/bench_scan_chunk_r3.log
python scripts/watchdog_run.py quality_logs/bench_scan_chunk_r3.log 900 -- \
    python scripts/bench_scan_chunk.py \
    || python scripts/watchdog_run.py quality_logs/bench_scan_chunk_r3.log 900 -- \
        python scripts/bench_scan_chunk.py
land "Evidence: scan_chunk dispatch-overhead bench at the headline point" \
    quality_logs/bench_scan_chunk_r3.log scripts/bench_scan_chunk.py

echo "=== imagenet10 defense suite: in10d victim vs benign ==="
if [ -d checkpoints/in10d_victim_clean ] && [ -d checkpoints/in10d_clean_cls ]; then
    for attempt in 1 2; do
        probe
        rm -f quality_logs/defenses_imagenet10_r3.log
        VICTIM_PREFIX=in10d_victim CLEAN_PREFIX=in10d_clean_cls DATASET=imagenet10 \
            NC_EPOCHS=30 OUT=./quality_logs/defenses_imagenet10 FP_CHUNK=16 \
            EXTRA="--synthetic_size 10000 --scan_chunk 64" \
            python scripts/watchdog_run.py quality_logs/defenses_imagenet10_r3.log 1800 -- \
            python scripts/run_defense_evidence.py && break
    done
    land "Evidence: imagenet10 defense suite, benign-calibrated (third geometry)" \
        quality_logs/defenses_imagenet10_r3.log quality_logs/defenses_imagenet10
fi

echo "=== long-execution deadline probe (DESTRUCTIVE-LAST) ==="
probe
python scripts/watchdog_run.py quality_logs/probe_long_execution_r3.log 2100 -- \
    python scripts/probe_long_execution.py
land "Evidence: direct probe of the tunnel's long-execution limit" \
    quality_logs/probe_long_execution_r3.log

echo "=== r3n queue done ==="
