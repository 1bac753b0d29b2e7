#!/bin/bash
# Round-3 (continuation session) TPU evidence queue (internal tool).
# Priorities, in order:
#   1. ASR-gate reproducibility: the committed r11 recipe at two fresh seeds
#      (the single r11rebuild rerun landed at 96.13 vs the original 99.20 —
#      quantify the run-to-run distribution instead of leaving one anecdote).
#   2. celeba 64px full pipeline (the round-3 attempt died to a queue
#      collision corrupting its own checkpoint store — rerun as sole client).
#   3. imagenet10 224px reduced pipeline.
# ONE python process on the TPU at a time.
#
# Run: nohup bash scripts/run_r3b_queue.sh > quality_logs/r3b_queue.log 2>&1 &
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

for SEED in 2 3; do
    probe
    echo "=== [seed $SEED] r11 recipe, fresh seed (reproducibility) ==="
    rm -rf checkpoints/s${SEED}_clean_cls checkpoints/s${SEED}_atk_clean checkpoints/s${SEED}_victim_clean
    mkdir -p quality_logs/s${SEED}
    Q_PREFIX=s${SEED} Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=200 \
        Q_EXTRA="--seed ${SEED}" \
        timeout 18000 python scripts/quality_run.py 2>&1 | tee quality_logs/s${SEED}/run.log
    land "Evidence: r11-recipe reproducibility run at seed ${SEED}" quality_logs/s${SEED}/run.log
done

probe
echo "=== celeba 64px full quality pipeline ==="
rm -rf checkpoints/cel_clean_cls checkpoints/cel_atk_clean checkpoints/cel_victim_clean checkpoints/cel_eval_clean
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=200 \
    timeout 21600 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_celeba_r3.log
land "Evidence: clean celeba 64px pipeline rerun (replaces queue-collision log)" quality_logs/quality_celeba_r3.log

probe
echo "=== imagenet10 224px reduced quality pipeline ==="
rm -rf checkpoints/in10_clean_cls checkpoints/in10_atk_clean checkpoints/in10_victim_clean checkpoints/in10_eval_clean
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 2000" \
    Q_EPOCHS_CLEAN=20 Q_EPOCHS_GEN=50 Q_EPOCHS_VICTIM=30 \
    timeout 21600 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3.log
land "Evidence: imagenet10 224px reduced pipeline" quality_logs/quality_imagenet10_r3.log

probe
echo "=== variant-step throughput, post vjp-shared-forward ==="
python scripts/bench_variants.py 2>&1 | tee quality_logs/bench_variants_r3b.log
land "Evidence: variant throughput after the vjp shared forward" quality_logs/bench_variants_r3b.log

probe
echo "=== step ablation, post vjp-shared-forward ==="
python scripts/perf_ablation.py 2>&1 | tee quality_logs/perf_ablation_r3b.log
land "Evidence: step ablation after the vjp shared forward" quality_logs/perf_ablation_r3b.log

echo "=== r3b queue done ==="

# --- appended stages (round-3 continuation session) ---

probe
echo "=== roofline analysis ==="
timeout 3600 python scripts/roofline.py 2>&1 | tee quality_logs/roofline_r3.log
land "Evidence: roofline analysis of the fused step" quality_logs/roofline_r3.log

probe
echo "=== resolution-sweep throughput (32/64/224px) ==="
timeout 3600 python scripts/bench_resolutions.py 2>&1 | tee quality_logs/bench_resolutions_r3.log
land "Evidence: alternated-step throughput across dataset geometries" quality_logs/bench_resolutions_r3.log

probe
echo "=== headline bench re-measure (post vjp) ==="
timeout 3600 python bench.py 2>&1 | tee quality_logs/bench_headline_r3b.log
land "Evidence: headline bench after the vjp shared forward" quality_logs/bench_headline_r3b.log

echo "=== r3b queue extension done ==="
