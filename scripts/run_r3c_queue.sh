#!/bin/bash
# Round-3 (second continuation) TPU evidence queue (internal tool).
# The r3b queue died mid-imagenet10; its post-pipeline bench stages never ran.
# Remaining work, quick stages first so evidence lands early:
#   1. headline bench re-measure post-vjp (also records the loss_only
#      production-mode number bench.py now reports)
#   2. variant-step throughput post-vjp
#   3. step ablation post-vjp
#   4. roofline analysis (script committed, never executed)
#   5. resolution sweep 32/64/224px (script committed, never executed)
#   6. imagenet10 224px pipeline, strengthened recipe: 100/100/100 epochs with
#      half-scale LR milestones (50,75) so every stage actually enters the
#      decay phase (the r3b attempt used 20/50/30 epochs and its clean model
#      was still at 15% acc when the queue died)
# ONE python process on the TPU at a time.
#
# Run: nohup bash scripts/run_r3c_queue.sh > quality_logs/r3c_queue.log 2>&1 &
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
echo "=== headline bench re-measure (post vjp, with loss_only mode) ==="
timeout 3600 python bench.py 2>&1 | tee quality_logs/bench_headline_r3c.log
land "Evidence: headline bench after the vjp shared forward" quality_logs/bench_headline_r3c.log

probe
echo "=== variant-step throughput, post vjp-shared-forward ==="
timeout 3600 python scripts/bench_variants.py 2>&1 | tee quality_logs/bench_variants_r3c.log
land "Evidence: variant throughput after the vjp shared forward" quality_logs/bench_variants_r3c.log

probe
echo "=== step ablation, post vjp-shared-forward ==="
timeout 3600 python scripts/perf_ablation.py 2>&1 | tee quality_logs/perf_ablation_r3c.log
land "Evidence: step ablation after the vjp shared forward" quality_logs/perf_ablation_r3c.log

probe
echo "=== roofline analysis ==="
timeout 3600 python scripts/roofline.py 2>&1 | tee quality_logs/roofline_r3.log
land "Evidence: roofline analysis of the fused step" quality_logs/roofline_r3.log

probe
echo "=== resolution-sweep throughput (32/64/224px) ==="
timeout 3600 python scripts/bench_resolutions.py 2>&1 | tee quality_logs/bench_resolutions_r3.log
land "Evidence: alternated-step throughput across dataset geometries" quality_logs/bench_resolutions_r3.log

probe
echo "=== imagenet10 224px pipeline (strengthened recipe) ==="
rm -rf checkpoints/in10_clean_cls checkpoints/in10_atk_clean checkpoints/in10_victim_clean checkpoints/in10_eval_clean
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 \
    Q_EXTRA="--synthetic_size 2000 --schedulerC_milestones 50,75 --schedulerG_milestones 50,75 --scheduler_clean_milestones 50,75" \
    Q_EPOCHS_CLEAN=100 Q_EPOCHS_GEN=100 Q_EPOCHS_VICTIM=100 \
    timeout 21600 python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3.log
land "Evidence: imagenet10 224px pipeline (100/100/100-epoch recipe)" quality_logs/quality_imagenet10_r3.log

echo "=== r3c queue done ==="
