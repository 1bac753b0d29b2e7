#!/bin/bash
# Round-3 TPU evidence queue, part f (internal tool): perf follow-ups after
# the remat experiment and the bench reporting upgrade.
#   1. perf_ablation rerun — includes the new "remat step" variants
#      (accept/reject by measurement, SURVEY §7.1.6 discipline).
#   2. bench.py headline re-measure with the new as-shipped/production
#      brackets and the v4 equal-MFU projection fields.
# Waits for r3c/r3d/r3e. ONE python process on the TPU at a time.
#
# Run: nohup setsid bash scripts/run_r3f_queue.sh > quality_logs/r3f_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

while pid=$(ps -eo pid,cmd | awk '/run_r3[cde]_queue.sh$/ && !/awk/ {print $1; exit}'); [ -n "$pid" ]; do
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
echo "=== perf ablation with remat variants ==="
timeout 3600 python scripts/perf_ablation.py 2>&1 | tee quality_logs/perf_ablation_r3f.log
land "Evidence: step ablation with the remat variants" quality_logs/perf_ablation_r3f.log

probe
echo "=== headline bench re-measure (new bracket fields) ==="
timeout 3600 python bench.py 2>&1 | tee quality_logs/bench_headline_r3f.log
land "Evidence: headline bench with as-shipped/production brackets" quality_logs/bench_headline_r3f.log

echo "=== r3f queue done ==="
