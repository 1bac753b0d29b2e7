#!/bin/bash
# Round-3 TPU evidence queue, part k (internal tool): after r3j completes,
# measure the --scan_chunk dispatch overhead at the headline operating point
# (PERF.md row) — one TPU process at a time, so this waits for the r3j
# pipeline to finish first.
#
# Run: nohup setsid bash scripts/run_r3k_queue.sh > quality_logs/r3k_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

# wait for r3j (poll the queue log for its completion sentinel)
until grep -q "r3j queue done" quality_logs/r3j_queue.log 2>/dev/null; do
    sleep 120
done

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

probe
echo "=== scan_chunk overhead bench (headline point, 391-step epoch) ==="
timeout 3600 python scripts/bench_scan_chunk.py 2>&1 | tee quality_logs/bench_scan_chunk_r3.log
land "Evidence: scan_chunk dispatch-overhead bench at the headline point" \
    quality_logs/bench_scan_chunk_r3.log scripts/bench_scan_chunk.py scripts/run_r3k_queue.sh

echo "=== r3k queue done ==="
