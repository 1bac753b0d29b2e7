#!/bin/bash
# Round-3 TPU evidence queue, part o (internal tool): the container reset at
# 09:08 killed the r3n queue and wiped checkpoints/ again.  What survives
# committed: imagenet10 10k stage-1 (quality_imagenet10_r3n.log).  The 10k
# stages 2-4 are multi-hour at 224px/bs=16 and do not fit the remaining
# round budget, so this queue lands only the quick remaining item:
#   1. scan_chunk dispatch-overhead bench (ex-r3k, never committed)
# The destructive long-execution probe is intentionally NOT run: it can
# wedge the tunnel and the driver still needs the chip for the end-of-round
# bench.py run.
#
# Run: nohup setsid bash scripts/run_r3o_queue.sh > quality_logs/r3o_queue.log 2>&1 &
set -x
cd /root/repo

# PROVENANCE NOTE (advisor r3 #3): as run on 2026-08-20 both 600s-stall
# attempts were killed before first compile under a ~100x tunnel degradation;
# a third attempt at stall=1800 (the budget below, aligned post-hoc) was
# pre-empted by round end.  The committed log was renamed
# bench_scan_chunk_r3_NO_RESULT_tunnel_degraded.log -- it contains only the
# watchdog-kill diagnostics, NO measurement.
rm -f quality_logs/bench_scan_chunk_r3.log
python scripts/watchdog_run.py quality_logs/bench_scan_chunk_r3.log 1800 -- \
    python scripts/bench_scan_chunk.py \
    || python scripts/watchdog_run.py quality_logs/bench_scan_chunk_r3.log 1800 -- \
        python scripts/bench_scan_chunk.py
git add quality_logs/bench_scan_chunk_r3.log \
    && git commit -m "Evidence: scan_chunk dispatch-overhead bench at the headline point" \
    || echo "commit failed (non-fatal)"

echo "=== r3o queue done ==="
