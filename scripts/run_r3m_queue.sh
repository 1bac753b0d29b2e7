#!/bin/bash
# Round-3 TPU queue, part m (internal tool, LAST): direct measurement of the
# tunnel's long-execution limit (scripts/probe_long_execution.py).  Runs only
# after the r3l defense suite because a killed worker can wedge the tunnel
# for 20-40+ min — nothing may be queued after this.
#
# Run: nohup setsid bash scripts/run_r3m_queue.sh > quality_logs/r3m_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

until grep -q "r3l queue done" quality_logs/r3l_queue.log 2>/dev/null; do
    sleep 120
done

until timeout 900 python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
    echo "tunnel down; sleeping 3 min"
    sleep 180
done

echo "=== long-execution deadline probe (DESTRUCTIVE-LAST) ==="
timeout 3600 python scripts/probe_long_execution.py 2>&1 | tee quality_logs/probe_long_execution_r3.log
git add quality_logs/probe_long_execution_r3.log scripts/probe_long_execution.py scripts/run_r3m_queue.sh \
    && git commit -m "Evidence: direct probe of the tunnel's long-execution limit" \
    || echo "commit failed (non-fatal)"

echo "=== r3m queue done ==="
