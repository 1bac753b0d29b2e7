#!/bin/bash
# Round-3 TPU evidence queue, part g (internal tool): rerun the celeba
# fine-pruning sweep after the closure→argument fix (the r3d attempt died
# with HTTP 413: the test split was baked into the compiled program as a
# constant and blew the remote-compile upload limit at 64px).
# Waits for r3c/r3d/r3e/r3f. ONE python process on the TPU at a time.
#
# Run: nohup setsid bash scripts/run_r3g_queue.sh > quality_logs/r3g_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs/defenses_celeba

while pid=$(ps -eo pid,cmd | awk '/run_r3[cdef]_queue.sh$/ && !/awk/ {print $1; exit}'); [ -n "$pid" ]; do
    echo "earlier queue (pid $pid) still running; sleeping 5 min"
    sleep 300
done

probe() {
    until timeout 900 python -c "import jax; d = jax.devices(); print('TPU OK:', d)"; do
        echo "tunnel down; sleeping 3 min"
        sleep 180
    done
}

probe
echo "=== celeba fine-pruning sweep (post-413-fix) ==="
timeout 7200 python -m combat_tpu.defenses.fine_pruning \
    --dataset celeba --synthetic_data --bs 128 --seed 1 --saving_prefix cel_victim \
    --outfile quality_logs/defenses_celeba/fine_pruning_cel_sweep.txt \
    2>&1 | tee quality_logs/defenses_celeba/fine_pruning_cel_victim.txt
git add quality_logs/defenses_celeba \
    && git commit -m "Evidence: celeba fine-pruning sweep after the jit-argument fix" \
    || echo "commit failed (non-fatal)"

echo "=== r3g queue done ==="
