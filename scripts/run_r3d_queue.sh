#!/bin/bash
# Round-3 TPU evidence queue, part d (internal tool): defense-evasion
# evidence at the SECOND dataset geometry. The full defense suite (NC /
# STRIP / fine-pruning, each calibrated against the benign clean model) has
# only ever been run on the cifar-geometry r11 victim; the celeba 64px
# victim (ASR 100.0, quality_logs/quality_celeba_r3.log) and its
# checkpoints are on disk from the r3b queue. Waits for the r3c queue
# (imagenet10 pipeline) to finish first — ONE python process on the TPU.
#
# Run: nohup bash scripts/run_r3d_queue.sh > quality_logs/r3d_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

while pid=$(ps -eo pid,cmd | awk '/run_r3[bc]_queue.sh$/ && !/awk/ {print $1; exit}'); [ -n "$pid" ]; do
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
echo "=== defense suite vs celeba 64px victim (+ benign calibration) ==="
DATASET=celeba VICTIM_PREFIX=cel_victim CLEAN_PREFIX=cel_clean_cls NC_EPOCHS=50 \
    OUT=./quality_logs/defenses_celeba \
    timeout 21600 python scripts/run_defense_evidence.py 2>&1 | tee quality_logs/defenses_celeba_r3.log
git add quality_logs/defenses_celeba_r3.log quality_logs/defenses_celeba \
    && git commit -m "Evidence: defense suite vs the celeba 64px victim, benign-calibrated" \
    || echo "commit failed (non-fatal)"

echo "=== r3d queue done ==="
