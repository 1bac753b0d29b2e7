#!/bin/bash
# Round-3 TPU evidence queue, part l (internal tool): calibrated defense
# suite at the THIRD geometry — imagenet10 224px victim (in10d, the 10k-image
# --scan_chunk pipeline from r3j) vs its benign clean classifier.  Completes
# the evasion matrix across all three reference dataset geometries
# (cifar10 32px + celeba 64px are in QUALITY.md already).
#
# NC depth 30 (reference default 50; early-stop active) to fit both NC
# models before the round cutoff.
# Order inside the harness is fast-first (STRIP -> fine-pruning
# -> NC pair), so an end-of-round cutoff still leaves complete fast-defense
# evidence; the collage renders NC outputs so it runs last.  --fp_mask_chunk 16 bounds each fine-pruning dispatch to
# ~1.6 G pixel-forwards (57 at 224px would risk the tunnel watchdog).
#
# Run: nohup setsid bash scripts/run_r3l_queue.sh > quality_logs/r3l_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

until grep -q "r3k queue done" quality_logs/r3k_queue.log 2>/dev/null; do
    sleep 120
done

# the suite needs both stage checkpoints from r3j
if [ ! -d checkpoints/in10d_victim_clean ] || [ ! -d checkpoints/in10d_clean_cls ]; then
    echo "r3j checkpoints missing — aborting r3l"
    exit 1
fi

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
echo "=== imagenet10 defense suite: in10d victim vs benign ==="
VICTIM_PREFIX=in10d_victim CLEAN_PREFIX=in10d_clean_cls DATASET=imagenet10 \
    NC_EPOCHS=30 OUT=./quality_logs/defenses_imagenet10 FP_CHUNK=16 \
    EXTRA="--synthetic_size 10000 --scan_chunk 64" \
    timeout 18000 python scripts/run_defense_evidence.py 2>&1 | tee quality_logs/defenses_imagenet10_r3.log
land "Evidence: imagenet10 defense suite, benign-calibrated (third geometry)" \
    quality_logs/defenses_imagenet10_r3.log quality_logs/defenses_imagenet10

echo "=== r3l queue done ==="
