#!/bin/bash
# Round-3 TPU evidence queue, phase 2 (internal tool). Serialized: ONE
# python process on the TPU at a time (axon tunnel wedges otherwise).
# Run: nohup bash scripts/run_r3_queue2.sh > quality_logs/r3_queue2.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

echo "=== [1/3] pallas kernel tests on the real TPU (retry; earlier attempt hit a wedged tunnel) ==="
COMBAT_TESTS_TPU=1 python -m pytest tests/test_pallas.py -q -p no:cacheprovider \
    2>&1 | tee quality_logs/pallas_tpu_r3.log

echo "=== [2/3] celeba 64px full quality pipeline (canonical epochs) ==="
Q_DATASET=celeba Q_PREFIX=cel Q_EPOCHS_CLEAN=60 Q_EPOCHS_GEN=200 Q_EPOCHS_VICTIM=100 \
    python scripts/quality_run.py 2>&1 | tee quality_logs/quality_celeba_r3.log

echo "=== [3/3] imagenet10 224px quality pipeline (reduced synthetic size / epochs) ==="
Q_DATASET=imagenet10 Q_BS=32 Q_PREFIX=in10 Q_EXTRA="--synthetic_size 4000" \
    Q_EPOCHS_CLEAN=30 Q_EPOCHS_GEN=60 Q_EPOCHS_VICTIM=40 \
    python scripts/quality_run.py 2>&1 | tee quality_logs/quality_imagenet10_r3.log

echo "=== queue2 done ==="
