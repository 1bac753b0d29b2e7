#!/bin/bash
# Round-3 TPU evidence queue (internal tool). Serialized: ONE python process
# on the TPU at a time (axon tunnel wedges otherwise — see verify skill).
# Run: nohup bash scripts/run_r3_queue.sh > quality_logs/r3_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p quality_logs

echo "=== [0/8] pallas kernel tests on the real TPU (adjoint fix) ==="
COMBAT_TESTS_TPU=1 python -m pytest tests/test_pallas.py -q -p no:cacheprovider \
    2>&1 | tee quality_logs/pallas_tpu_r3.log

echo "=== [1/8] perf ablation (incl. pallas fused-trigger row) ==="
python scripts/perf_ablation.py 2>&1 | tee quality_logs/perf_ablation_r3.log

echo "=== [2/8] variant step throughput ==="
python scripts/bench_variants.py 2>&1 | tee quality_logs/bench_variants_r3.log

echo "=== [3/8] frequency detector training (synthetic, 50 epochs) ==="
python -m combat_tpu.defenses.frequency_train --dataset cifar10 --synthetic_data \
    --bs 128 --compute_dtype bfloat16 --n_iters 50 --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee quality_logs/frequency_train_r3.log

echo "=== [4/8] frequency eval: r11 generator vs shipped-reference detector ==="
python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    2>&1 | tee quality_logs/frequency_eval_refdet_r3.log

echo "=== [5/8] frequency eval: r11 generator vs freshly trained detector ==="
python -m combat_tpu.defenses.frequency_eval --dataset cifar10 --synthetic_data \
    --bs 128 --noise_rate 0.08 --load_checkpoint r11_atk_clean --F_model original \
    --F_checkpoints ./checkpoints/F_trained \
    2>&1 | tee quality_logs/frequency_eval_trained_r3.log

echo "=== [6/8] imagenet10 224px debug pipeline smoke ==="
python -m combat_tpu.cli.train_clean_classifier --dataset imagenet10 --synthetic_data \
    --debug --n_iters 2 --saving_prefix r3smk_in10_cls \
    2>&1 | tee quality_logs/smoke_imagenet10_r3.log
python -m combat_tpu.cli.train_generator --dataset imagenet10 --synthetic_data \
    --debug --n_iters 2 --saving_prefix r3smk_in10_atk \
    --load_checkpoint_clean r3smk_in10_cls \
    2>&1 | tee -a quality_logs/smoke_imagenet10_r3.log
python -m combat_tpu.cli.train_victim --dataset imagenet10 --synthetic_data \
    --debug --n_iters 2 --saving_prefix r3smk_in10_victim \
    --load_checkpoint r3smk_in10_atk_clean \
    2>&1 | tee -a quality_logs/smoke_imagenet10_r3.log
python -m combat_tpu.cli.eval --dataset imagenet10 --synthetic_data \
    --saving_prefix r3smk_in10_eval --load_checkpoint r3smk_in10_atk_clean \
    --load_checkpoint_clean r3smk_in10_victim_clean \
    2>&1 | tee -a quality_logs/smoke_imagenet10_r3.log

echo "=== [7/8] celeba 64px debug pipeline smoke ==="
python -m combat_tpu.cli.train_clean_classifier --dataset celeba --synthetic_data \
    --debug --n_iters 2 --saving_prefix r3smk_cel_cls \
    2>&1 | tee quality_logs/smoke_celeba_r3.log
python -m combat_tpu.cli.train_generator --dataset celeba --synthetic_data \
    --debug --n_iters 2 --saving_prefix r3smk_cel_atk \
    --load_checkpoint_clean r3smk_cel_cls \
    2>&1 | tee -a quality_logs/smoke_celeba_r3.log
python -m combat_tpu.cli.train_victim --dataset celeba --synthetic_data \
    --debug --n_iters 2 --saving_prefix r3smk_cel_victim \
    --load_checkpoint r3smk_cel_atk_clean \
    2>&1 | tee -a quality_logs/smoke_celeba_r3.log
python -m combat_tpu.cli.eval --dataset celeba --synthetic_data \
    --saving_prefix r3smk_cel_eval --load_checkpoint r3smk_cel_atk_clean \
    --load_checkpoint_clean r3smk_cel_victim_clean \
    2>&1 | tee -a quality_logs/smoke_celeba_r3.log

echo "=== queue done ==="
