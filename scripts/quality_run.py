"""End-to-end attack-quality run on the synthetic dataset (internal tool).

Drives the full pipeline at real scale (full synthetic splits, bf16):
clean classifier → alternated generator → victim → final eval, and prints
the trajectory of the headline metrics (clean acc up, ASR up).  With no
CIFAR-10 on disk in this environment this is the strongest end-to-end
convergence evidence available; on a machine with data, drop the
``--synthetic_data`` flag in the CLIs instead.
"""

import os
import sys

# runnable as `python scripts/quality_run.py` from anywhere (the repo root is
# NOT on sys.path for direct script invocation — only scripts/ is)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.argv = [sys.argv[0]]

# Full-scale defaults match the reference protocol's 200-epoch stages
# (reference README.md:88-93); override via env for quick smokes.
EPOCHS_CLEAN = int(os.environ.get("Q_EPOCHS_CLEAN", 100))
EPOCHS_GEN = int(os.environ.get("Q_EPOCHS_GEN", 200))
EPOCHS_VICTIM = int(os.environ.get("Q_EPOCHS_VICTIM", 100))
PREFIX = os.environ.get("Q_PREFIX", "q")
DATASET = os.environ.get("Q_DATASET", "cifar10")
# Resume support: Q_STAGES="2,3,4" skips stages already completed by a
# previous (interrupted) queue — stage N still requires stage N-1's
# checkpoint on disk (container resets wipe checkpoints/, not logs).
STAGES = {int(s) for s in os.environ.get("Q_STAGES", "1,2,3,4").split(",")}

COMMON = [
    "--dataset", DATASET, "--synthetic_data", "--bs", os.environ.get("Q_BS", "128"),
    "--compute_dtype", "bfloat16", "--seed", "1",
] + os.environ.get("Q_EXTRA", "").split()


def main():
    from combat_tpu.cli import eval as eval_cli
    from combat_tpu.cli import train_clean_classifier, train_generator, train_victim
    from combat_tpu.config import from_args

    if 1 in STAGES:
        print("=== stage 1: clean classifier ===")
        cfg = from_args(COMMON + ["--n_iters", str(EPOCHS_CLEAN), "--saving_prefix", PREFIX + "_clean_cls"])
        best_clean = train_clean_classifier.run(cfg)
        print(f"clean classifier best acc: {best_clean:.2f}")

    if 2 in STAGES:
        print("=== stage 2: alternated generator ===")
        cfg = from_args(COMMON + [
            "--n_iters", str(EPOCHS_GEN), "--saving_prefix", PREFIX + "_atk",
            "--load_checkpoint_clean", PREFIX + "_clean_cls", "--pc", "0.5", "--noise_rate", "0.08",
        ])
        best = train_generator.run(cfg)
        print("generator best:", {k: round(v, 2) for k, v in best.items()})

    if 3 in STAGES:
        print("=== stage 3: victim ===")
        cfg = from_args(COMMON + [
            "--n_iters", str(EPOCHS_VICTIM), "--saving_prefix", PREFIX + "_victim",
            "--load_checkpoint", PREFIX + "_atk_clean", "--pc", "0.5", "--noise_rate", "0.08",
        ])
        vbest = train_victim.run(cfg)
        print(f"victim best clean {vbest['best_clean_acc']:.2f} / bd {vbest['best_bd_acc']:.2f}")

    if 4 in STAGES:
        print("=== stage 4: final eval ===")
        cfg = from_args(COMMON + [
            "--saving_prefix", PREFIX + "_eval", "--load_checkpoint", PREFIX + "_atk_clean",
            "--load_checkpoint_clean", PREFIX + "_victim_clean", "--noise_rate", "0.08",
        ])
        acc, ba, asr = eval_cli.run(cfg)
        print(f"FINAL: Clean Acc {acc:.2f} | Bd BA {ba:.2f} | Bd ASR {asr:.2f}")


if __name__ == "__main__":
    main()
