"""Per-image ASR failure analysis on the synthetic testbed (internal tool).

Loads a victim checkpoint (which stores the true (netC, netG) pair —
reference ``train_victim.py:221-229`` stores netG too), applies the standard
trigger chain to every non-target test image, and cross-tabulates attack
success against the synthetic generator's per-image parameters
(class-ambiguity blend, template amplitude, background amplitude) and the
victim's clean-prediction correctness.  This tells us *which* images resist
the trigger — the design signal for closing the final ASR gap.

Usage: python scripts/analyze_asr.py [victim_prefix=r10_victim_clean]
"""

import sys
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from combat_tpu.attack.triggers import additive_trigger  # noqa: E402
from combat_tpu.checkpoint import load_checkpoint  # noqa: E402
from combat_tpu.cli.common import ref_ckpt_path  # noqa: E402
from combat_tpu.config import Config, apply_dataset_preset  # noqa: E402
from combat_tpu.data.datasets import synthetic_dataset  # noqa: E402
from combat_tpu.models import get_classifier, get_generator  # noqa: E402


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "r10_victim_clean"
    cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True))
    ds, meta = synthetic_dataset(cfg, train=False, return_meta=True)
    payload = load_checkpoint(ref_ckpt_path("./checkpoints", prefix, "cifar10"))
    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    varsC = {
        "params": jax.tree.map(jnp.asarray, payload["netC"]["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
    }
    paramsG = jax.tree.map(jnp.asarray, payload["netG"]["params"])
    trig = partial(
        additive_trigger, image_size=cfg.input_height, ratio=cfg.ratio,
        noise_rate=cfg.noise_rate, kernel_size=cfg.kernel_size, sigma=cfg.sigma,
    )

    @jax.jit
    def preds(x, key):
        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(key, x, noise)
        pb = C.apply(varsC, x_bd, train=False)
        pc = C.apply(varsC, x, train=False)
        return jnp.argmax(pc, -1), jnp.argmax(pb, -1), jax.nn.softmax(pb)[:, cfg.target_label]

    key = jax.random.key(1)
    pc_all, pb_all, conf_all = [], [], []
    bs = 1000
    for i in range(0, len(ds), bs):
        a, b, c = preds(jnp.asarray(ds.images[i:i + bs]), jax.random.fold_in(key, i))
        pc_all.append(np.asarray(a)); pb_all.append(np.asarray(b)); conf_all.append(np.asarray(c))
    pred_clean = np.concatenate(pc_all)
    pred_bd = np.concatenate(pb_all)
    tconf = np.concatenate(conf_all)

    y = ds.labels
    ntrg = y != cfg.target_label
    succ = pred_bd == cfg.target_label
    print(f"overall ASR (non-target): {100 * succ[ntrg].mean():.2f}  (n={ntrg.sum()})")
    print(f"clean acc: {100 * (pred_clean == y).mean():.2f}")

    def bucket(name, mask):
        m = mask & ntrg
        if m.sum() == 0:
            return
        print(f"  {name:<34} n={m.sum():5d}  ASR={100 * succ[m].mean():6.2f}  "
              f"mean target-softmax={tconf[m].mean():.3f}")

    print("\nby ambiguity:")
    bucket("pure template (confuse=False)", ~meta["confuse"])
    bucket("ambiguous (confuse=True)", meta["confuse"])
    for lo, hi in [(0.5, 0.6), (0.6, 0.7), (0.7, 0.8), (0.8, 0.9)]:
        bucket(f"blend in [{lo},{hi})", meta["confuse"] & (meta["blend"] >= lo) & (meta["blend"] < hi))
    print("by template amplitude:")
    for lo, hi in [(0.4, 0.5), (0.5, 0.6), (0.6, 0.7), (0.7, 0.85)]:
        bucket(f"amp in [{lo},{hi})", (meta["amp"] >= lo) & (meta["amp"] < hi))
    print("by background amplitude:")
    for lo, hi in [(0.1, 0.2), (0.2, 0.35)]:
        bucket(f"bg_amp in [{lo},{hi})", (meta["bg_amp"] >= lo) & (meta["bg_amp"] < hi))
    print("by clean-prediction correctness:")
    bucket("clean pred correct", pred_clean == y)
    bucket("clean pred wrong", pred_clean != y)
    print("by true class:")
    for k in range(cfg.num_classes):
        bucket(f"class {k}", y == k)
    # where do the failures' predictions go?
    fail = ntrg & ~succ
    print(f"\nfailures: {fail.sum()}  -> predicted own label: "
          f"{100 * (pred_bd[fail] == y[fail]).mean():.1f}%  "
          f"predicted blended-other label: {100 * (pred_bd[fail] == meta['other'][fail]).mean():.1f}%")


if __name__ == "__main__":
    main()
