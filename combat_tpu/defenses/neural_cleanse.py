"""Neural Cleanse trigger reverse-engineering + MAD outlier detection.

Parity with reference ``defenses/neural_cleanse/``: per target label, optimize
a tanh-parameterized (mask, pattern) so that ``(1-mask)·x + mask·pattern``
drives the frozen victim classifier to the target label (``detecting.py:16-41``),
Adam lr 1e-1 β=(0.5, 0.9) (``:151``), loss = CE + cost·L1(mask) with the
dynamic cost schedule (up ×k on sustained attack success, down ÷k^1.5
otherwise, ``:252-277``) and early stop (``:233-249``); then MAD outlier
detection over the per-label mask L1 norms — anomaly index ≥ 2 ⇒ backdoored
(``neural_cleanse.py:13-51``).

Quirk preserved: the reference normalizes the pattern with CIFAR statistics
(0.4914…/0.247…) although the victim was trained on ±0.5-normalized inputs
(``detecting.py:65-85``).

TPU-native: the per-batch optimization step is one jitted function; the whole
test set stays device-resident; the cost-schedule state machine runs between
epochs on host scalars (a handful per epoch — off the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..train.steps import cross_entropy

EPSILON = 1e-7
# reference detecting.py:76-85 (cifar10 stats; mnist ±0.5)
_NC_STATS = {
    "cifar10": (np.array([0.4914, 0.4822, 0.4465]), np.array([0.247, 0.243, 0.261])),
    "mnist": (np.array([0.5]), np.array([0.5])),
}


def raw_mask(mask_tanh):
    return jnp.tanh(mask_tanh) / (2.0 + EPSILON) + 0.5


def raw_pattern(pattern_tanh):
    return jnp.tanh(pattern_tanh) / (2.0 + EPSILON) + 0.5


def make_nc_step(cfg: Config, C, target_label: int):
    stats = _NC_STATS.get(cfg.dataset)

    def apply_trigger(params, x):
        m = raw_mask(params["mask_tanh"])[..., None]  # (H, W, 1)
        p = raw_pattern(params["pattern_tanh"])  # (H, W, C)
        if stats is not None:
            mean, std = stats
            p = (p - jnp.asarray(mean, p.dtype)) / jnp.asarray(std, p.dtype)
        return (1.0 - m) * x + m * p

    def step(params, opt_state, varsC, x, cost, tx):
        y_target = jnp.full((x.shape[0],), target_label, jnp.int32)

        def loss_fn(params):
            logits = C.apply(varsC, apply_trigger(params, x), train=False)
            l_ce = cross_entropy(logits, y_target)
            l_reg = jnp.sum(jnp.abs(raw_mask(params["mask_tanh"])))
            acc = jnp.mean((jnp.argmax(logits, -1) == y_target).astype(jnp.float32)) * 100.0
            return l_ce + cost * l_reg, (l_ce, l_reg, acc)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return step, apply_trigger


@dataclass
class NCConfig:
    lr: float = 1e-1
    init_cost: float = 1e-3
    atk_succ_threshold: float = 99.0
    early_stop: bool = True
    early_stop_threshold: float = 99.0
    early_stop_patience: int = 25
    patience: int = 5
    cost_multiplier: float = 2.0
    epochs: int = 50
    bs: int = 64


def reverse_engineer_trigger(
    cfg: Config,
    C,
    varsC,
    images: jnp.ndarray,
    target_label: int,
    nc: NCConfig = NCConfig(),
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Optimize (mask, pattern) for one target label; returns
    (mask_best, pattern_best, reg_best). Mirrors detecting.py train/train_step
    incl. the Recorder state machine."""
    h, w, c = cfg.input_height, cfg.input_width, cfg.input_channel
    params = {
        "mask_tanh": jnp.ones((h, w), jnp.float32),
        "pattern_tanh": jnp.ones((h, w, c), jnp.float32),
    }
    tx = optax.adam(nc.lr, b1=0.5, b2=0.9)
    opt_state = tx.init(params)
    step, _ = make_nc_step(cfg, C, target_label)
    jit_step = jax.jit(lambda p, o, x, cost: step(p, o, varsC, x, cost, tx))

    n = images.shape[0]
    steps = max(1, n // nc.bs)
    batches = images[: steps * nc.bs].reshape(steps, nc.bs, h, w, c)

    # Recorder state (detecting.py:88-120)
    mask_best = pattern_best = None
    reg_best = float("inf")
    cost = nc.init_cost
    cost_up_counter = cost_down_counter = cost_set_counter = 0
    cost_up_flag = cost_down_flag = False
    early_stop_counter = 0
    early_stop_reg_best = reg_best

    for epoch in range(nc.epochs):
        ce_l, reg_l, acc_l = [], [], []
        for b in range(steps):
            params, opt_state, (l_ce, l_reg, acc) = jit_step(params, opt_state, batches[b], cost)
            ce_l.append(l_ce)
            reg_l.append(l_reg)
            acc_l.append(acc)
        avg_reg = float(np.mean(jax.device_get(reg_l)))
        avg_acc = float(np.mean(jax.device_get(acc_l)))

        if avg_acc >= nc.atk_succ_threshold and avg_reg < reg_best:
            mask_best = np.asarray(raw_mask(params["mask_tanh"]))
            pattern_best = np.asarray(raw_pattern(params["pattern_tanh"]))
            reg_best = avg_reg
            print(" Updated !!!")
        print(f"  Label {target_label} epoch {epoch}: acc {avg_acc:.3f} | reg {avg_reg:.6f} | best {reg_best:.6f}")

        # early stop (detecting.py:233-249)
        if nc.early_stop:
            if reg_best < float("inf"):
                if reg_best >= nc.early_stop_threshold * early_stop_reg_best:
                    early_stop_counter += 1
                else:
                    early_stop_counter = 0
            early_stop_reg_best = min(early_stop_reg_best, reg_best)
            if cost_down_flag and cost_up_flag and early_stop_counter >= nc.early_stop_patience:
                print("Early_stop !!!")
                break

        # dynamic cost (detecting.py:252-277)
        if cost == 0 and avg_acc >= nc.atk_succ_threshold:
            cost_set_counter += 1
            if cost_set_counter >= nc.patience:
                cost = nc.init_cost
                cost_up_counter = cost_down_counter = 0
                cost_up_flag = cost_down_flag = False
                print(f"Initialize cost to {cost:f}")
        else:
            cost_set_counter = 0
        if avg_acc >= nc.atk_succ_threshold:
            cost_up_counter += 1
            cost_down_counter = 0
        else:
            cost_up_counter = 0
            cost_down_counter += 1
        if cost_up_counter >= nc.patience:
            cost_up_counter = 0
            cost *= nc.cost_multiplier
            cost_up_flag = True
        elif cost_down_counter >= nc.patience:
            cost_down_counter = 0
            cost /= nc.cost_multiplier**1.5
            cost_down_flag = True

    if mask_best is None:
        mask_best = np.asarray(raw_mask(params["mask_tanh"]))
        pattern_best = np.asarray(raw_pattern(params["pattern_tanh"]))
    return mask_best, pattern_best, reg_best


def outlier_detection(l1_norms: np.ndarray) -> Dict[str, float]:
    """MAD anomaly index (reference neural_cleanse.py:13-27)."""
    l1 = np.asarray(l1_norms, np.float64)
    consistency_constant = 1.4826
    median = np.median(l1)
    mad = consistency_constant * np.median(np.abs(l1 - median))
    min_mad = abs(l1.min() - median) / mad if mad > 0 else 0.0
    print(f"Median: {median}, MAD: {mad}")
    print(f"Anomaly index: {min_mad}")
    print("This is a backdoor model" if min_mad >= 2 else "Not a backdoor model")
    return {"median": float(median), "mad": float(mad), "anomaly_index": float(min_mad),
            "backdoored": bool(min_mad >= 2)}


def main(argv=None):
    """CLI parity with reference neural_cleanse.py:54-118 (per-label loop +
    MAD verdict; masks/patterns saved as .npy under --result).  Adds
    ``--nc_epochs`` (default 50 = reference ``--epoch``) for short runs."""
    import os

    from ..checkpoint import load_checkpoint
    from ..cli.common import build_mesh, ref_ckpt_path
    from ..config import Config, apply_dataset_preset, build_parser
    from ..data import get_dataset
    from ..models import get_classifier

    parser = build_parser()
    parser.add_argument("--nc_epochs", type=int, default=50)
    ns = parser.parse_args(argv)
    nc = NCConfig(epochs=ns.nc_epochs)
    cfg = apply_dataset_preset(Config(**{k: v for k, v in vars(ns).items() if k in Config.__dataclass_fields__}))
    build_mesh(cfg)
    C = get_classifier(cfg)
    ckpt = ref_ckpt_path(cfg.checkpoints, f"{cfg.saving_prefix}_clean", cfg.dataset)
    payload = load_checkpoint(ckpt)
    varsC = {
        "params": jax.tree.map(jnp.asarray, payload["netC"]["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
    }
    images = jnp.asarray(get_dataset(cfg, train=False).images)

    result_dir = os.path.join("./results", f"{cfg.saving_prefix}_clean", cfg.dataset)
    os.makedirs(result_dir, exist_ok=True)
    norms = []
    for label in range(cfg.num_classes):
        print(f"----------------- Analyzing label: {label} -----------------")
        mask, pattern, _ = reverse_engineer_trigger(cfg, C, varsC, images, label, nc)
        np.save(os.path.join(result_dir, f"mask_{label}.npy"), mask)
        np.save(os.path.join(result_dir, f"pattern_{label}.npy"), pattern)
        norms.append(np.abs(mask).sum())
    print(f"{len(norms)} labels found")
    print(f"Norm values: {norms}")
    verdict = outlier_detection(np.array(norms))
    with open(os.path.join(result_dir, f"{cfg.dataset}_{cfg.saving_prefix}_output.txt"), "a+") as f:
        f.write(f"{verdict['median']}, {verdict['mad']}, {verdict['anomaly_index']}\n")
        f.write(", ".join(str(v) for v in norms) + "\n")


if __name__ == "__main__":
    main()
