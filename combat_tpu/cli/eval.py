"""Final attack evaluation: Clean Acc / Bd BA / Bd ASR.

CLI/semantics parity with reference ``eval.py``: loads the victim classifier
from the ``--load_checkpoint_clean`` path and the generator from
``--load_checkpoint`` (``main:190-215`` — note the reference loads netC from
the *clean-prefix-named* path the caller passes; the victim run saves under
``<prefix>_clean``, so callers pass that name verbatim — behavior preserved),
then reports Clean Acc over all test rows and BA/ASR over non-target rows
with the standard trigger chain (``eval:108-152``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..attack.triggers import additive_trigger, create_targets_bd
from ..checkpoint import load_checkpoint
from ..config import Config, from_args
from ..models import get_classifier, get_generator
from ..train import eval_epoch, metrics_to_host, padded_eval_batches
from ..utils import MetricsLogger
from .common import build_mesh, device_dataset, fmt_pct, ref_ckpt_path, setup_run_dirs


def make_final_eval_step(cfg: Config, C, G):
    from functools import partial

    trig = partial(
        additive_trigger,
        image_size=cfg.input_height,
        ratio=cfg.ratio,
        noise_rate=cfg.noise_rate,
        kernel_size=cfg.kernel_size,
        sigma=cfg.sigma,
    )

    def step(varsC, paramsG, batch, key):
        x, y, valid = batch
        bd_targets = create_targets_bd(y, cfg.attack_mode, cfg.target_label, cfg.num_classes)
        preds_clean = C.apply(varsC, x, train=False)
        ntrg = (y != cfg.target_label) & valid
        noise = G.apply({"params": paramsG}, x)
        x_bd = trig(key, x, noise)
        preds_bd = C.apply(varsC, x_bd, train=False)
        vf = valid.astype(jnp.float32)
        nf = ntrg.astype(jnp.float32)
        return {
            "clean_sample": vf.sum(),
            "bd_sample": nf.sum(),
            "clean_correct": (vf * (jnp.argmax(preds_clean, -1) == y)).sum(),
            "bd_ba": (nf * (jnp.argmax(preds_bd, -1) == y)).sum(),
            "bd_asr": (nf * (jnp.argmax(preds_bd, -1) == bd_targets)).sum(),
        }

    return step


def run(cfg: Config):
    mesh = build_mesh(cfg)
    timgs, tlabs, tds = device_dataset(cfg, mesh, False)
    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    key = jax.random.key(cfg.seed)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    varsC = C.init({"params": key}, sample)
    varsG = G.init({"params": key}, sample)

    if not cfg.load_checkpoint_clean:
        raise SystemExit("--load_checkpoint_clean is required")
    c_path = ref_ckpt_path(cfg.checkpoints, cfg.load_checkpoint_clean, cfg.dataset)
    if not os.path.exists(c_path):
        raise SystemExit(f"Error: {c_path} not found")
    payload = load_checkpoint(c_path)
    varsC = {"params": jax.tree.map(jnp.asarray, payload["netC"]["params"])}
    if "batch_stats" in payload["netC"]:  # absent for BN-free models (ViT)
        varsC["batch_stats"] = jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"])

    if not cfg.load_checkpoint:
        raise SystemExit("--load_checkpoint is required")
    g_path = ref_ckpt_path(cfg.checkpoints, cfg.load_checkpoint, cfg.dataset)
    if not os.path.exists(g_path):
        raise SystemExit(f"Error: {g_path} not found")
    payload = load_checkpoint(g_path)
    paramsG = jax.tree.map(jnp.asarray, payload["netG"]["params"])

    mode = cfg.saving_prefix or "eval"
    ckpt_folder = os.path.join(cfg.checkpoints, f"{mode}_clean", cfg.dataset)
    log_dir = setup_run_dirs(cfg, ckpt_folder, fresh=False)
    logger = MetricsLogger(log_dir, run_name="eval")

    step = make_final_eval_step(cfg, C, G)
    eidx, evalid = padded_eval_batches(len(tds), cfg.bs)
    with mesh:
        em = metrics_to_host(eval_epoch(
            step, (varsC, paramsG), timgs, tlabs, jnp.asarray(eidx), jnp.asarray(evalid),
            jax.random.fold_in(key, 1), cfg.bs, chunk=cfg.scan_chunk,
        ))
    acc_clean = em["clean_correct"] * 100 / em["clean_sample"]
    ba = em["bd_ba"] * 100 / max(em["bd_sample"], 1.0)
    asr = em["bd_asr"] * 100 / max(em["bd_sample"], 1.0)
    print(f"Clean Acc: {fmt_pct(acc_clean)} | Bd BA: {fmt_pct(ba)} | Bd ASR: {fmt_pct(asr)}")
    logger.log(0, {"Clean": acc_clean, "Bd BA": ba, "Bd ASR": asr}, group="test")
    logger.close()
    return acc_clean, ba, asr


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
