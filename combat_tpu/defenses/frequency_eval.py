"""Test the frequency detector against the COMBAT trigger.

CLI parity with reference ``defenses/frequency_based/test.py:67-108``: loads
the pretrained detector and the trained generator, builds a poisoned half of
each test batch with G's trigger chain, reports clean-classification accuracy
and detection rate.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..checkpoint import load_checkpoint
from ..cli.common import build_mesh, ref_ckpt_path
from ..config import from_args
from ..data import get_dataset
from ..models import get_frequency_detector, get_generator
from ..train import eval_epoch, metrics_to_host, padded_eval_batches
from .frequency import make_trigger_test_step


def run(cfg):
    mesh = build_mesh(cfg)
    test_ds = get_dataset(cfg, train=False)
    timgs = jnp.asarray(test_ds.images)
    tlabs = jnp.asarray(test_ds.labels)

    F = get_frequency_detector(cfg)
    G = get_generator(cfg, "unet")
    key = jax.random.key(cfg.seed)
    sample = jnp.zeros((1, cfg.input_height, cfg.input_width, cfg.input_channel))
    vars_det = F.init({"params": key, "dropout": key}, sample)

    f_ckpt = os.path.join(cfg.F_checkpoints, cfg.dataset, cfg.F_model, f"{cfg.dataset}_{cfg.F_model}_detector.ckpt")
    if not os.path.exists(f_ckpt):
        raise SystemExit(f"Error: {f_ckpt} not found")
    payload = load_checkpoint(f_ckpt)
    vars_det = {
        "params": jax.tree.map(jnp.asarray, payload["netC"]["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, payload["netC"]["batch_stats"]),
    }

    if not cfg.load_checkpoint:
        raise SystemExit("--load_checkpoint is required (generator run name)")
    g_path = ref_ckpt_path(cfg.checkpoints, cfg.load_checkpoint, cfg.dataset)
    payload = load_checkpoint(g_path)
    paramsG = jax.tree.map(jnp.asarray, payload["netG"]["params"])

    step = make_trigger_test_step(cfg, F, G)
    eidx, evalid = padded_eval_batches(len(test_ds), cfg.bs)
    with mesh:
        em = metrics_to_host(eval_epoch(
            step, (vars_det, paramsG), timgs, tlabs, jnp.asarray(eidx), jnp.asarray(evalid),
            jax.random.fold_in(key, 1), cfg.bs, chunk=cfg.scan_chunk,
        ))
    acc = em["clean_correct"] * 100 / em["sample"]
    det = em["detected"] * 100 / em["sample"]
    print(f"Clean classified clean: {acc:.4f} | Triggered detected: {det:.4f}")
    return acc, det


def main(argv=None):
    run(from_args(argv))


if __name__ == "__main__":
    main()
