"""Pallas fused low-pass / fused-trigger kernels: parity with the pure-JAX
formulation and VJP correctness (the low-pass is self-adjoint linear; the
blur adjoint is B^T g B).  On a TPU backend the kernels run under Mosaic;
on the CPU test backend they fall back to Pallas interpreter mode
(COMBAT_PALLAS_INTERPRET=1) — same kernel bodies, same math."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def _tpu_available() -> bool:
    try:
        return any(d.platform.lower() not in ("cpu", "host") for d in jax.devices())
    except Exception:
        # accelerator plugin present but unreachable (tunnel outage): a failed
        # init is cached in-process, so force the CPU platform for the
        # interpreter fallback to have a working backend at all
        jax.config.update("jax_platforms", "cpu")
        return False


if not _tpu_available():
    os.environ["COMBAT_PALLAS_INTERPRET"] = "1"


def test_low_freq_pallas_matches_xla():
    from combat_tpu.ops.dct import low_freq
    from combat_tpu.ops.pallas_kernels import low_freq_pallas

    x = jax.random.uniform(jax.random.key(0), (8, 32, 32, 3), minval=-1, maxval=1)
    ref = low_freq(x, 32, 0.65)
    got = low_freq_pallas(x, 32, 0.65)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_low_freq_pallas_vjp_matches_xla():
    from combat_tpu.ops.dct import low_freq
    from combat_tpu.ops.pallas_kernels import low_freq_pallas

    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), minval=-1, maxval=1)

    def loss_ref(x):
        return jnp.sum(jnp.sin(low_freq(x, 32, 0.65)))

    def loss_pk(x):
        return jnp.sum(jnp.sin(low_freq_pallas(x, 32, 0.65)))

    g_ref = jax.grad(loss_ref)(x)
    g_pk = jax.grad(loss_pk)(x)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref), atol=2e-5)


def test_fused_trigger_pallas_matches_xla_chain():
    from functools import partial

    from combat_tpu.attack.triggers import additive_trigger

    x = jax.random.uniform(jax.random.key(3), (4, 32, 32, 3), minval=-1, maxval=1)
    noise = jax.random.uniform(jax.random.key(4), (4, 32, 32, 3), minval=-1, maxval=1)
    trig = partial(
        additive_trigger, image_size=32, ratio=0.65, noise_rate=0.08,
        kernel_size=3, sigma=(0.1, 1.0),
    )
    key = jax.random.key(7)
    ref = trig(key, x, noise)
    got = trig(key, x, noise, use_pallas_fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_trigger_pallas_vjp_matches_xla_chain():
    from functools import partial

    from combat_tpu.attack.triggers import additive_trigger

    x = jax.random.uniform(jax.random.key(5), (2, 32, 32, 3), minval=-1, maxval=1)
    noise = jax.random.uniform(jax.random.key(6), (2, 32, 32, 3), minval=-1, maxval=1)
    key = jax.random.key(9)
    # Pin a LARGE sigma: at small sigma the blur matrix is near-identity and
    # this test cannot distinguish B^T g B from B g B^T (the reflect-padded
    # B is asymmetric only at boundary rows) — a wrong blur adjoint passed
    # the old sigma=(0.1, 1.0) draw (~0.14) within atol.
    trig = partial(
        additive_trigger, image_size=32, ratio=0.65, noise_rate=0.08,
        kernel_size=3, sigma=(0.9, 0.9001),
    )

    def loss(fused):
        def f(x, noise):
            return jnp.sum(jnp.sin(trig(key, x, noise, use_pallas_fused=fused)))

        return jax.grad(f, argnums=(0, 1))(x, noise)

    gx_ref, gn_ref = loss(False)
    gx, gn = loss(True)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gn_ref), atol=5e-5)


def test_alternated_step_with_pallas_trigger_runs():
    """Step-level wiring: --pallas_trigger routes the alternated train step's
    trigger chain through the fused kernel and the step still trains (both
    optimizer states advance, finite loss)."""
    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
    from combat_tpu.train import init_frozen, init_train_state, make_alternated_train_step, multistep_lr, sgd_torch

    cfg = apply_dataset_preset(Config(dataset="cifar10", synthetic_data=True)).replace(
        bs=4, pallas_trigger=True
    )
    C, G, F = get_classifier(cfg), get_generator(cfg, "unet"), get_frequency_detector(cfg)
    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))
    tx = sgd_torch(multistep_lr(0.01, (100,), 0.1, 10))
    sC = init_train_state(C, key, sample, tx)
    sG = init_train_state(G, jax.random.key(1), sample, tx)
    cm = init_frozen(C, jax.random.key(2), sample)
    nf = init_frozen(F, jax.random.key(3), sample)
    step = make_alternated_train_step(cfg, C, G)
    x = jax.random.uniform(jax.random.key(4), (4, 32, 32, 3), minval=-1, maxval=1)
    y = jnp.array([0, 1, 2, 3])
    sC2, sG2, m = step(sC, sG, cm, nf, (x, y), jax.random.key(5))
    assert int(sC2.step) == int(sC.step) + 1 and int(sG2.step) == int(sG.step) + 1
    assert np.isfinite(float(m["loss_ce"]))
