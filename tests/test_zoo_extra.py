"""Extended-zoo parity: parameter counts vs the reference pytorch-cifar
models (goldens computed from /root/reference with torch; BN buffers
excluded on both sides).  Counts use jax.eval_shape — no compilation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combat_tpu.models.zoo_extra import (
    EfficientNetB0,
    GoogLeNet,
    LeNet,
    MobileNetV1,
    SENet18,
    ShuffleNetV2,
    dpn26,
    dpn92,
    pnasnet_a,
    pnasnet_b,
    resnext29_2x64d,
    resnext29_32x4d,
)

KEY = jax.random.key(0)

GOLDEN = [
    ("lenet", lambda: LeNet(10), 62_006),
    ("mobilenet", lambda: MobileNetV1(10), 3_217_226),
    ("efficientnetb0", lambda: EfficientNetB0(10), 6_806_794),
    ("googlenet", lambda: GoogLeNet(10), 6_166_250),
    ("dpn26", lambda: dpn26(10), 11_574_842),
    ("dpn92", lambda: dpn92(10), 34_236_634),
    ("senet18", lambda: SENet18(10), 11_260_354),
    ("shufflenetv2", lambda: ShuffleNetV2(10), 1_263_854),
    ("resnext29_2x64d", lambda: resnext29_2x64d(10), 9_128_778),
    ("resnext29_32x4d", lambda: resnext29_32x4d(10), 4_774_218),
    ("pnasnet_a", lambda: pnasnet_a(10), 130_646),
    ("pnasnet_b", lambda: pnasnet_b(10), 451_626),
]


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize("name,make,count", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_extra_zoo_param_parity(name, make, count):
    model = make()
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.eval_shape(model.init, {"params": KEY, "dropout": KEY}, x)
    assert n_params(variables["params"]) == count
    out = jax.eval_shape(lambda v, x: model.apply(v, x), variables, x)
    assert out.shape == (1, 10)


def test_one_extra_model_runs():
    m = LeNet(10)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init({"params": KEY}, x)
    assert m.apply(v, x).shape == (2, 10)
