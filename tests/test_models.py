"""Model-zoo parity tests: parameter counts vs the reference PyTorch models
(golden values computed once from /root/reference with torch; BN running
stats are buffers in torch and the `batch_stats` collection here, so both are
excluded from the counts), output shapes, and key behaviors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from combat_tpu.models import (
    AE,
    FrequencyModelDropoutEnsemble,
    CUnetGenerator,
    FixedTriggerGenerator,
    GridGenerator,
    MixedGenerator,
    MobileNetV2,
    NetC_MNIST,
    SimpleViT,
    UnetGenerator,
    UnetGeneratorBK,
    densenet121,
    frequency_model,
    frequency_model_dropout,
    preact_resnet18,
    resnet18,
    vgg,
)

KEY = jax.random.key(0)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def init(model, *args, **kwargs):
    return model.init({"params": KEY, "dropout": KEY}, *args, **kwargs)


# Golden parameter counts from the reference implementation (see module docstring).
GOLDEN_COUNTS = [
    (lambda: preact_resnet18(10), (1, 32, 32, 3), 11_171_146),  # preact_resnet.py:108
    (lambda: resnet18(8), (1, 64, 64, 3), 11_185_224),  # resnet.py:104 (celeba)
    (lambda: vgg("VGG13", 10), (1, 32, 32, 3), 9_416_010),  # vgg.py:18
    (lambda: MobileNetV2(10), (1, 32, 32, 3), 2_296_922),  # mobilenetv2.py:44
    (lambda: densenet121(10), (1, 32, 32, 3), 6_956_298),  # densenet.py:91
    (lambda: frequency_model(2), (1, 32, 32, 3), 292_002),  # frequency_based/model.py:8
    (lambda: UnetGenerator(), (1, 32, 32, 3), 9_370_243),  # networks/models.py:268
    (lambda: GridGenerator(s=2), (1, 32, 32, 3), 4_718_728),  # networks/models.py:344
    (lambda: CUnetGenerator(num_classes=10), (1, 32, 32, 3), 9_376_003),  # models.py:472
    (lambda: MixedGenerator(s=2), (1, 32, 32, 3), 9_403_595),  # models.py:388
]


@pytest.mark.parametrize("make,shape,count", GOLDEN_COUNTS, ids=[str(c[2]) for c in GOLDEN_COUNTS])
def test_param_count_parity(make, shape, count):
    model = make()
    x = jnp.zeros(shape)
    rngs = {"params": KEY, "dropout": KEY}
    if isinstance(model, CUnetGenerator):
        variables = jax.eval_shape(model.init, rngs, x, jnp.zeros((shape[0],), jnp.int32))
    else:
        variables = jax.eval_shape(model.init, rngs, x)
    assert n_params(variables["params"]) == count


def test_classifier_output_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    for make in (lambda: preact_resnet18(10), lambda: vgg("VGG13", 10)):
        m = make()
        v = init(m, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10)


def test_resnet18_224_no_keyerror():
    """Reference ResNet18(input_size=224) KeyErrors (resnet.py:101-106);
    our size-agnostic head must work at 224px (imagenet10 path fix)."""
    m = resnet18(10)
    x = jnp.zeros((1, 224, 224, 3))
    v = jax.eval_shape(m.init, {"params": KEY}, x)
    out = jax.eval_shape(lambda v, x: m.apply(v, x), v, x)
    assert out.shape == (1, 10)


def test_unet_generator_shapes_and_range():
    m = UnetGenerator()
    x = jnp.zeros((2, 32, 32, 3))
    v = init(m, x)
    y = m.apply(v, x)
    assert y.shape == (2, 32, 32, 3)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh output


def test_unet_generator_bk_emits_clamped_image():
    m = UnetGeneratorBK()
    x = jnp.full((1, 32, 32, 3), 0.99)
    v = init(m, x)
    y = m.apply(v, x)
    assert float(y.max()) <= 1.0 and float(y.min()) >= -1.0


def test_grid_generator_flow_shape():
    m = GridGenerator(s=4)
    x = jnp.zeros((3, 32, 32, 3))
    v = init(m, x)
    assert m.apply(v, x).shape == (3, 4, 4, 2)


def test_cunet_label_conditioning_changes_output():
    m = CUnetGenerator(num_classes=10)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    v = init(m, x, jnp.zeros((2,), jnp.int32))
    y0 = m.apply(v, x, jnp.array([0, 0]))
    y1 = m.apply(v, x, jnp.array([1, 1]))
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_fixed_trigger_generator_broadcasts():
    m = FixedTriggerGenerator(32, 32, 3)
    x = jnp.zeros((5, 32, 32, 3))
    v = init(m, x)
    y = m.apply(v, x)
    assert y.shape == (5, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y[4]))


def test_frequency_dropout_stochastic_in_eval():
    """FrequencyModelDropout keeps dropout live in eval
    (reference frequency_based/model.py:62-67)."""
    m = frequency_model_dropout(2, 0.5)
    x = jax.random.normal(jax.random.key(2), (4, 32, 32, 3))
    v = init(m, x)
    y1 = m.apply(v, x, train=False, rngs={"dropout": jax.random.key(10)})
    y2 = m.apply(v, x, train=False, rngs={"dropout": jax.random.key(11)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # plain FrequencyModel is deterministic in eval
    m2 = frequency_model(2)
    v2 = init(m2, x)
    z1 = m2.apply(v2, x, train=False)
    z2 = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


def test_frequency_ensemble_averages_distinct_passes():
    m = FrequencyModelDropoutEnsemble(num_classes=2, dropout=0.5, num_ensemble=3)
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    v = init(m, x)
    y = m.apply(v, x, train=False, rngs={"dropout": jax.random.key(4)})
    assert y.shape == (2, 2)


def test_batchnorm_state_updates_in_train_only():
    m = preact_resnet18(10)
    x = jax.random.normal(jax.random.key(5), (4, 32, 32, 3))
    v = init(m, x)
    _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after))
    out_eval = m.apply(v, x, train=False)
    assert out_eval.shape == (4, 10)


def test_simplevit_shapes():
    m = SimpleViT(image_size=32, patch_size=8, num_classes=10, dim=64, depth=2, heads=2, mlp_dim=128)
    x = jnp.zeros((2, 32, 32, 3))
    v = init(m, x)
    assert m.apply(v, x).shape == (2, 10)


def test_ae_and_netc_mnist():
    ae = AE()
    x = jnp.zeros((1, 32, 32, 3))
    v = init(ae, x)
    y = ae.apply(v, x)
    assert y.shape == (1, 32, 32, 3)
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0
    mn = NetC_MNIST()
    xm = jnp.zeros((2, 28, 28, 1))
    vm = init(mn, xm)
    assert mn.apply(vm, xm).shape == (2, 10)
