"""Legacy / auxiliary models from the reference zoo (NHWC Flax).

Parity targets in reference ``networks/models.py`` and ``networks/blocks.py``:
AE autoencoder (``models.py:89-152``), NetC_GTRSB (``:635-660``),
NetC_MNIST (``:712-738``), NetC_MNIST2/3 (``:765-834``),
NetC_CelebA (``:870-902``), plus the ``Normalize``/``Denormalize`` ±0.5
channel maps (``:15-86``) which reduce to simple affine functions here.
These are latent paths in the reference (kept for experiment parity).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import batch_norm, dense, flatten, max_pool2, torch_bias_init, torch_kernel_init


def normalize_pm05(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize([0.5]*c, [0.5]*c): [0,1] → [-1,1] (reference models.py:15-26)."""
    return (x - 0.5) / 0.5


def denormalize_pm05(x: jnp.ndarray) -> jnp.ndarray:
    """Denormalize([0.5]*c, [0.5]*c): [-1,1] → [0,1] (reference models.py:29-40)."""
    return x * 0.5 + 0.5


def _conv(features, kernel=3, stride=1, padding=1, name=None, fan_in=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in) if fan_in else nn.initializers.zeros_init(),
        name=name,
    )


class Conv2dBlock(nn.Module):
    """conv-BN(momentum .05)-ReLU (reference networks/blocks.py:4-16)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bn: bool = True
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        fan_in = self.kernel * self.kernel * x.shape[-1]
        x = _conv(self.features, self.kernel, self.stride, self.padding, "conv", fan_in)(x)
        if self.use_bn:
            # torch momentum 0.05 ⇔ flax momentum 0.95
            x = nn.BatchNorm(use_running_average=not train, momentum=0.95, epsilon=1e-5, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class Encoder(nn.Module):
    """3× (conv k4 s2 p1 + BN + ReLU) — reference models.py:90-100."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate((12, 24, 48)):
            x = Conv2dBlock(c, kernel=4, stride=2, name=f"down{i + 1}")(x, train)
        return x


class Decoder(nn.Module):
    """3× (convT k4 s2 + BN [+ ReLU]) + sigmoid — reference models.py:103-114."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (c, relu) in enumerate(((24, True), (12, True), (3, False))):
            x = nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME", kernel_init=torch_kernel_init, name=f"up{i + 1}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.95, epsilon=1e-5, name=f"up{i + 1}_bn")(x)
            if relu:
                x = nn.relu(x)
        return nn.sigmoid(x)


class AE(nn.Module):
    """Autoencoder emitting normalized [-1,1] output (reference models.py:117-152)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Encoder(name="encoder")(x, train)
        x = Decoder(name="decoder")(x, train)
        return normalize_pm05(x)


class NetC_GTRSB(nn.Module):
    """GTSRB classifier (reference models.py:635-660); dropout p=0.3."""

    num_classes: int = 43

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate((32, 32)):
            x = Conv2dBlock(c, name=f"block{i + 1}")(x, train)
        x = nn.Dropout(0.3, deterministic=not train)(max_pool2(x))
        for i, c in enumerate((64, 64)):
            x = Conv2dBlock(c, name=f"block{i + 3}")(x, train)
        x = nn.Dropout(0.3, deterministic=not train)(max_pool2(x))
        for i, c in enumerate((128, 128)):
            x = Conv2dBlock(c, name=f"block{i + 5}")(x, train)
        x = nn.Dropout(0.3, deterministic=not train)(max_pool2(x))
        x = flatten(x)
        x = nn.relu(dense(512, x.shape[-1], name="linear1")(x))
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return dense(self.num_classes, 512, name="linear11")(x)


class NetC_MNIST(nn.Module):
    """MNIST classifier (reference models.py:712-738)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(32, 5, 1, 0, "conv1", 5 * 5 * x.shape[-1])(x)  # 28→24
        x = nn.Dropout(0.3, deterministic=not train)(nn.relu(x))
        x = _conv(32, 3, 2, 1, "conv2", 3 * 3 * 32)(x)  # →12
        x = nn.Dropout(0.3, deterministic=not train)(nn.relu(x))
        x = _conv(64, 5, 1, 0, "conv3", 5 * 5 * 32)(x)  # →8
        x = nn.Dropout(0.3, deterministic=not train)(nn.relu(x))
        x = _conv(64, 3, 2, 1, "conv4", 3 * 3 * 64)(x)  # →4
        x = nn.Dropout(0.3, deterministic=not train)(nn.relu(x))
        x = flatten(x)
        x = nn.relu(dense(512, x.shape[-1], name="linear6")(x))
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return dense(self.num_classes, 512, name="linear9")(x)


class MNISTBlock(nn.Module):
    """BN→ReLU→conv residual block (reference models.py:741-762)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x))
        if self.stride != 1 or in_planes != self.planes:
            fan = 1 * in_planes
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                         kernel_init=torch_kernel_init, name="shortcut")(out)
        else:
            sc = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False,
                      kernel_init=torch_kernel_init, name="conv1")(out)
        return out + sc


class NetC_MNIST2(nn.Module):
    """reference models.py:765-785."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(_conv(32, 3, 1, 1, "conv1", 9 * x.shape[-1])(x))
        x = MNISTBlock(64, 2, name="layer2")(x, train)
        x = MNISTBlock(64, 2, name="layer3")(x, train)
        x = MNISTBlock(64, 2, name="layer4")(x, train)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = flatten(x)
        x = nn.relu(dense(512, x.shape[-1], name="linear6")(x))
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return dense(self.num_classes, 512, name="linear9")(x)


class MNISTBlock3(nn.Module):
    """Shortcut-less variant (reference models.py:788-811)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x))
        return nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False,
                       kernel_init=torch_kernel_init, name="conv1")(out)


class NetC_MNIST3(nn.Module):
    """reference models.py:814-834 (used by the neural-cleanse mnist path)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(_conv(32, 3, 2, 1, "conv1", 9 * x.shape[-1])(x))
        x = MNISTBlock3(64, 2, name="layer2")(x, train)
        x = MNISTBlock3(64, 2, name="layer3")(x, train)
        x = flatten(x)
        x = nn.relu(dense(512, x.shape[-1], name="linear6")(x))
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return dense(self.num_classes, 512, name="linear9")(x)


class NetC_CelebA(nn.Module):
    """Small CelebA CNN (reference models.py:870-902)."""

    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate((32, 64, 64)):
            fan_in = 3 * 3 * x.shape[-1]
            x = _conv(c, 3, 1, 1, f"conv{i + 1}", fan_in)(x)
            x = nn.relu(batch_norm(train, name=f"bn{i + 1}")(x))
            x = nn.Dropout(0.3, deterministic=not train)(x)
            x = max_pool2(x)
        x = flatten(x)
        x = dense(128, x.shape[-1], name="linear12")(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return dense(self.num_classes, 128, name="linear13")(x)
