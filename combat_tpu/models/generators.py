"""Trigger-generator zoo in Flax (NHWC).

Parity with reference ``networks/models.py``:
  * :class:`UnetGenerator` (``:268-341``) — 4-stage stride-2 conv encoder
    (nf=64→512, InstanceNorm, LeakyReLU 0.2) + bilinear-upsample decoder with
    **additive** skip connections, tanh output.  The ``nn.Dropout(p=0.3)``
    defined at ``:315`` is never used in the reference forward pass and is
    omitted here.
  * :class:`UnetGeneratorBK` (``:194-265``) — same trunk, but emits
    ``clamp(tanh(·)*0.08 + x, -1, 1)`` directly.
  * :class:`GridGenerator` (``:344-385``) — UNet encoder + GAP + 2-layer MLP
    → (B, s, s, 2) tanh flow field (WaNet trigger).
  * :class:`MixedGenerator` (``:388-469``) — returns (flow, noise).
  * :class:`CUnetGenerator` (``CUnetGeneratorv1``, ``:472-555``) — UNet with a
    one-hot label map concatenated after conv0_0 (class-conditional trigger).
  * :class:`FixedTriggerGenerator` (``:620-627``) — learnable constant trigger.

Outputs follow the NHWC layout; the GridGenerator flow field is (B, s, s, 2)
(reference emits (B, 2, s, s) NCHW).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image import upsample2x_bilinear
from .layers import InstanceNorm, compute_dtype, dense, torch_bias_init, torch_kernel_init


def _conv(features: int, stride: int = 1, name=None):
    """3x3 conv with bias (use_bias=True throughout the reference UNets)."""

    def make(in_features: int):
        return nn.Conv(
            features,
            (3, 3),
            strides=(stride, stride),
            padding=1,
            use_bias=True,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(3 * 3 * in_features),
            dtype=compute_dtype(),
            name=name,
        )

    return make


def _act(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class UnetEncoder(nn.Module):
    """Shared encoder trunk: conv{0..3}_{0,1} + InstanceNorms."""

    nf: int = 64

    @nn.compact
    def __call__(self, x):
        nf = self.nf
        f0 = _conv(nf, 2, "conv0_0")(x.shape[-1])(x)
        f0 = InstanceNorm(name="bn0_1")(_conv(nf, 1, "conv0_1")(nf)(_act(f0)))
        f1 = InstanceNorm(name="bn1_0")(_conv(nf * 2, 2, "conv1_0")(nf)(_act(f0)))
        f1 = InstanceNorm(name="bn1_1")(_conv(nf * 2, 1, "conv1_1")(nf * 2)(_act(f1)))
        f2 = InstanceNorm(name="bn2_0")(_conv(nf * 4, 2, "conv2_0")(nf * 2)(_act(f1)))
        f2 = InstanceNorm(name="bn2_1")(_conv(nf * 4, 1, "conv2_1")(nf * 4)(_act(f2)))
        f3 = InstanceNorm(name="bn3_0")(_conv(nf * 8, 2, "conv3_0")(nf * 4)(_act(f2)))
        f3 = InstanceNorm(name="bn3_1")(_conv(nf * 8, 1, "conv3_1")(nf * 8)(_act(f3)))
        return f0, f1, f2, f3


class UnetDecoder(nn.Module):
    """Decoder: bilinear 2x upsample + conv pairs, additive skips, tanh."""

    nf: int = 64
    out_channels: int = 3

    @nn.compact
    def __call__(self, f0, f1, f2, f3):
        nf = self.nf
        u3 = InstanceNorm(name="upbn3_1")(_conv(nf * 8, 1, "upconv3_1")(nf * 8)(_act(upsample2x_bilinear(f3))))
        u3 = InstanceNorm(name="upbn3_0")(_conv(nf * 4, 1, "upconv3_0")(nf * 8)(_act(u3))) + f2
        u2 = InstanceNorm(name="upbn2_1")(_conv(nf * 4, 1, "upconv2_1")(nf * 4)(_act(upsample2x_bilinear(u3))))
        u2 = InstanceNorm(name="upbn2_0")(_conv(nf * 2, 1, "upconv2_0")(nf * 4)(_act(u2))) + f1
        u1 = InstanceNorm(name="upbn1_1")(_conv(nf * 2, 1, "upconv1_1")(nf * 2)(_act(upsample2x_bilinear(u2))))
        u1 = InstanceNorm(name="upbn1_0")(_conv(nf, 1, "upconv1_0")(nf * 2)(_act(u1))) + f0
        u0 = InstanceNorm(name="upbn0_1")(_conv(nf, 1, "upconv0_1")(nf)(_act(upsample2x_bilinear(u1))))
        return jnp.tanh(_conv(self.out_channels, 1, "upconv0_0")(nf)(_act(u0)))


class UnetGenerator(nn.Module):
    nf: int = 64
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        f0, f1, f2, f3 = UnetEncoder(self.nf, name="enc")(x)
        return UnetDecoder(self.nf, self.out_channels, name="dec")(f0, f1, f2, f3)


class UnetGeneratorBK(nn.Module):
    """Variant emitting the triggered image directly:
    ``clamp(tanh(·) * 0.08 + x, -1, 1)`` (reference ``models.py:264``)."""

    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        f0, f1, f2, f3 = UnetEncoder(self.nf, name="enc")(x)
        noise = UnetDecoder(self.nf, x.shape[-1], name="dec")(f0, f1, f2, f3)
        return jnp.clip(noise * 0.08 + x, -1.0, 1.0)


class GridGenerator(nn.Module):
    """WaNet flow-field generator → (B, s, s, 2) in [-1, 1]."""

    s: int = 2
    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        _, _, _, f3 = UnetEncoder(nf, name="enc")(x)
        f = jnp.mean(f3, axis=(1, 2))  # adaptive_avg_pool2d(·, 1)
        f = dense(nf, nf * 8, name="fc1")(f)
        f = dense(self.s * self.s * 2, nf, name="fc2")(_act(f))
        # Reference reshapes to (B, 2, s, s) NCHW; our convention is NHWC.
        f = f.reshape((-1, 2, self.s, self.s)).transpose(0, 2, 3, 1)
        return jnp.tanh(f)


class MixedGenerator(nn.Module):
    """Returns (flow (B,s,s,2), noise (B,H,W,C)) — reference ``models.py:388-469``."""

    s: int = 2
    nf: int = 64
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        nf = self.nf
        f0, f1, f2, f3 = UnetEncoder(nf, name="enc")(x)
        noise = UnetDecoder(nf, self.out_channels, name="dec")(f0, f1, f2, f3)
        f = jnp.mean(f3, axis=(1, 2))
        f = dense(nf, nf * 8, name="fc1")(f)
        f = dense(self.s * self.s * 2, nf, name="fc2")(_act(f))
        f = f.reshape((-1, 2, self.s, self.s)).transpose(0, 2, 3, 1)
        return jnp.tanh(f), noise


class CUnetGenerator(nn.Module):
    """Class-conditional UNet (reference ``CUnetGeneratorv1``): a one-hot
    label map is concatenated to the conv0_0 features (``models.py:523-530``)."""

    num_classes: int = 10
    nf: int = 64
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        nf = self.nf
        f0 = _conv(nf, 2, "conv0_0")(x.shape[-1])(x)
        y_map = jax.nn.one_hot(y, self.num_classes, dtype=f0.dtype)[:, None, None, :]
        y_map = jnp.broadcast_to(y_map, (f0.shape[0], f0.shape[1], f0.shape[2], self.num_classes))
        f0 = jnp.concatenate([f0, y_map], axis=-1)
        f0 = InstanceNorm(name="bn0_1")(_conv(nf, 1, "conv0_1")(nf + self.num_classes)(_act(f0)))
        f1 = InstanceNorm(name="bn1_0")(_conv(nf * 2, 2, "conv1_0")(nf)(_act(f0)))
        f1 = InstanceNorm(name="bn1_1")(_conv(nf * 2, 1, "conv1_1")(nf * 2)(_act(f1)))
        f2 = InstanceNorm(name="bn2_0")(_conv(nf * 4, 2, "conv2_0")(nf * 2)(_act(f1)))
        f2 = InstanceNorm(name="bn2_1")(_conv(nf * 4, 1, "conv2_1")(nf * 4)(_act(f2)))
        f3 = InstanceNorm(name="bn3_0")(_conv(nf * 8, 2, "conv3_0")(nf * 4)(_act(f2)))
        f3 = InstanceNorm(name="bn3_1")(_conv(nf * 8, 1, "conv3_1")(nf * 8)(_act(f3)))
        return UnetDecoder(nf, self.out_channels, name="dec")(f0, f1, f2, f3)


class FixedTriggerGenerator(nn.Module):
    """Learnable constant trigger, init U(-1, 1) (reference ``models.py:620-627``)."""

    height: int = 32
    width: int = 32
    channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        trigger = self.param(
            "trigger",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1.0, maxval=1.0),
            (self.height, self.width, self.channels),
        )
        return jnp.broadcast_to(trigger[None], (x.shape[0],) + trigger.shape)
