"""DenseNet in Flax (NHWC).

Parity with reference ``classifier_models/densenet.py`` (Bottleneck ``:10-22``,
Transition ``:25-34``, DenseNet ``:37-85``).  DenseNet121 is an alternative
frequency-detector backbone (reference ``train_generator.py:41``).
Channel concatenation is along the trailing (C) axis in NHWC.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import avg_pool, batch_norm, conv, dense, flatten


class DenseBottleneck(nn.Module):
    growth_rate: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = conv(4 * self.growth_rate, kernel=1, name="conv1")(nn.relu(batch_norm(train, name="bn1")(x)))
        out = conv(self.growth_rate, name="conv2")(nn.relu(batch_norm(train, name="bn2")(out)))
        return jnp.concatenate([out, x], axis=-1)


class Transition(nn.Module):
    out_planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = conv(self.out_planes, kernel=1, name="conv")(nn.relu(batch_norm(train, name="bn")(x)))
        return avg_pool(out, 2)


class DenseNet(nn.Module):
    nblocks: Sequence[int]
    growth_rate: int = 12
    reduction: float = 0.5
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_planes = 2 * self.growth_rate
        out = conv(num_planes, name="conv1")(x)
        for stage, nblock in enumerate(self.nblocks):
            for i in range(nblock):
                out = DenseBottleneck(self.growth_rate, name=f"dense{stage + 1}_{i}")(out, train)
            num_planes += nblock * self.growth_rate
            if stage < len(self.nblocks) - 1:
                num_planes = int(math.floor(num_planes * self.reduction))
                out = Transition(num_planes, name=f"trans{stage + 1}")(out, train)
        out = avg_pool(nn.relu(batch_norm(train, name="bn")(out)), 4)
        out = flatten(out)
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


def densenet121(num_classes=10):
    return DenseNet([6, 12, 24, 16], growth_rate=32, num_classes=num_classes)


def densenet169(num_classes=10):
    return DenseNet([6, 12, 32, 32], growth_rate=32, num_classes=num_classes)


def densenet201(num_classes=10):
    return DenseNet([6, 12, 48, 32], growth_rate=32, num_classes=num_classes)


def densenet161(num_classes=10):
    return DenseNet([6, 12, 36, 24], growth_rate=48, num_classes=num_classes)


def densenet_cifar(num_classes=10):
    return DenseNet([6, 12, 24, 16], growth_rate=12, num_classes=num_classes)
