"""Post-activation ResNet in Flax (NHWC) — CelebA / ImageNet-10 classifier.

Parity with reference ``classifier_models/resnet.py`` (BasicBlock ``:15-37``,
Bottleneck ``:40-65``, ResNet ``:68-98``): 3x3 stem (no maxpool — this is the
pytorch-cifar variant), 4 stages, AvgPool(4), linear.  The reference's
``input_size2scaler`` lacks a 224 entry so its imagenet10 path KeyErrors
(``:101-106``); here the linear layer is sized from the actual flattened
feature width, which reproduces the 32px/64px geometry exactly and makes
224px work.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import avg_pool, batch_norm, conv, dense, flatten


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = nn.relu(batch_norm(train, name="bn1")(conv(self.planes, stride=self.stride, name="conv1")(x)))
        out = batch_norm(train, name="bn2")(conv(self.planes, name="conv2")(out))
        if self.stride != 1 or in_planes != self.expansion * self.planes:
            sc = conv(self.expansion * self.planes, kernel=1, stride=self.stride, name="shortcut_conv")(x)
            sc = batch_norm(train, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = nn.relu(batch_norm(train, name="bn1")(conv(self.planes, kernel=1, name="conv1")(x)))
        out = nn.relu(batch_norm(train, name="bn2")(conv(self.planes, stride=self.stride, name="conv2")(out)))
        out = batch_norm(train, name="bn3")(conv(self.expansion * self.planes, kernel=1, name="conv3")(out))
        if self.stride != 1 or in_planes != self.expansion * self.planes:
            sc = conv(self.expansion * self.planes, kernel=1, stride=self.stride, name="shortcut_conv")(x)
            sc = batch_norm(train, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    num_blocks: Sequence[int]
    num_classes: int = 10
    bottleneck: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        channel_mask: Optional[jnp.ndarray] = None,
        capture_features: bool = False,
        feature_perturb=None,
    ):
        block_cls = Bottleneck if self.bottleneck else BasicBlock
        out = nn.relu(batch_norm(train, name="bn1")(conv(64, name="conv1")(x)))
        feats = {}
        for stage, (planes, stride) in enumerate(zip((64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            for i in range(self.num_blocks[stage - 1]):
                out = block_cls(planes, stride if i == 0 else 1, name=f"layer{stage}_{i}")(out, train)
            if feature_perturb is not None and f"layer{stage}" in feature_perturb:
                out = out + feature_perturb[f"layer{stage}"]
            feats[f"layer{stage}"] = out
        if channel_mask is not None:
            # fine-pruning hook: equivalent to the reference's channel surgery
            # on layer4 + linear column selection (fine-pruning.py:193-211)
            out = out * channel_mask.astype(out.dtype)
        out = avg_pool(out, 4)
        out = flatten(out)
        logits = dense(self.num_classes, out.shape[-1], name="linear")(out)
        if capture_features:
            return logits, feats
        return logits


def resnet18(num_classes=10, **kw):
    return ResNet([2, 2, 2, 2], num_classes, **kw)


def resnet34(num_classes=10, **kw):
    return ResNet([3, 4, 6, 3], num_classes, **kw)


def resnet50(num_classes=10, **kw):
    return ResNet([3, 4, 6, 3], num_classes, bottleneck=True, **kw)


def resnet101(num_classes=10, **kw):
    return ResNet([3, 4, 23, 3], num_classes, bottleneck=True, **kw)


def resnet152(num_classes=10, **kw):
    return ResNet([3, 8, 36, 3], num_classes, bottleneck=True, **kw)
