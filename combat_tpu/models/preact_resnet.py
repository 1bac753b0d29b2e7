"""PreActResNet in Flax (NHWC) — the primary CIFAR-10 classifier.

Architecture parity with reference ``classifier_models/preact_resnet.py``:
PreActBlock (``:13-40``), PreActBottleneck (``:43-69``), stem 3x3 conv,
4 stages [64,128,256,512], AvgPool(4), linear (``PreActResNet:72-102``).

The reference's ``self.ind`` channel-index hack (``:24,36-39``), consumed by
the fine-pruning defense through module surgery, is replaced by the
functional ``channel_mask`` argument: when given, layer4's final block output
channels are masked before the residual add — equivalent to pruning those
channels (see defenses/fine_pruning.py).

``input_size2scaler`` gap fix: the reference maps only {32:1, 64:4} and
KeyErrors for the imagenet10 224px path (``resnet.py:101-106``); here any
input size works — the scaler is derived from the actual pooled feature map.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import avg_pool, batch_norm, conv, dense, flatten, torch_kernel_init


class PreActBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, channel_mask: Optional[jnp.ndarray] = None):
        in_planes = x.shape[-1]
        out = nn.relu(batch_norm(train, name="bn1")(x))
        if self.stride != 1 or in_planes != self.expansion * self.planes:
            shortcut = conv(self.expansion * self.planes, kernel=1, stride=self.stride, name="shortcut")(out)
        else:
            shortcut = x
        out = conv(self.planes, stride=self.stride, name="conv1")(out)
        out = conv(self.planes, name="conv2")(nn.relu(batch_norm(train, name="bn2")(out)))
        if channel_mask is not None:
            out = out * channel_mask.astype(out.dtype)
        return out + shortcut


class PreActBottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, channel_mask: Optional[jnp.ndarray] = None):
        in_planes = x.shape[-1]
        out = nn.relu(batch_norm(train, name="bn1")(x))
        if self.stride != 1 or in_planes != self.expansion * self.planes:
            shortcut = conv(self.expansion * self.planes, kernel=1, stride=self.stride, name="shortcut")(out)
        else:
            shortcut = x
        out = conv(self.planes, kernel=1, name="conv1")(out)
        out = conv(self.planes, stride=self.stride, name="conv2")(nn.relu(batch_norm(train, name="bn2")(out)))
        out = conv(self.expansion * self.planes, kernel=1, name="conv3")(nn.relu(batch_norm(train, name="bn3")(out)))
        if channel_mask is not None:
            out = out * channel_mask.astype(out.dtype)
        return out + shortcut


class PreActResNet(nn.Module):
    num_blocks: Sequence[int]
    num_classes: int = 10
    bottleneck: bool = False
    features: Optional[bool] = None  # when True, also return pre-pool layer3/layer4 activations

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        channel_mask: Optional[jnp.ndarray] = None,
        capture_features: bool = False,
    ):
        block_cls = PreActBottleneck if self.bottleneck else PreActBlock
        out = conv(64, name="conv1")(x)
        feats = {}
        for stage, (planes, stride) in enumerate(zip((64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            for i in range(self.num_blocks[stage - 1]):
                is_last_of_l4 = stage == 4 and i == self.num_blocks[3] - 1
                out = block_cls(planes, stride if i == 0 else 1, name=f"layer{stage}_{i}")(
                    out, train, channel_mask if is_last_of_l4 else None
                )
            feats[f"layer{stage}"] = out
        out = avg_pool(out, 4)
        out = flatten(out)
        fan_in = out.shape[-1]
        logits = dense(self.num_classes, fan_in, name="linear")(out)
        if capture_features:
            return logits, feats
        return logits


def preact_resnet18(num_classes=10, **kw):
    return PreActResNet([2, 2, 2, 2], num_classes, **kw)


def preact_resnet10(num_classes=10, **kw):
    return PreActResNet([1, 1, 1, 1], num_classes, **kw)


def preact_resnet34(num_classes=10, **kw):
    return PreActResNet([3, 4, 6, 3], num_classes, **kw)


def preact_resnet50(num_classes=10, **kw):
    return PreActResNet([3, 4, 6, 3], num_classes, bottleneck=True, **kw)


def preact_resnet101(num_classes=10, **kw):
    return PreActResNet([3, 4, 23, 3], num_classes, bottleneck=True, **kw)


def preact_resnet152(num_classes=10, **kw):
    return PreActResNet([3, 8, 36, 3], num_classes, bottleneck=True, **kw)
