"""PreActResNet in Flax (NHWC) — the primary CIFAR-10 classifier.

Architecture parity with reference ``classifier_models/preact_resnet.py``:
PreActBlock (``:13-40``), PreActBottleneck (``:43-69``), stem 3x3 conv,
4 stages [64,128,256,512], AvgPool(4), linear (``PreActResNet:72-102``).

Defense hooks (functional replacements for the reference's module surgery):
  * ``channel_mask`` — multiplies the layer4 output channels.  Exactly
    equivalent to the fine-pruning defense's rebuild of ``layer4[1].conv2`` +
    shortcut ``ind`` indexing + linear column selection (reference
    ``defenses/fine_pruning/fine-pruning.py:167-214``): dropping channel c
    from the block output and from the linear input is the same computation
    as zeroing that channel before pooling with the full linear.
  * ``capture_features`` / ``feature_perturb`` — return per-stage activations
    and optionally add a (zero) perturbation to a stage output so
    ``jax.grad`` w.r.t. it yields the Grad-CAM feature gradients
    (reference ``defenses/gradcam/gradcam.py:97-145`` uses backward hooks).
  * ``act`` — activation override so Guided Backprop can substitute its
    custom-VJP ReLU (reference ``gradcam.py:201-271``).

``input_size2scaler`` gap fix: the reference maps only {32:1, 64:4} and
KeyErrors for the imagenet10 224px path (``resnet.py:101-106``); here the
linear layer is sized from the actual pooled feature map, so any input size
works.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import avg_pool, batch_norm, conv, dense, flatten


class PreActBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = self.act(batch_norm(train, name="bn1")(x))
        if self.stride != 1 or in_planes != self.expansion * self.planes:
            shortcut = conv(self.expansion * self.planes, kernel=1, stride=self.stride, name="shortcut")(out)
        else:
            shortcut = x
        out = conv(self.planes, stride=self.stride, name="conv1")(out)
        out = conv(self.planes, name="conv2")(self.act(batch_norm(train, name="bn2")(out)))
        return out + shortcut


class PreActBottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = self.act(batch_norm(train, name="bn1")(x))
        if self.stride != 1 or in_planes != self.expansion * self.planes:
            shortcut = conv(self.expansion * self.planes, kernel=1, stride=self.stride, name="shortcut")(out)
        else:
            shortcut = x
        out = conv(self.planes, kernel=1, name="conv1")(out)
        out = conv(self.planes, stride=self.stride, name="conv2")(self.act(batch_norm(train, name="bn2")(out)))
        out = conv(self.expansion * self.planes, kernel=1, name="conv3")(self.act(batch_norm(train, name="bn3")(out)))
        return out + shortcut


class PreActResNet(nn.Module):
    num_blocks: Sequence[int]
    num_classes: int = 10
    bottleneck: bool = False
    act: Callable = nn.relu

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        channel_mask: Optional[jnp.ndarray] = None,
        capture_features: bool = False,
        feature_perturb: Optional[Dict[str, Any]] = None,
    ):
        block_cls = PreActBottleneck if self.bottleneck else PreActBlock
        out = conv(64, name="conv1")(x)
        feats = {}
        for stage, (planes, stride) in enumerate(zip((64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            for i in range(self.num_blocks[stage - 1]):
                out = block_cls(planes, stride if i == 0 else 1, act=self.act, name=f"layer{stage}_{i}")(out, train)
            if feature_perturb is not None and f"layer{stage}" in feature_perturb:
                out = out + feature_perturb[f"layer{stage}"]
            feats[f"layer{stage}"] = out
        if channel_mask is not None:
            out = out * channel_mask.astype(out.dtype)
        out = avg_pool(out, 4)
        out = flatten(out)
        logits = dense(self.num_classes, out.shape[-1], name="linear")(out)
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
