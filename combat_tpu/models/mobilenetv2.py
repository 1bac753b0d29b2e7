"""MobileNetV2 (CIFAR variant) in Flax (NHWC).

Parity with reference ``classifier_models/mobilenetv2.py`` — the
pytorch-cifar variant (stride-1 stem, stride pattern 1,1,2,2,1,2,1,
AvgPool(4)).  Depthwise convs use ``feature_group_count``; XLA lowers them to
VPU-friendly per-channel convolutions.
"""

from __future__ import annotations

import flax.linen as nn

from .layers import avg_pool, batch_norm, compute_dtype, conv, dense, flatten, torch_kernel_init

# (expansion, out_planes, num_blocks, stride) — reference mobilenetv2.py:46-54
CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 1),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    out_planes: int
    expansion: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        planes = self.expansion * in_planes
        out = nn.relu(batch_norm(train, name="bn1")(conv(planes, kernel=1, name="conv1")(x)))
        out = nn.Conv(
            planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            feature_group_count=planes,
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=compute_dtype(),
            name="conv2",
        )(out)
        out = nn.relu(batch_norm(train, name="bn2")(out))
        out = batch_norm(train, name="bn3")(conv(self.out_planes, kernel=1, name="conv3")(out))
        if self.stride == 1:
            if in_planes != self.out_planes:
                sc = batch_norm(train, name="shortcut_bn")(
                    conv(self.out_planes, kernel=1, name="shortcut_conv")(x)
                )
            else:
                sc = x
            out = out + sc
        return out


class MobileNetV2(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(conv(32, name="conv1")(x)))
        i = 0
        for expansion, out_planes, num_blocks, stride in CFG:
            for j in range(num_blocks):
                out = InvertedResidual(out_planes, expansion, stride if j == 0 else 1, name=f"block{i}")(out, train)
                i += 1
        out = nn.relu(batch_norm(train, name="bn2")(conv(1280, kernel=1, name="conv2")(out)))
        out = avg_pool(out, 4)
        out = flatten(out)
        return dense(self.num_classes, out.shape[-1], name="linear")(out)
