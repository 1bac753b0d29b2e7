"""Extended classifier zoo (NHWC Flax) — the reference's latent
pytorch-cifar experiment models (SURVEY.md §2.2: ``classifier_models/
{mobilenet,efficientnet,googlenet,dpn,senet,shufflenet,shufflenetv2,resnext,
pnasnet,lenet}.py``, ~1k LoC, unused by default but part of the surface).

Architectural parity per the corresponding reference file; fixed upstream
quirks are noted inline (e.g. shufflenet's float ``mid_planes`` division).
Most of these are hard-coded 10-class in the reference; ``num_classes`` is a
proper argument here.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .layers import avg_pool, batch_norm, conv, dense, flatten, max_pool2, torch_bias_init, torch_kernel_init


def _convb(features, kernel=3, stride=1, padding=None, groups=1, name=None):
    if padding is None:
        padding = (kernel - 1) // 2
    from .layers import compute_dtype

    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding=padding,
        feature_group_count=groups, use_bias=False, kernel_init=torch_kernel_init,
        dtype=compute_dtype(), name=name,
    )


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    return x.reshape(n, h, w, groups, c // groups).transpose(0, 1, 2, 4, 3).reshape(n, h, w, c)


# ---------------------------------------------------------------- LeNet


class LeNet(nn.Module):
    """reference lenet.py:7-25 (5x5 valid convs, 2x maxpool, 3 FC)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(feat, cin):
            return nn.Conv(feat, (5, 5), padding="VALID", kernel_init=torch_kernel_init,
                           bias_init=torch_bias_init(25 * cin))

        x = max_pool2(nn.relu(c(6, x.shape[-1])(x)))
        x = max_pool2(nn.relu(c(16, 6)(x)))
        x = flatten(x)
        x = nn.relu(dense(120, x.shape[-1], name="fc1")(x))
        x = nn.relu(dense(84, 120, name="fc2")(x))
        return dense(self.num_classes, 84, name="fc3")(x)


# ---------------------------------------------------------------- MobileNet v1


class MobileNetV1(nn.Module):
    """reference mobilenet.py (depthwise+pointwise blocks, avgpool 2)."""

    num_classes: int = 10
    cfg: Tuple = (64, (128, 2), 128, (256, 2), 256, (512, 2), 512, 512, 512, 512, 512, (1024, 2), 1024)

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(_convb(32, name="conv1")(x)))
        for i, item in enumerate(self.cfg):
            planes, stride = (item, 1) if isinstance(item, int) else item
            cin = out.shape[-1]
            out = nn.relu(batch_norm(train, name=f"b{i}_bn1")(_convb(cin, 3, stride, groups=cin, name=f"b{i}_dw")(out)))
            out = nn.relu(batch_norm(train, name=f"b{i}_bn2")(_convb(planes, 1, name=f"b{i}_pw")(out)))
        out = flatten(avg_pool(out, 2))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


# ---------------------------------------------------------------- EfficientNetB0


def _swish(x):
    return x * nn.sigmoid(x)


class MBConv(nn.Module):
    """reference efficientnet.py Block:16-72 (expand/dw/SE/project, swish)."""

    out_planes: int
    kernel: int
    stride: int
    expansion: int
    se_ratio: float = 0.25
    drop_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        planes = self.expansion * in_planes
        out = _swish(batch_norm(train, name="bn1")(_convb(planes, 1, name="conv1")(x)))
        out = _swish(batch_norm(train, name="bn2")(
            _convb(planes, self.kernel, self.stride, groups=planes, name="conv2")(out)))
        se_planes = max(1, int(planes * self.se_ratio))
        w = out.mean(axis=(1, 2), keepdims=True)
        w = _swish(nn.Conv(se_planes, (1, 1), kernel_init=torch_kernel_init,
                           bias_init=torch_bias_init(planes), name="se1")(w))
        w = nn.sigmoid(nn.Conv(planes, (1, 1), kernel_init=torch_kernel_init,
                               bias_init=torch_bias_init(se_planes), name="se2")(w))
        out = out * w
        out = batch_norm(train, name="bn3")(_convb(self.out_planes, 1, name="conv3")(out))
        out = nn.Dropout(self.drop_rate, deterministic=not train, broadcast_dims=(1, 2))(out)
        if self.stride == 1:
            if in_planes != self.out_planes:
                sc = batch_norm(train, name="shortcut_bn")(_convb(self.out_planes, 1, name="shortcut")(x))
            else:
                sc = x
            out = out + sc
        return out


class EfficientNetB0(nn.Module):
    num_classes: int = 10
    # (expansion, out_planes, num_blocks, kernel_size, stride) — efficientnet.py:103-114
    cfg: Tuple = ((1, 16, 1, 3, 1), (6, 24, 2, 3, 2), (6, 40, 2, 5, 2), (6, 80, 3, 3, 2),
                  (6, 112, 3, 5, 1), (6, 192, 4, 5, 2), (6, 320, 1, 3, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _swish(batch_norm(train, name="bn1")(_convb(32, name="conv1")(x)))
        i = 0
        for expansion, planes, nblocks, kernel, stride in self.cfg:
            for j in range(nblocks):
                out = MBConv(planes, kernel, stride if j == 0 else 1, expansion, name=f"block{i}")(out, train)
                i += 1
        out = out.mean(axis=(1, 2))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


# ---------------------------------------------------------------- GoogLeNet


class Inception(nn.Module):
    """reference googlenet.py:7-55 (5x5 branch = two 3x3s)."""

    n1x1: int
    n3x3red: int
    n3x3: int
    n5x5red: int
    n5x5: int
    pool_planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(t, feat, kernel, name):
            fan = kernel * kernel * t.shape[-1]
            t = nn.Conv(feat, (kernel, kernel), padding=(kernel - 1) // 2,
                        kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan), name=name)(t)
            return nn.relu(batch_norm(train, name=name + "_bn")(t))

        y1 = cbr(x, self.n1x1, 1, "b1")
        y2 = cbr(cbr(x, self.n3x3red, 1, "b2a"), self.n3x3, 3, "b2b")
        y3 = cbr(cbr(cbr(x, self.n5x5red, 1, "b3a"), self.n5x5, 3, "b3b"), self.n5x5, 3, "b3c")
        y4 = cbr(nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1))), self.pool_planes, 1, "b4")
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class GoogLeNet(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="pre_bn")(
            nn.Conv(192, (3, 3), padding=1, kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(9 * x.shape[-1]), name="pre")(x)))
        out = Inception(64, 96, 128, 16, 32, 32, name="a3")(out, train)
        out = Inception(128, 128, 192, 32, 96, 64, name="b3")(out, train)
        out = nn.max_pool(out, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        out = Inception(192, 96, 208, 16, 48, 64, name="a4")(out, train)
        out = Inception(160, 112, 224, 24, 64, 64, name="b4")(out, train)
        out = Inception(128, 128, 256, 24, 64, 64, name="c4")(out, train)
        out = Inception(112, 144, 288, 32, 64, 64, name="d4")(out, train)
        out = Inception(256, 160, 320, 32, 128, 128, name="e4")(out, train)
        out = nn.max_pool(out, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        out = Inception(256, 160, 320, 32, 128, 128, name="a5")(out, train)
        out = Inception(384, 192, 384, 48, 128, 128, name="b5")(out, train)
        out = flatten(avg_pool(out, 8))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


# ---------------------------------------------------------------- DPN


class DPNBottleneck(nn.Module):
    """reference dpn.py:8-37 (residual + dense-path concat, 32-group conv)."""

    in_planes: int
    out_planes: int
    dense_depth: int
    stride: int
    first_layer: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(_convb(self.in_planes, 1, name="conv1")(x)))
        out = nn.relu(batch_norm(train, name="bn2")(
            _convb(self.in_planes, 3, self.stride, groups=32, name="conv2")(out)))
        out = batch_norm(train, name="bn3")(_convb(self.out_planes + self.dense_depth, 1, name="conv3")(out))
        if self.first_layer:
            sc = batch_norm(train, name="shortcut_bn")(
                _convb(self.out_planes + self.dense_depth, 1, self.stride, name="shortcut")(x))
        else:
            sc = x
        d = self.out_planes
        return nn.relu(jnp.concatenate([sc[..., :d] + out[..., :d], sc[..., d:], out[..., d:]], axis=-1))


class DPN(nn.Module):
    num_classes: int = 10
    in_planes: Tuple = (96, 192, 384, 768)
    out_planes: Tuple = (256, 512, 1024, 2048)
    num_blocks: Tuple = (2, 2, 2, 2)
    dense_depth: Tuple = (16, 32, 24, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(_convb(64, name="conv1")(x)))
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for i in range(self.num_blocks[stage]):
                out = DPNBottleneck(
                    self.in_planes[stage], self.out_planes[stage], self.dense_depth[stage],
                    stride if i == 0 else 1, first_layer=(i == 0), name=f"s{stage}_{i}",
                )(out, train)
        out = flatten(avg_pool(out, 4))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


def dpn26(num_classes=10):
    return DPN(num_classes)


def dpn92(num_classes=10):
    return DPN(num_classes, num_blocks=(3, 4, 20, 3))


# ---------------------------------------------------------------- SENet


class SEPreActBlock(nn.Module):
    """reference senet.py PreActBlock:46-76."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = nn.relu(batch_norm(train, name="bn1")(x))
        if self.stride != 1 or in_planes != self.planes:
            sc = _convb(self.planes, 1, self.stride, name="shortcut")(out)
        else:
            sc = x
        out = _convb(self.planes, 3, self.stride, name="conv1")(out)
        out = _convb(self.planes, 3, name="conv2")(nn.relu(batch_norm(train, name="bn2")(out)))
        w = out.mean(axis=(1, 2), keepdims=True)
        w = nn.relu(nn.Conv(self.planes // 16, (1, 1), kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(self.planes), name="fc1")(w))
        w = nn.sigmoid(nn.Conv(self.planes, (1, 1), kernel_init=torch_kernel_init,
                               bias_init=torch_bias_init(self.planes // 16), name="fc2")(w))
        return out * w + sc


class SENet18(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(_convb(64, name="conv1")(x)))
        for stage, (planes, stride) in enumerate(zip((64, 128, 256, 512), (1, 2, 2, 2)), 1):
            for i in range(2):
                out = SEPreActBlock(planes, stride if i == 0 else 1, name=f"layer{stage}_{i}")(out, train)
        out = flatten(avg_pool(out, 4))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


# ---------------------------------------------------------------- ResNeXt


class ResNeXtBlock(nn.Module):
    cardinality: int
    bottleneck_width: int
    stride: int = 1
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        gw = self.cardinality * self.bottleneck_width
        in_planes = x.shape[-1]
        out = nn.relu(batch_norm(train, name="bn1")(_convb(gw, 1, name="conv1")(x)))
        out = nn.relu(batch_norm(train, name="bn2")(
            _convb(gw, 3, self.stride, groups=self.cardinality, name="conv2")(out)))
        out = batch_norm(train, name="bn3")(_convb(self.expansion * gw, 1, name="conv3")(out))
        if self.stride != 1 or in_planes != self.expansion * gw:
            sc = batch_norm(train, name="shortcut_bn")(_convb(self.expansion * gw, 1, self.stride, name="shortcut")(x))
        else:
            sc = x
        return nn.relu(out + sc)


class ResNeXt29(nn.Module):
    """reference resnext.py:44-79 — 3 stages, width doubles per stage."""

    num_classes: int = 10
    cardinality: int = 2
    bottleneck_width: int = 64
    num_blocks: Tuple = (3, 3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(_convb(64, 1, name="conv1")(x)))
        width = self.bottleneck_width
        for stage, nb in enumerate(self.num_blocks):
            stride = 1 if stage == 0 else 2
            for i in range(nb):
                out = ResNeXtBlock(self.cardinality, width, stride if i == 0 else 1,
                                   name=f"layer{stage + 1}_{i}")(out, train)
            width *= 2
        out = flatten(avg_pool(out, 8))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


def resnext29_2x64d(num_classes=10):
    return ResNeXt29(num_classes, cardinality=2, bottleneck_width=64)


def resnext29_32x4d(num_classes=10):
    return ResNeXt29(num_classes, cardinality=32, bottleneck_width=4)


# ---------------------------------------------------------------- ShuffleNet (v1)


class ShuffleBottleneck(nn.Module):
    """reference shufflenet.py:23-52 (fixed: integer mid_planes — the
    reference's float division crashes modern torch)."""

    out_planes: int
    stride: int
    groups: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        mid = self.out_planes // 4
        g = 1 if in_planes == 24 else self.groups
        out = nn.relu(batch_norm(train, name="bn1")(_convb(mid, 1, groups=g, name="conv1")(x)))
        out = channel_shuffle(out, g)
        out = nn.relu(batch_norm(train, name="bn2")(_convb(mid, 3, self.stride, groups=mid, name="conv2")(out)))
        out = batch_norm(train, name="bn3")(_convb(self.out_planes, 1, groups=self.groups, name="conv3")(out))
        if self.stride == 2:
            res = nn.avg_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
            return nn.relu(jnp.concatenate([out, res], axis=-1))
        return nn.relu(out + x)


class ShuffleNetG2(nn.Module):
    num_classes: int = 10
    out_planes: Tuple = (200, 400, 800)
    num_blocks: Tuple = (4, 8, 4)
    groups: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(_convb(24, 1, name="conv1")(x)))
        in_planes = 24
        for stage in range(3):
            for i in range(self.num_blocks[stage]):
                cat_planes = in_planes if i == 0 else 0
                out = ShuffleBottleneck(self.out_planes[stage] - cat_planes, 2 if i == 0 else 1,
                                        self.groups, name=f"s{stage}_{i}")(out, train)
                in_planes = self.out_planes[stage]
        out = flatten(avg_pool(out, 4))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


# ---------------------------------------------------------------- ShuffleNetV2


class ShuffleV2Basic(nn.Module):
    """reference shufflenetv2.py:33-56 (split, 1x1-dw-1x1 on one half, shuffle)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        out = nn.relu(batch_norm(train, name="bn1")(_convb(c, 1, name="conv1")(x2)))
        out = batch_norm(train, name="bn2")(_convb(c, 3, groups=c, name="conv2")(out))
        out = nn.relu(batch_norm(train, name="bn3")(_convb(c, 1, name="conv3")(out)))
        return channel_shuffle(jnp.concatenate([x1, out], axis=-1), 2)


class ShuffleV2Down(nn.Module):
    """reference shufflenetv2.py:58-93."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        mid = self.out_channels // 2
        left = batch_norm(train, name="bn1")(_convb(c_in, 3, 2, groups=c_in, name="conv1")(x))
        left = nn.relu(batch_norm(train, name="bn2")(_convb(mid, 1, name="conv2")(left)))
        right = nn.relu(batch_norm(train, name="bn3")(_convb(mid, 1, name="conv3")(x)))
        right = batch_norm(train, name="bn4")(_convb(mid, 3, 2, groups=mid, name="conv4")(right))
        right = nn.relu(batch_norm(train, name="bn5")(_convb(mid, 1, name="conv5")(right)))
        return channel_shuffle(jnp.concatenate([left, right], axis=-1), 2)


class ShuffleNetV2(nn.Module):
    num_classes: int = 10
    out_channels: Tuple = (116, 232, 464, 1024)  # net_size=1
    num_blocks: Tuple = (3, 7, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, name="bn1")(_convb(24, name="conv1")(x)))
        for stage in range(3):
            out = ShuffleV2Down(self.out_channels[stage], name=f"down{stage}")(out, train)
            for i in range(self.num_blocks[stage]):
                out = ShuffleV2Basic(name=f"s{stage}_{i}")(out, train)
        out = nn.relu(batch_norm(train, name="bn2")(_convb(self.out_channels[3], 1, name="conv2")(out)))
        out = flatten(avg_pool(out, 4))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


# ---------------------------------------------------------------- PNASNet


class SepConv(nn.Module):
    """reference pnasnet.py:11-22 — grouped conv (groups=in) + BN."""

    out_planes: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _convb(self.out_planes, self.kernel, self.stride, groups=x.shape[-1], name="conv1")(x)
        return batch_norm(train, name="bn1")(out)


class CellA(nn.Module):
    out_planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = SepConv(self.out_planes, 7, self.stride, name="sep1")(x, train)
        y2 = nn.max_pool(x, (3, 3), (self.stride, self.stride), padding=((1, 1), (1, 1)))
        if self.stride == 2:
            y2 = batch_norm(train, name="bn1")(_convb(self.out_planes, 1, name="conv1")(y2))
        return nn.relu(y1 + y2)


class CellB(nn.Module):
    out_planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = SepConv(self.out_planes, 7, self.stride, name="sep1")(x, train)
        y2 = SepConv(self.out_planes, 3, self.stride, name="sep2")(x, train)
        y3 = nn.max_pool(x, (3, 3), (self.stride, self.stride), padding=((1, 1), (1, 1)))
        if self.stride == 2:
            y3 = batch_norm(train, name="bn1")(_convb(self.out_planes, 1, name="conv1")(y3))
        y4 = SepConv(self.out_planes, 5, self.stride, name="sep3")(x, train)
        b = jnp.concatenate([nn.relu(y1 + y2), nn.relu(y3 + y4)], axis=-1)
        return nn.relu(batch_norm(train, name="bn2")(_convb(self.out_planes, 1, name="conv2")(b)))


class PNASNet(nn.Module):
    num_classes: int = 10
    cell: str = "A"  # A or B
    num_planes: int = 44

    @nn.compact
    def __call__(self, x, train: bool = False):
        cell_cls = CellA if self.cell == "A" else CellB
        p = self.num_planes
        out = nn.relu(batch_norm(train, name="bn1")(_convb(p, name="conv1")(x)))
        idx = 0
        for planes, cells in ((p, 6), (p * 2, 1), (p * 2, 6), (p * 4, 1), (p * 4, 6)):
            stride = 2 if cells == 1 else 1
            for _ in range(cells):
                out = cell_cls(planes, stride, name=f"cell{idx}")(out, train)
                idx += 1
        out = flatten(avg_pool(out, 8))
        return dense(self.num_classes, out.shape[-1], name="linear")(out)


def pnasnet_a(num_classes=10):
    return PNASNet(num_classes, cell="A", num_planes=44)


def pnasnet_b(num_classes=10):
    return PNASNet(num_classes, cell="B", num_planes=32)
