"""Model registry: name → Flax module, mirroring the reference's per-script
``get_model`` / ``C_MAPPING_NAMES`` / ``F_MAPPING_NAMES`` tables
(reference ``train_generator.py:27-44,80-128``)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..config import Config
from .densenet import DenseNet, densenet121, densenet161, densenet169, densenet201, densenet_cifar
from .frequency import FrequencyModel, FrequencyModelDropoutEnsemble, frequency_model, frequency_model_dropout
from .generators import (
    CUnetGenerator,
    FixedTriggerGenerator,
    GridGenerator,
    MixedGenerator,
    UnetGenerator,
    UnetGeneratorBK,
)
from .mobilenetv2 import MobileNetV2
from .preact_resnet import (
    PreActResNet,
    preact_resnet10,
    preact_resnet18,
    preact_resnet34,
    preact_resnet50,
    preact_resnet101,
    preact_resnet152,
)
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152
from .vgg import VGG, vgg
from .vit import SimpleViT, VisionTransformer

# --model overrides (reference C_MAPPING_NAMES, train_generator.py:27-32)
CLASSIFIERS = {
    "preactresnet18": lambda num_classes, **kw: preact_resnet18(num_classes),
    "preactresnet10": lambda num_classes, **kw: preact_resnet10(num_classes),
    "preactresnet34": lambda num_classes, **kw: preact_resnet34(num_classes),
    "resnet18": lambda num_classes, **kw: resnet18(num_classes),
    "resnet34": lambda num_classes, **kw: resnet34(num_classes),
    "vgg11": lambda num_classes, **kw: vgg("VGG11", num_classes),
    "vgg13": lambda num_classes, **kw: vgg("VGG13", num_classes),
    "vgg16": lambda num_classes, **kw: vgg("VGG16", num_classes),
    "vgg19": lambda num_classes, **kw: vgg("VGG19", num_classes),
    "mobilenetv2": lambda num_classes, **kw: MobileNetV2(num_classes),
    "densenet121": lambda num_classes, **kw: densenet121(num_classes),
    "vit": lambda num_classes, input_size=32, **kw: SimpleViT(
        image_size=input_size, patch_size=4, num_classes=num_classes, dim=768, depth=6, heads=8, mlp_dim=1024
    ),
    "simplevitsmall8": lambda num_classes, input_size=32, **kw: SimpleViT(
        image_size=input_size, patch_size=8, num_classes=num_classes, dim=384, depth=12, heads=6, mlp_dim=384 * 4
    ),
    # timm vit_small (reference eval.py:24-40: ViT-S/16 geometry at
    # patch_size=input_size//16, embed 384, depth 12, heads 6); timm
    # state dicts import via torch_import.convert_timm_vit.
    "vitsmall": lambda num_classes, input_size=32, **kw: VisionTransformer(
        image_size=input_size, patch_size=max(1, input_size // 16), num_classes=num_classes,
        dim=384, depth=12, heads=6,
    ),
}

# Latent experiment zoo (reference classifier_models/{lenet,mobilenet,...}.py)
from .zoo_extra import (  # noqa: E402
    EfficientNetB0,
    GoogLeNet,
    LeNet,
    MobileNetV1,
    ShuffleNetG2,
    ShuffleNetV2,
    SENet18,
    dpn26,
    dpn92,
    pnasnet_a,
    pnasnet_b,
    resnext29_2x64d,
    resnext29_32x4d,
)

CLASSIFIERS.update(
    {
        "lenet": lambda num_classes, **kw: LeNet(num_classes),
        "mobilenet": lambda num_classes, **kw: MobileNetV1(num_classes),
        "efficientnetb0": lambda num_classes, **kw: EfficientNetB0(num_classes),
        "googlenet": lambda num_classes, **kw: GoogLeNet(num_classes),
        "dpn26": lambda num_classes, **kw: dpn26(num_classes),
        "dpn92": lambda num_classes, **kw: dpn92(num_classes),
        "senet18": lambda num_classes, **kw: SENet18(num_classes),
        "shufflenetg2": lambda num_classes, **kw: ShuffleNetG2(num_classes),
        "shufflenetv2": lambda num_classes, **kw: ShuffleNetV2(num_classes),
        "resnext29_2x64d": lambda num_classes, **kw: resnext29_2x64d(num_classes),
        "resnext29_32x4d": lambda num_classes, **kw: resnext29_32x4d(num_classes),
        "pnasneta": lambda num_classes, **kw: pnasnet_a(num_classes),
        "pnasnetb": lambda num_classes, **kw: pnasnet_b(num_classes),
    }
)


def get_classifier(cfg: Config) -> nn.Module:
    """Default classifier per dataset (reference get_model train_generator.py:90-110)."""
    if cfg.model != "default":
        return CLASSIFIERS[cfg.model](num_classes=cfg.num_classes, input_size=cfg.input_height)
    if cfg.dataset == "cifar10":
        return preact_resnet18(cfg.num_classes)
    if cfg.dataset in ("celeba", "imagenet10"):
        return resnet18(cfg.num_classes)
    if cfg.dataset == "gtsrb":
        return preact_resnet18(cfg.num_classes)
    if cfg.dataset == "mnist":
        from .misc import NetC_MNIST

        return NetC_MNIST(cfg.num_classes)
    raise ValueError(f"no default classifier for dataset {cfg.dataset!r}")


def get_generator(cfg: Config, kind: str = "unet") -> nn.Module:
    if kind == "unet":
        return UnetGenerator(out_channels=cfg.input_channel)
    if kind == "unet_bk":
        return UnetGeneratorBK()
    if kind == "grid":
        return GridGenerator(s=cfg.s)
    if kind == "mixed":
        return MixedGenerator(s=cfg.s, out_channels=cfg.input_channel)
    if kind == "cunet":
        return CUnetGenerator(num_classes=cfg.num_classes, out_channels=cfg.input_channel)
    if kind == "fixed":
        return FixedTriggerGenerator(cfg.input_height, cfg.input_width, cfg.input_channel)
    raise ValueError(f"unknown generator kind {kind!r}")


def get_frequency_detector(cfg: Config) -> nn.Module:
    """Frequency detector per --F_model (reference F_MAPPING_NAMES,
    train_generator.py:35-44,112-120)."""
    name = cfg.F_model
    if name in ("original", "original_holdout"):
        return frequency_model(num_classes=2)
    if name == "original_dropout":
        return frequency_model_dropout(num_classes=2, dropout=cfg.F_dropout)
    if name == "original_dropout_ensemble":
        return FrequencyModelDropoutEnsemble(num_classes=2, dropout=cfg.F_dropout, num_ensemble=cfg.F_num_ensemble)
    if name in CLASSIFIERS:
        return CLASSIFIERS[name](num_classes=2, input_size=cfg.input_height)
    raise ValueError(f"unknown frequency detector {name!r}")
