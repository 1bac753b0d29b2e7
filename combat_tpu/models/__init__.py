"""Flax model zoo (NHWC). The reference's empty ``__init__.py`` files are a
snapshot artifact — every script there imports these names, so we re-export
them properly (SURVEY.md §2.2 note)."""

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
from .layers import InstanceNorm, guided_relu
from .misc import (
    AE,
    NetC_CelebA,
    NetC_GTRSB,
    NetC_MNIST,
    NetC_MNIST2,
    NetC_MNIST3,
    denormalize_pm05,
    normalize_pm05,
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
from .registry import CLASSIFIERS, get_classifier, get_frequency_detector, get_generator
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152
from .vgg import VGG, vgg
from .vit import SimpleViT
from .zoo_extra import (
    DPN,
    EfficientNetB0,
    GoogLeNet,
    LeNet,
    MobileNetV1,
    PNASNet,
    ResNeXt29,
    SENet18,
    ShuffleNetG2,
    ShuffleNetV2,
    dpn26,
    dpn92,
    pnasnet_a,
    pnasnet_b,
    resnext29_2x64d,
    resnext29_32x4d,
)
