"""VGG11/13/16/19 in Flax (NHWC).

Parity with reference ``classifier_models/vgg.py:7-45`` (conv-BN-ReLU stacks
with maxpools; the trailing AvgPool(1) is an identity and is dropped).
VGG13 is the ``--model vgg13`` surrogate option and an alternative frequency
detector backbone (reference ``train_generator.py:28,40``).
"""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn

from .layers import batch_norm, compute_dtype, dense, flatten, max_pool2, torch_bias_init, torch_kernel_init

CFG = {
    "VGG11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "VGG13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "VGG16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    "VGG19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: Sequence[Union[int, str]]
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        i = 0
        for item in self.cfg:
            if item == "M":
                x = max_pool2(x)
            else:
                fan_in = 3 * 3 * x.shape[-1]
                x = nn.Conv(
                    item,
                    (3, 3),
                    padding=1,
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(fan_in),
                    dtype=compute_dtype(),
                    name=f"conv{i}",
                )(x)
                x = batch_norm(train, name=f"bn{i}")(x)
                x = nn.relu(x)
                i += 1
        x = flatten(x)
        return dense(self.num_classes, x.shape[-1], name="classifier")(x)


def vgg(name: str, num_classes: int = 10) -> VGG:
    return VGG(CFG[name], num_classes)
