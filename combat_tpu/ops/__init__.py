"""Numerics / transform ops (pure JAX, NHWC, PRNG-keyed)."""

from .augment import post_tensor_transform, random_crop_with_padding, random_hflip, random_rotation
from .blur import gaussian_blur, gaussian_kernel_1d, random_gaussian_blur
from .dct import dct_2d, dct_matrix, detector_features, idct_2d, low_freq
from .image import grid_sample, resize2d, total_variation, upsample2x_bilinear

__all__ = [
    "post_tensor_transform",
    "random_crop_with_padding",
    "random_hflip",
    "random_rotation",
    "gaussian_blur",
    "gaussian_kernel_1d",
    "random_gaussian_blur",
    "dct_2d",
    "dct_matrix",
    "detector_features",
    "idct_2d",
    "low_freq",
    "grid_sample",
    "resize2d",
    "total_variation",
    "upsample2x_bilinear",
]
