"""Shared Flax layers: InstanceNorm, torch-parity initializers, pooling.

Flax has no InstanceNorm; the UNet generators rely on
``nn.InstanceNorm2d`` defaults (affine=False, eps=1e-5, per-sample per-channel
normalization over H,W — reference ``networks/models.py:278-313``), so it is
hand-written here.

Initializers replicate PyTorch's defaults (``kaiming_uniform_(a=√5)`` for
conv/linear kernels, ``U(±1/√fan_in)`` for biases) so training dynamics match
the reference; this is a distributional, not bitwise, parity.
"""

from __future__ import annotations

import contextvars

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# PyTorch nn.Conv2d / nn.Linear default weight init: kaiming_uniform(a=√5)
# == U(-1/√fan_in, 1/√fan_in) == variance_scaling(1/3, fan_in, uniform).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# ---------------------------------------------------------------------------
# Mixed precision: conv/dense compute in `compute_dtype()` (params stay f32);
# BatchNorm and the loss stay f32 (the standard TPU recipe — bf16 on the MXU
# path, f32 where reductions need range).  None (default) = pure f32.
# Set once per process from Config.compute_dtype (CLI harnesses, bench.py).
# ---------------------------------------------------------------------------
_COMPUTE_DTYPE = contextvars.ContextVar("combat_compute_dtype", default=None)


def set_compute_dtype(dtype) -> None:
    if isinstance(dtype, str):
        dtype = None if dtype in ("float32", "f32", "") else jnp.dtype(dtype)
    _COMPUTE_DTYPE.set(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE.get()


def torch_bias_init(fan_in: int):
    """PyTorch default bias init: U(-1/√fan_in, 1/√fan_in)."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


@jax.custom_vjp
def guided_relu(x):
    """ReLU whose backward pass only propagates positive gradients through
    positive activations — Guided Backpropagation (reference
    ``defenses/gradcam/gradcam.py:201-271`` implements this by patching every
    ReLU module; here it's a custom-VJP activation the model is built with)."""
    return jnp.maximum(x, 0.0)


def _guided_relu_fwd(x):
    return jnp.maximum(x, 0.0), x


def _guided_relu_bwd(x, g):
    return (jnp.where((x > 0) & (g > 0), g, 0.0),)


guided_relu.defvjp(_guided_relu_fwd, _guided_relu_bwd)


class InstanceNorm(nn.Module):
    """``nn.InstanceNorm2d`` parity: normalize over (H, W) per sample per
    channel; no affine, no running stats (torch defaults)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # stats in f32 even under bf16 compute (mean/var need the range)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        var = jnp.var(x32, axis=(-3, -2), keepdims=True)
        return (((x32 - mean) * jax.lax.rsqrt(var + self.epsilon))).astype(x.dtype)


def conv(features: int, kernel: int = 3, stride: int = 1, use_bias: bool = False, fan_in: int | None = None, name=None):
    """3x3-style conv with torch-default init. ``fan_in`` (= k*k*c_in) is
    needed only when use_bias=True to size the bias bound."""
    kwargs = dict(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        dtype=compute_dtype(),
        name=name,
    )
    if use_bias:
        assert fan_in is not None
        kwargs["bias_init"] = torch_bias_init(fan_in)
    return nn.Conv(**kwargs)


def dense(features: int, fan_in: int, name=None):
    return nn.Dense(
        features=features,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
        dtype=compute_dtype(),
        name=name,
    )


def batch_norm(train: bool, name=None, momentum: float = 0.9):
    """``nn.BatchNorm2d`` parity: torch momentum 0.1 ⇔ flax momentum 0.9,
    eps 1e-5, affine. (torch updates running var with the unbiased estimate
    while flax uses the biased one — negligible at batch≥128, documented.)"""
    return nn.BatchNorm(use_running_average=not train, momentum=momentum, epsilon=1e-5, name=name)


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), (2, 2))


def avg_pool(x: jnp.ndarray, window: int) -> jnp.ndarray:
    return nn.avg_pool(x, (window, window), (window, window))


def flatten(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((x.shape[0], -1))
