"""Frequency-domain backdoor detector in Flax (NHWC).

Parity with reference ``defenses/frequency_based/model.py``:
  * :class:`FrequencyModel` (``:8-52``) — six conv(SAME)-**ELU-BN** triplets
    (note: activation *before* BN, as in the reference), maxpool+dropout(0.2)
    after each pair, linear head. Input is the 2-D DCT of the uint8 image
    (see ``combat_tpu.ops.dct.detector_features``).
  * :class:`FrequencyModelDropout` (``:55-67``) — dropout stays stochastic in
    eval (the reference overrides ``.eval()`` to keep dropout in train mode).
  * :class:`FrequencyModelDropoutEnsemble` (``:70-84``) — averages
    ``num_ensemble`` stochastic passes.

Stochastic passes draw from the ``'dropout'`` PRNG collection; pass
``rngs={'dropout': key}`` whenever dropout is active.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import batch_norm, compute_dtype, dense, flatten, max_pool2, torch_bias_init, torch_kernel_init


class FrequencyModel(nn.Module):
    num_classes: int = 2
    dropout: float = 0.2
    dropout_always_on: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop_active = train or self.dropout_always_on
        i = 0
        for planes in (32, 64, 128):
            for j in range(2):
                fan_in = 3 * 3 * x.shape[-1]
                x = nn.Conv(
                    planes,
                    (3, 3),
                    padding="SAME",
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(fan_in),
                    dtype=compute_dtype(),
                    name=f"conv{i}",
                )(x)
                x = nn.elu(x)
                x = batch_norm(train, name=f"bn{i}")(x)
                i += 1
            x = max_pool2(x)
            x = nn.Dropout(self.dropout, deterministic=not drop_active)(x)
        x = flatten(x)
        return dense(self.num_classes, x.shape[-1], name="linear")(x)


def frequency_model(num_classes: int = 2) -> FrequencyModel:
    return FrequencyModel(num_classes=num_classes)


def frequency_model_dropout(num_classes: int = 2, dropout: float = 0.5) -> FrequencyModel:
    return FrequencyModel(num_classes=num_classes, dropout=dropout, dropout_always_on=True)


class FrequencyModelDropoutEnsemble(nn.Module):
    num_classes: int = 2
    dropout: float = 0.5
    num_ensemble: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        body = FrequencyModel(self.num_classes, self.dropout, dropout_always_on=True, name="body")
        outs = [body(x, train) for _ in range(self.num_ensemble)]
        return jnp.stack(outs, axis=1).mean(axis=1)
