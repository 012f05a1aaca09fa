"""Shared flax building blocks reproducing tf-slim layer semantics.

tf-slim's ``conv2d``/``fully_connected`` compose as: linear (bias only when
unnormalized) -> optional batch_norm -> activation.  ``batch_norm`` defaults
to center=True, scale=False, eps=1e-3 with EMA ``decay``.  These blocks
reproduce that ordering so the reference's modelconfig hyperparameters
(``bn_decay`` etc.) mean the same thing here.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

# tf: initializers.variance_scaling(scale=2.0) — fan_in, truncated normal
he_truncated = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
# tf-slim default: xavier_initializer() — glorot uniform
xavier = nn.initializers.xavier_uniform()


class SlimConv(nn.Module):
    """tf-slim conv2d equivalent: conv -> [batch_norm] -> activation."""
    features: int
    kernel: Union[int, Sequence[int]]
    activation: Optional[Callable] = nn.relu  # tf-slim default activation is relu
    use_batch_norm: bool = False
    bn_momentum: float = 0.95
    padding: str = "SAME"
    stride: int = 1
    kernel_init: Callable = xavier
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kernel = (self.kernel, self.kernel) if isinstance(self.kernel, int) else tuple(self.kernel)
        x = nn.Conv(self.features, kernel, strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=not self.use_batch_norm,
                    kernel_init=self.kernel_init, dtype=self.dtype)(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                             epsilon=1e-3, use_scale=False, dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class SlimDense(nn.Module):
    """tf-slim fully_connected equivalent: dense -> [batch_norm] -> activation."""
    features: int
    activation: Optional[Callable] = nn.relu
    use_batch_norm: bool = False
    bn_momentum: float = 0.95
    kernel_init: Callable = xavier
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.features, use_bias=not self.use_batch_norm,
                     kernel_init=self.kernel_init, dtype=self.dtype)(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                             epsilon=1e-3, use_scale=False, dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def multi_scale_level(x: jax.Array, features: int, make_conv, *, train: bool,
                      square_only: bool = True) -> jax.Array:
    """Parallel odd k x k convolutions concatenated on channels.

    The HYPELCNN/DUALCNN "level": for each odd kernel size up to the patch
    size, run a SAME conv and concat (reference
    `nnmodel/HYPELCNNModel.py:166-183`, `nnmodel/DUALCNNModel.py:91-104`).
    ``make_conv(features, k, name)`` builds the conv submodule so callers
    control init/norm/activation.
    """
    patch = x.shape[1]
    outs = []
    for k in range(1, patch + 1, 2):
        outs.append(make_conv(features, k, f"conv{k}x{k}")(x, train=train))
    return jnp.concatenate(outs, axis=-1)
