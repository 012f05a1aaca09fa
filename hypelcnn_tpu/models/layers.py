"""Shared flax building blocks reproducing tf-slim layer semantics.

tf-slim's ``conv2d``/``fully_connected`` compose as: linear (bias only when
unnormalized) -> optional batch_norm -> activation.  ``batch_norm`` defaults
to center=True, scale=False, eps=1e-3 with EMA ``decay``.  These blocks
reproduce that ordering so the reference's modelconfig hyperparameters
(``bn_decay`` etc.) mean the same thing here.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

# tf: initializers.variance_scaling(scale=2.0) — fan_in, truncated normal
he_truncated = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
# tf-slim default: xavier_initializer() — glorot uniform
xavier = nn.initializers.xavier_uniform()


class SlimBatchNorm(nn.Module):
    """Batch norm with tf-slim/TF-fused semantics (center, no scale).

    Differs from ``flax.linen.BatchNorm`` in ONE way: the running-variance
    EMA uses the BESSEL-CORRECTED batch variance (``var * n/(n-1)``) while
    normalization uses the biased variance — exactly what TF's
    ``fused_batch_norm`` (and torch) do.  flax's biased running variance
    drifted ~1% from the reference over a training run
    (``scripts/train_parity.py`` measured it), which bleeds into inference.

    Variable names/collections match flax BatchNorm (``batch_stats``
    ``mean``/``var``, param ``bias``) so checkpoints and the TF-parity name
    mapping are unchanged.
    """
    momentum: float = 0.95
    epsilon: float = 1e-3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=reduce_axes)
            var = jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mean)
            # EMA update only when the collection is mutable: CAP's preserved
            # always-batch-stats quirk normalizes with batch statistics even
            # during (immutable) evaluation applies
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                n = math.prod(x.shape[axis] for axis in reduce_axes)
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (var * bessel)

        dtype = self.dtype or x.dtype
        y = (x - mean.astype(dtype)) * jax.lax.rsqrt(
            var.astype(dtype) + jnp.asarray(self.epsilon, dtype))
        return y + bias.astype(dtype)


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
    # slim.batch_norm's is_training defaults to the literal True; a call
    # site that never threads is_training (CAP, `nnmodel/CAPModel.py:53-65`)
    # therefore normalizes with BATCH statistics even at inference
    always_batch_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kernel = (self.kernel, self.kernel) if isinstance(self.kernel, int) else tuple(self.kernel)
        x = nn.Conv(self.features, kernel, strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=not self.use_batch_norm,
                    kernel_init=self.kernel_init, dtype=self.dtype)(x)
        if self.use_batch_norm:
            # name pinned so checkpoints/TF-parity mapping keep their paths
            x = SlimBatchNorm(momentum=self.bn_momentum, epsilon=1e-3,
                              dtype=self.dtype, name="BatchNorm_0")(
                x, use_running_average=not train and not self.always_batch_stats)
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
            x = SlimBatchNorm(momentum=self.bn_momentum, epsilon=1e-3,
                              dtype=self.dtype, name="BatchNorm_0")(
                x, use_running_average=not train)
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
