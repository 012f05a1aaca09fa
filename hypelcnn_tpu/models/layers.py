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


class FusedMultiScaleLevel(nn.Module):
    """A whole multi-scale level as ONE k_max x k_max convolution.

    The reference's level runs parallel odd k x k SAME convs and concats
    their outputs (`nnmodel/HYPELCNNModel.py:166-183`).  Zero-padding each
    branch kernel to k_max and concatenating on output channels gives a
    single conv whose output IS that concat — numerically identical
    (a zero-padded kernel == the smaller SAME conv), while deleting the
    activation concat and the per-branch layout copies XLA inserts around
    it (round-2 profile: ~0.6 ms/step of bf16[4096,3,3,480] copies).

    Per-branch parameters keep SlimConv granularity (``conv{k}x{k}_kernel``
    / ``conv{k}x{k}_bias``) so TF-parity weight mapping stays 1:1; the
    batch norm is a single ``BatchNorm_0`` over the concatenated channels,
    equivalent to per-branch BNs because BN is per-channel with identical
    momentum/eps (bias/mean/var are the branch concat — see
    ``fuse_level_params``).
    """
    features: int
    activation: Optional[Callable] = nn.relu
    use_batch_norm: bool = False
    bn_momentum: float = 0.95
    kernel_init: Callable = xavier
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        patch = x.shape[1]
        ks = tuple(range(1, patch + 1, 2))
        kmax = ks[-1]
        cin = x.shape[-1]
        dtype = self.dtype or x.dtype
        kernels, biases = [], []
        for k in ks:
            kern = self.param(f"conv{k}x{k}_kernel", self.kernel_init,
                              (k, k, cin, self.features), jnp.float32)
            pad = (kmax - k) // 2
            kernels.append(jnp.pad(kern, ((pad, pad), (pad, pad), (0, 0), (0, 0))))
            if not self.use_batch_norm:
                biases.append(self.param(f"conv{k}x{k}_bias",
                                         nn.initializers.zeros,
                                         (self.features,), jnp.float32))
        merged = jnp.concatenate(kernels, axis=-1).astype(dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), merged, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_batch_norm:
            y = SlimBatchNorm(momentum=self.bn_momentum, epsilon=1e-3,
                              dtype=self.dtype, name="BatchNorm_0")(
                y, use_running_average=not train)
        else:
            y = y + jnp.concatenate(biases).astype(dtype)
        if self.activation is not None:
            y = self.activation(y)
        return y


def fuse_level_params(branch_params: dict, branch_stats: dict | None = None):
    """Convert per-branch SlimConv subtrees to FusedMultiScaleLevel trees.

    ``branch_params`` maps ``conv{k}x{k}`` -> SlimConv param subtree
    (``{"Conv_0": {"kernel"[, "bias"]}[, "BatchNorm_0": {"bias"}]}``);
    ``branch_stats`` optionally maps the same keys to SlimBatchNorm
    ``batch_stats`` subtrees.  Returns ``(fused_params, fused_stats)`` where
    batch-norm vectors are concatenated in ascending-k order.
    """
    def _k(name):  # "conv3x3" -> 3
        return int(name[len("conv"):].split("x", 1)[0])

    names = sorted(branch_params, key=_k)
    params: dict = {}
    bn_bias = []
    for name in names:
        sub = branch_params[name]
        params[f"{name}_kernel"] = sub["Conv_0"]["kernel"]
        if "bias" in sub["Conv_0"]:
            params[f"{name}_bias"] = sub["Conv_0"]["bias"]
        if "BatchNorm_0" in sub:
            bn_bias.append(sub["BatchNorm_0"]["bias"])
    if bn_bias:
        params["BatchNorm_0"] = {"bias": jnp.concatenate(bn_bias)}
    stats = None
    if branch_stats:
        stats = {"BatchNorm_0": {
            "mean": jnp.concatenate(
                [branch_stats[n]["BatchNorm_0"]["mean"] for n in names]),
            "var": jnp.concatenate(
                [branch_stats[n]["BatchNorm_0"]["var"] for n in names]),
        }}
    return params, stats


def fuse_variables(variables) -> dict:
    """Convert a model's unfused variable tree to the fused-level layout.

    Scans top-level module names for the per-branch pattern
    ``{base}_conv{k}x{k}`` (HYPELCNN ``connector_{i}_conv{k}x{k}``, DUALCNN
    ``level{i}_conv{k}x{k}``) and merges each group into a
    ``{base}_fused`` FusedMultiScaleLevel subtree.  Non-level modules pass
    through unchanged, so a checkpoint trained with
    ``fuse_level_convs: false`` loads into a fused module and vice versa.
    """
    import re
    pat = re.compile(r"^(.+)_(conv\d+x\d+)$")
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    groups: dict = {}
    stat_groups: dict = {}
    for key in list(params):
        m = pat.match(key)
        if m:
            groups.setdefault(m.group(1), {})[m.group(2)] = params.pop(key)
    for key in list(stats):
        m = pat.match(key)
        if m and m.group(1) in groups:
            stat_groups.setdefault(m.group(1), {})[m.group(2)] = stats.pop(key)
    for base, branches in groups.items():
        fused_p, fused_s = fuse_level_params(branches, stat_groups.get(base))
        params[f"{base}_fused"] = fused_p
        if fused_s is not None:
            stats[f"{base}_fused"] = fused_s
    out = {**variables, "params": params}
    if "batch_stats" in variables:
        out["batch_stats"] = stats
    return out


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
