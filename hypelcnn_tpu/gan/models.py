"""Shadow-translation GAN networks: 1-D spectral convolutions on single pixels.

Parity with reference `gan/shadow_data_models.py`:

- Generator (`shadowdata_generator_model`, `:43-90`): a dense-residual stack
  of 1-D convolutions along the spectral axis with kernel sizes band, band/2,
  band/4, band/8, then a mirrored decoder ending in tanh; weights are
  ZERO-initialized so the net starts as the identity (the dense residuals
  pass the input through); leaky-relu(0.1).  ``encoder_only`` returns the
  bottleneck features (used by CUT's contrastive loss).
- Discriminator (`shadowdata_discriminator_model`, `:93-123`): 3 dense
  layers band -> band -> band/2 (last one linear); variance-scaling(2.0)
  init.  NOTE the reference's full variant ignores ``generator_input``
  despite accepting it — preserved.
- Feature discriminator (`shadowdata_feature_discriminator_model`,
  `:126-149`): per-spectral-patch dense stacks projecting to an embedding,
  normalized; outputs ``[B, patch_count, embed]``.
- "Simple" single-conv variants (`:9-40`).

TPU note: inputs are ``[B, 1, 1, bands]`` pixels; all convs here are small
matmuls that XLA maps onto the MXU once batched — the GAN batch (32+) rides
one fused program per step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

he_truncated = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


def tf_leaky_relu(x: jax.Array, alpha: float) -> jax.Array:
    """leaky-relu with TF's subgradient convention at exactly 0.

    ``tf.nn.leaky_relu``'s gradient kernel computes ``x > 0 ? dy : alpha*dy``
    — subgradient ALPHA at 0 — while ``jax.nn.leaky_relu`` is
    ``where(x >= 0, ...)`` — subgradient 1.  Forward values are identical,
    but the reference's generator is ZERO-initialized
    (`gan/shadow_data_models.py:49`), so on the first training step every
    hidden pre-activation is exactly 0 and the whole first generator update
    differs by the alpha-vs-1 factor (measured: the two-sided GAN trajectory
    experiment diverged ~5e-3/step until this matched;
    scripts/gan_episode_parity.py).  ``where(x > 0)`` reproduces TF."""
    return jnp.where(x > 0, x, alpha * x)


def _to_spectral(x: jax.Array) -> jax.Array:
    """[B, 1, 1, bands] (or [B, bands]) -> [B, bands, 1]."""
    return x.reshape(x.shape[0], -1)[:, :, None]


def _from_spectral(x: jax.Array) -> jax.Array:
    """[B, bands, 1] -> [B, 1, 1, bands]."""
    return x.reshape(x.shape[0], -1)[:, None, None, :]


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's exact variable layout (``kernel``
    [k, 1, 1], ``bias`` [1]) so the Toeplitz path below shares checkpoints
    with the conv path."""
    kernel_size: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.zeros,
                            (self.kernel_size, 1, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return kernel, bias


def _toeplitz_from_kernel(kernel: jax.Array, length: int) -> jax.Array:
    """Banded Toeplitz matrix T with ``x @ T`` == flax ``nn.Conv`` SAME
    1-D convolution of ``x`` [B, length] by ``kernel`` [k, 1, 1]
    (pad_low = (k-1)//2, so T[i, j] = w[i - j + pad_low])."""
    k = kernel.shape[0]
    w = kernel[:, 0, 0]
    pad_low = (k - 1) // 2
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    idx = i - j + pad_low
    valid = (idx >= 0) & (idx < k)
    return jnp.where(valid, w[jnp.clip(idx, 0, k - 1)], 0.0)


class ShadowGenerator(nn.Module):
    """Dense-residual spectral conv generator (reference `:43-90`).

    ``impl="toeplitz"`` computes each 1-D spectral conv as a banded-matrix
    matmul (``x @ T``) instead of a conv op — numerically identical and the
    SAME parameter tree (CI-tested).  REFUTED as a perf lever on the v5e
    (round 4, scripts/bench_gan.py --fused_generator, 144 bands): a
    cycle_gan step runs at a FLAT ~9.2 ms for batch 32/512/1024 vs the conv
    path's 0.77/2.9/6.6 ms — 12x slower at batch 32, 3x at 512.  Building
    the [bands, bands] banded matrices from the kernels inside the step
    (iota compares + select per layer per generator application) costs far
    more than the conv lowering it replaces.  ``conv`` stays the default;
    the toeplitz path is kept for checkpoint-compatible experimentation.
    """
    band_size: int
    impl: str = "conv"  # "conv" | "toeplitz"

    @nn.compact
    def __call__(self, x: jax.Array, encoder_only: bool = False) -> jax.Array:
        k = self.band_size
        act = lambda v: tf_leaky_relu(v, 0.1)

        if self.impl == "toeplitz":
            flat = x.reshape(x.shape[0], -1)  # [B, bands]

            def layer(name, ksize, inp, use_act=True):
                kern, bias = _ConvParams(max(ksize, 1), name=name)()
                y = inp @ _toeplitz_from_kernel(kern, k) + bias[0]
                return act(y) if use_act else y

            net0 = flat
            net1 = layer("net1", k, net0) + net0
            net2 = layer("net2", k // 2, net1) + net1 + net0
            net3 = layer("net3", k // 4, net2) + net2 + net1
            net4 = layer("net4", k // 8, net3) + net3 + net2
            if encoder_only:
                return net4[:, None, None, :]
            net5 = layer("net5", k // 4, net4) + net4 + net3
            net6 = layer("net6", k // 2, net5) + net5 + net4
            net7 = jnp.tanh(layer("net7", k, net6, use_act=False))
            return net7[:, None, None, :]

        def conv(kernel, name, use_act=True):
            layer = nn.Conv(1, (max(kernel, 1),), padding="SAME", name=name,
                            kernel_init=nn.initializers.zeros)
            return (lambda v: act(layer(v))) if use_act else layer

        net0 = _to_spectral(x)
        net1 = conv(k, "net1")(net0) + net0
        net2 = conv(k // 2, "net2")(net1) + net1 + net0
        net3 = conv(k // 4, "net3")(net2) + net2 + net1
        net4 = conv(k // 8, "net4")(net3) + net3 + net2
        if encoder_only:
            return _from_spectral(net4)
        net5 = conv(k // 4, "net5")(net4) + net4 + net3
        net6 = conv(k // 2, "net6")(net5) + net5 + net4
        net7 = jnp.tanh(conv(k, "net7", use_act=False)(net6))
        return _from_spectral(net7)


class ShadowGeneratorSimple(nn.Module):
    """Single linear spectral conv (reference `:9-22`)."""
    band_size: int

    @nn.compact
    def __call__(self, x: jax.Array, encoder_only: bool = False) -> jax.Array:
        net = _to_spectral(x)
        net = nn.Conv(1, (self.band_size,), padding="SAME", name="conv")(net)
        return _from_spectral(net)


class ShadowDiscriminator(nn.Module):
    """3-layer dense discriminator (reference `:93-123`)."""
    band_size: int

    @nn.compact
    def __call__(self, generated_data: jax.Array,
                 generator_input: Optional[jax.Array] = None) -> jax.Array:
        del generator_input  # accepted-but-unused, as in the reference
        act = lambda v: tf_leaky_relu(v, 0.1)
        net = generated_data.reshape(generated_data.shape[0], -1)
        net = act(nn.Dense(self.band_size, kernel_init=he_truncated, name="fc1")(net))
        net = act(nn.Dense(self.band_size, kernel_init=he_truncated, name="fc2")(net))
        net = nn.Dense(self.band_size // 2, kernel_init=he_truncated, name="fc3")(net)
        return net[:, None, None, :]


class ShadowDiscriminatorSimple(nn.Module):
    """Concat-input conv discriminator (reference `:25-40`)."""
    band_size: int

    @nn.compact
    def __call__(self, generated_data: jax.Array,
                 generator_input: Optional[jax.Array] = None) -> jax.Array:
        act = lambda v: tf_leaky_relu(v, 0.01)
        g = generated_data.reshape(generated_data.shape[0], -1)
        i = generator_input.reshape(generator_input.shape[0], -1)
        net = jnp.concatenate([g, i], axis=1)[:, :, None]
        size = self.band_size * 2
        net = nn.Conv(size, (size,), padding="VALID", kernel_init=he_truncated)(net)
        return net.reshape(net.shape[0], -1)[:, None, None, :]


class ShadowFeatureDiscriminator(nn.Module):
    """Per-spectral-patch embedding head for NCE (reference `:126-149`).

    Preserved quirk: the reference calls ``tf.math.l2_normalize`` with no
    axis, normalizing each patch embedding by the GLOBAL norm over the whole
    batch tensor, not per-row.
    """
    band_size: int
    patch_count: int
    embedded_feature_size: int

    @nn.compact
    def __call__(self, features: jax.Array) -> jax.Array:
        act = lambda v: tf_leaky_relu(v, 0.1)
        net = features.reshape(features.shape[0], -1)
        patch_size = self.band_size // self.patch_count
        outputs = []
        for i, start in enumerate(range(0, self.band_size, patch_size)):
            cur = net[:, start:start + patch_size]
            cur = act(nn.Dense(patch_size, kernel_init=he_truncated, name=f"p{i}_fc1")(cur))
            cur = act(nn.Dense(patch_size // 4, kernel_init=he_truncated, name=f"p{i}_fc2")(cur))
            cur = act(nn.Dense(patch_size // 2, kernel_init=he_truncated, name=f"p{i}_fc3")(cur))
            cur = act(nn.Dense(self.embedded_feature_size, kernel_init=he_truncated,
                               name=f"p{i}_fc4")(cur))
            # tf.math.l2_normalize semantics: x * rsqrt(max(sum(x^2), 1e-12));
            # the max keeps the gradient finite at the zero vector (the
            # generator IS zero at init)
            cur = cur * jax.lax.rsqrt(jnp.maximum(jnp.sum(jnp.square(cur)), 1e-12))
            outputs.append(cur[:, None, :])
        return jnp.concatenate(outputs, axis=1)
