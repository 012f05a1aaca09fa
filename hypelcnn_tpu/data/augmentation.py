"""Jitted data augmentation.

Replaces the reference's tf.data augmentation maps
(`common/common_nn_ops.py:376-440`) with pure per-example functions vmapped
over the batch inside the training step — augmentation runs on-device,
fused with the gather and the model.

Reference quirks preserved deliberately:
- rotation draws from {0, 90, 180} degrees only — `uniform([1],0,3)` never
  yields 270 (`common/common_nn_ops.py:402`);
- spectral augmentation adds only negative deltas (`:428-431`);
- the shadow op applies with probability ``augmentation_random_threshold``
  via a per-example coin flip (`:408-422`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclass
class ShadowOps:
    """A pair of jittable scene-patch translations (shadow / de-shadow).

    The GAN layer supplies these closed over frozen generator params
    (the reference's ``ShadowOpHolder``, `gan/gan_utilities.py:7-14`,
    without the restore/init scaffolding — params are just a pytree here).
    """
    shadow_fn: Callable[[jax.Array], jax.Array]
    deshadow_fn: Optional[Callable[[jax.Array], jax.Array]] = None


@dataclass
class AugmentationInfo:
    """Mirror of the reference's AugmentationInfo (`common/common_nn_ops.py:157-165`)."""
    shadow_struct: Optional[ShadowOps] = None
    perform_shadow_augmentation: bool = False
    perform_rotation_augmentation: bool = False
    perform_spectral_augmentation: float = 0.0  # 0 disables; else max negative delta
    perform_reflection_augmentation: bool = False
    augmentation_random_threshold: float = 0.5


def _rotate_batch(patches: jax.Array, key: jax.Array) -> jax.Array:
    """Per-example quarter-turns in {0, 90, 180} (reference quirk, never 270).

    Batch-level formulation: compute the two rotated copies of the WHOLE
    batch (cheap VPU transposes/reverses) and select per example — per-
    example control flow would serialize on the TPU.
    """
    k = jax.random.randint(key, (patches.shape[0],), 0, 3)
    sel = k.reshape(-1, 1, 1, 1)
    rot90 = jnp.rot90(patches, 1, axes=(1, 2))
    rot180 = jnp.rot90(patches, 2, axes=(1, 2))
    return jnp.where(sel == 1, rot90, jnp.where(sel == 2, rot180, patches))


def _reflect_batch(patches: jax.Array, key: jax.Array) -> jax.Array:
    k1, k2 = jax.random.split(key)
    flip_lr = jax.random.bernoulli(k1, 0.5, (patches.shape[0], 1, 1, 1))
    flip_ud = jax.random.bernoulli(k2, 0.5, (patches.shape[0], 1, 1, 1))
    patches = jnp.where(flip_lr, patches[:, :, ::-1, :], patches)
    patches = jnp.where(flip_ud, patches[:, ::-1, :, :], patches)
    return patches


def _spectral_batch(patches: jax.Array, key: jax.Array, amount: float) -> jax.Array:
    delta = jax.random.uniform(key, (patches.shape[0], 1, 1, patches.shape[-1]),
                               minval=-amount, maxval=0.0)
    return patches + delta


def _shadow_batch(patches: jax.Array, key: jax.Array, shadow_fn,
                  threshold: float) -> jax.Array:
    u = jax.random.uniform(key, (patches.shape[0], 1, 1, 1))
    shadowed = shadow_fn(patches)
    return jnp.where(u < threshold, shadowed, patches)


def augment_batch(patches: jax.Array, key: jax.Array, info: AugmentationInfo) -> jax.Array:
    """Apply the enabled augmentations to a [B, k, k, C] batch.

    Order matches the reference pipeline: rotation -> shadow -> reflection ->
    spectral (`common/common_nn_ops.py:376-394`); every op is batch-level
    vectorized with per-example random draws (one fused program, no
    per-example branches).
    """
    if not (info.perform_rotation_augmentation or info.perform_reflection_augmentation
            or info.perform_spectral_augmentation
            or (info.perform_shadow_augmentation and info.shadow_struct is not None)):
        return patches
    k_rot, k_shadow, k_refl, k_spec = jax.random.split(key, 4)
    if info.perform_rotation_augmentation:
        patches = _rotate_batch(patches, k_rot)
    if info.perform_shadow_augmentation and info.shadow_struct is not None:
        shadow_fn = info.shadow_struct.shadow_fn
        batched_fn = _batchify_shadow_fn(shadow_fn)
        patches = _shadow_batch(patches, k_shadow, batched_fn,
                                info.augmentation_random_threshold)
    if info.perform_reflection_augmentation:
        patches = _reflect_batch(patches, k_refl)
    if info.perform_spectral_augmentation:
        patches = _spectral_batch(patches, k_spec, float(info.perform_spectral_augmentation))
    return patches


def _batchify_shadow_fn(shadow_fn):
    """Shadow ops are written per-patch ([k, k, C]); apply over the batch.

    Simple-ratio ops broadcast natively; GAN ops fold the batch into their
    pixel axis, so one vmap keeps everything vectorized.
    """
    def batched(patches):
        return jax.vmap(shadow_fn)(patches)
    return batched


def augment_example(patch: jax.Array, key: jax.Array, info: AugmentationInfo) -> jax.Array:
    """Single-example convenience wrapper (tests / parity checks)."""
    return augment_batch(patch[None], key, info)[0]
