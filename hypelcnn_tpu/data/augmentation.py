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

from dataclasses import dataclass, field
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


def _rotate(patch: jax.Array, key: jax.Array) -> jax.Array:
    k = jax.random.randint(key, (), 0, 3)  # 0..2 quarter turns (reference quirk)
    return jax.lax.switch(k, [
        lambda p: p,
        lambda p: jnp.rot90(p, 1, axes=(0, 1)),
        lambda p: jnp.rot90(p, 2, axes=(0, 1)),
    ], patch)


def _reflect(patch: jax.Array, key: jax.Array) -> jax.Array:
    k1, k2 = jax.random.split(key)
    patch = jax.lax.cond(jax.random.bernoulli(k1), lambda p: p[:, ::-1, :], lambda p: p, patch)
    patch = jax.lax.cond(jax.random.bernoulli(k2), lambda p: p[::-1, :, :], lambda p: p, patch)
    return patch


def _spectral(patch: jax.Array, key: jax.Array, amount: float) -> jax.Array:
    delta = jax.random.uniform(key, (patch.shape[-1],), minval=-amount, maxval=0.0)
    return patch + delta


def _shadow(patch: jax.Array, key: jax.Array, shadow_fn, threshold: float) -> jax.Array:
    u = jax.random.uniform(key, ())
    return jax.lax.cond(u < threshold, shadow_fn, lambda p: p, patch)


def augment_example(patch: jax.Array, key: jax.Array, info: AugmentationInfo) -> jax.Array:
    """Apply the enabled augmentations to one [k, k, C] patch.

    Order matches the reference pipeline: rotation -> shadow -> reflection ->
    spectral (`common/common_nn_ops.py:376-394`).
    """
    k_rot, k_shadow, k_refl, k_spec = jax.random.split(key, 4)
    if info.perform_rotation_augmentation:
        patch = _rotate(patch, k_rot)
    if info.perform_shadow_augmentation and info.shadow_struct is not None:
        patch = _shadow(patch, k_shadow, info.shadow_struct.shadow_fn,
                        info.augmentation_random_threshold)
    if info.perform_reflection_augmentation:
        patch = _reflect(patch, k_refl)
    if info.perform_spectral_augmentation:
        patch = _spectral(patch, k_spec, float(info.perform_spectral_augmentation))
    return patch


def augment_batch(patches: jax.Array, key: jax.Array, info: AugmentationInfo) -> jax.Array:
    if not (info.perform_rotation_augmentation or info.perform_reflection_augmentation
            or info.perform_spectral_augmentation
            or (info.perform_shadow_augmentation and info.shadow_struct is not None)):
        return patches
    keys = jax.random.split(key, patches.shape[0])
    return jax.vmap(lambda p, k: augment_example(p, k, info))(patches, keys)
