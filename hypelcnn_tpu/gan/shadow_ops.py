"""Shadow augmentation ops for classification training.

Replaces the reference's ``ShadowOpHolder`` scaffolding — frozen GAN graphs
embedded in the input pipeline with split restore-vs-initialize handling
(`gan/gan_utilities.py:7-43`, `classify/monitored_session_runner.py:131-138`)
— with plain jittable closures over parameter pytrees: loading a frozen
generator is just restoring a second pytree and applying it inside the
jitted augmentation.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from hypelcnn_tpu.data.augmentation import ShadowOps


def create_simple_shadow_struct(shadow_ratio: np.ndarray) -> ShadowOps:
    """Divide/multiply by the physical per-band shadow ratio
    (reference `gan/gan_utilities.py:17-27`); LiDAR channel unscaled."""
    ratio = jnp.asarray(np.append(shadow_ratio, 1).astype(np.float32))

    return ShadowOps(shadow_fn=lambda patch: patch / ratio,
                     deshadow_fn=lambda patch: patch * ratio)


def create_gan_shadow_struct(trainer, params, band_count: int) -> ShadowOps:
    """Wrap a trained GAN generator as a patch augmentation: HSI channels
    translated, LiDAR passed through (reference `gan/gan_utilities.py:30-43`)."""

    def _translate(patch: jax.Array, is_shadow: bool) -> jax.Array:
        hsi, rest = patch[..., :band_count], patch[..., band_count:]
        converted = trainer.translate(params, hsi[None], is_shadow)[0]
        return jnp.concatenate([converted, rest], axis=-1)

    return ShadowOps(shadow_fn=lambda p: _translate(p, True),
                     deshadow_fn=lambda p: _translate(p, False))


def build_shadow_creators(loader, scene, neighborhood: int,
                          max_steps: int = 100000) -> Dict[str, ShadowOps]:
    """Assemble the dataset's shadow-augmenter dict.

    The reference loaders construct this inside ``load_data``
    (`loader/GRSS2013DataLoader.py:26-34`); the rebuild injects it from the
    GAN layer.  "simple" uses the physical ratio; GAN entries are added when
    an orbax params checkpoint exists at the loader-declared path (trained
    by apps/gan_train_for_shadow.py, which writes ``gan_params/`` dirs).
    """
    creators: Dict[str, ShadowOps] = {}
    shadow_map, shadow_ratio = loader.load_shadow_map(neighborhood, scene)
    if shadow_ratio is not None:
        creators["simple"] = create_simple_shadow_struct(shadow_ratio)

    band_count = scene.get_casi_band_count()
    checkpoints = loader.get_shadow_checkpoints()
    if checkpoints:
        from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict
        trainers = get_trainer_dict({}, band_count, max_steps)
        from hypelcnn_tpu.utils.tf_checkpoint_import import is_tf_checkpoint
        for name, rel_path in checkpoints.items():
            path = os.path.join(loader.get_model_base_dir(), rel_path)
            trainer = trainers.get(name)
            if trainer is None:
                continue
            try:
                template = trainer.init_state(jax.random.key(0)).params
                if is_tf_checkpoint(path):
                    # the loader-declared path IS a reference TF checkpoint
                    # (`loader/GRSS2013DataLoader.py:26-34` model.ckpt-NNNN):
                    # import the trained generator scopes directly
                    from hypelcnn_tpu.utils.tf_checkpoint_import import (
                        import_gan_generator_params)
                    params = jax.tree_util.tree_map(
                        jnp.asarray,
                        import_gan_generator_params(name, template, path))
                elif os.path.isdir(path):
                    from hypelcnn_tpu.train.checkpoint import restore_params_pytree
                    params = restore_params_pytree(path, template)
                else:
                    continue
                creators[name] = create_gan_shadow_struct(trainer, params, band_count)
            except Exception as exc:  # pragma: no cover - corrupt/missing ckpt
                print(f"shadow creator {name}: failed to restore {path}: {exc}")
    return creators
