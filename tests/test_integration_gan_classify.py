"""Integration: frozen GAN generator as classification-training augmentation.

The reference's subtlest mechanism (SURVEY.md §3.4): a pre-trained shadow
generator embedded in the classifier's input pipeline.  Here that collapses
to loading a params pytree and applying it inside the jitted augmentation —
these tests exercise the whole chain: GAN training -> params checkpoint ->
shadow-creator injection -> augmented classification training -> resume.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypelcnn_tpu.core.registry import get_importer_from_name
from hypelcnn_tpu.data.augmentation import AugmentationInfo
from hypelcnn_tpu.gan.shadow_ops import build_shadow_creators, create_gan_shadow_struct
from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict
from hypelcnn_tpu.models import CONCNNModel
from hypelcnn_tpu.train.trainer import ClassificationTrainer

PARAMS = {"batch_size": 8, "drop_out_ratio": 0.5, "learning_rate": 1e-3,
          "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
          "filter_count": 8, "optimizer": "AdamOptimizer"}
GAN_CONFIG = {"patches": 3, "embedded_feat_size": 2, "tau": 0.07,
              "use_identity_loss": True, "identity_loss_weight": 0.5,
              "nce_loss_weight": 10.0}


def _read_data():
    importer = get_importer_from_name("GeneratorImporter")
    return importer.read_data_set(
        "SyntheticDataLoader", "synthetic://?h=48&w=64&bands=12&classes=5&seed=3",
        train_ratio=0.5, test_ratio=0.1, neighborhood=1)


def test_frozen_gan_augmented_training():
    np.random.seed(0)
    data = _read_data()
    bands = data.scene.get_casi_band_count()

    # 1) train a tiny CUT shadow GAN on synthetic pixel pairs
    gan = get_trainer_dict(GAN_CONFIG, bands, max_steps=4)["cut_x2y"]
    gan_state = gan.init_state(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (8, 1, 1, bands))
    y = x * 0.5
    for i in range(2):
        gan_state, metrics = gan.train_step(gan_state, x, y, jax.random.key(10 + i))
    gan_params = jax.device_get(gan_state.params)

    # 2) wrap as a frozen shadow augmenter + train the classifier with it
    shadow_struct = create_gan_shadow_struct(gan, gan_params, bands)
    trainer = ClassificationTrainer(
        model=CONCNNModel(), class_count=data.class_count, algorithm_params=PARAMS,
        scene=data.scene, sample_set=data.sample_set,
        augmentation_info=AugmentationInfo(
            shadow_struct=shadow_struct, perform_shadow_augmentation=True,
            augmentation_random_threshold=0.9),
        sources=data.sources, data_shape=data.data_shape)
    result = trainer.fit(num_steps=8, batch_size=8, log_every=8)
    assert np.isfinite(result.loss)


def test_build_shadow_creators_restores_orbax_params(tmp_path, monkeypatch):
    from hypelcnn_tpu.train.checkpoint import save_params_pytree

    np.random.seed(0)
    data = _read_data()
    bands = data.scene.get_casi_band_count()

    gan = get_trainer_dict({}, bands, max_steps=100000)["cycle_gan"]
    params = jax.device_get(gan.init_state(jax.random.key(0)).params)
    ckpt_dir = tmp_path / "shadow_gen_model" / "cycle_gan"
    save_params_pytree(str(ckpt_dir), params)

    monkeypatch.setattr(type(data.loader), "get_model_base_dir",
                        lambda self: str(tmp_path) + "/")
    monkeypatch.setattr(type(data.loader), "get_shadow_checkpoints",
                        lambda self: {"cycle_gan": "shadow_gen_model/cycle_gan"})

    creators = build_shadow_creators(data.loader, data.scene, neighborhood=1)
    assert "simple" in creators
    assert "cycle_gan" in creators

    patch = jnp.asarray(np.random.default_rng(0).uniform(
        size=(3, 3, bands + 1)).astype(np.float32))
    out = creators["cycle_gan"].shadow_fn(patch)
    assert out.shape == patch.shape
    # LiDAR channel passes through untouched
    np.testing.assert_allclose(np.asarray(out[..., -1]), np.asarray(patch[..., -1]))


def test_training_resume_from_checkpoint(tmp_path):
    np.random.seed(0)
    data = _read_data()
    kwargs = dict(model=CONCNNModel(), class_count=data.class_count,
                  algorithm_params=PARAMS, scene=data.scene,
                  sample_set=data.sample_set, sources=data.sources,
                  data_shape=data.data_shape,
                  log_dir=str(tmp_path), save_checkpoint_steps=4)
    t1 = ClassificationTrainer(**kwargs)
    t1.fit(num_steps=4, batch_size=8, log_every=4)
    assert int(t1.final_state.step) == 4

    # second trainer resumes and runs only the remaining steps
    t2 = ClassificationTrainer(**kwargs)
    t2.fit(num_steps=8, batch_size=8, log_every=4)
    assert int(t2.final_state.step) == 8
