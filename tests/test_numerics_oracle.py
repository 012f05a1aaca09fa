"""Independent-oracle numerics: tf-slim layer semantics validated against
torch (the only other NN framework in this image) and closed forms.

These pin the semantics the accuracy-parity contract depends on
(SURVEY.md §7 "hard parts" #2): batch-norm decay/eps behavior, the
conv->BN->activation ordering, and the augmentation quirk distributions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hypelcnn_tpu.data.augmentation import AugmentationInfo, augment_batch
from hypelcnn_tpu.models.layers import SlimConv


class TestBatchNormSemantics:
    def _bn_forward(self, x, momentum=0.95):
        import flax.linen as nn

        from hypelcnn_tpu.models.layers import SlimBatchNorm

        class BNOnly(nn.Module):
            @nn.compact
            def __call__(self, v, train=True):
                return SlimBatchNorm(momentum=momentum, epsilon=1e-3,
                                     name="BatchNorm_0")(
                    v, use_running_average=not train)

        m = BNOnly()
        variables = m.init(jax.random.key(0), x, train=True)
        out, updates = m.apply(variables, x, train=True, mutable=["batch_stats"])
        return np.asarray(out), updates["batch_stats"]

    def test_train_output_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.normal(2.0, 3.0, size=(16, 3, 3, 5)).astype(np.float32)
        out, stats = self._bn_forward(jnp.asarray(x))

        tbn = torch.nn.BatchNorm2d(5, eps=1e-3, affine=False)
        tbn.train()
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tout = tbn(tx).detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(out, tout, atol=2e-3)

    def test_ema_update_matches_tf_decay_convention(self):
        # flax momentum == tf-slim decay: ema' = decay*ema + (1-decay)*batch
        rng = np.random.default_rng(1)
        x = rng.normal(5.0, 2.0, size=(64, 1, 1, 4)).astype(np.float32)
        _, stats = self._bn_forward(jnp.asarray(x), momentum=0.9)
        batch_mean = x.reshape(-1, 4).mean(axis=0)
        expected_mean = 0.9 * 0.0 + 0.1 * batch_mean
        np.testing.assert_allclose(np.asarray(stats["BatchNorm_0"]["mean"]),
                                   expected_mean, rtol=1e-5)

    def test_running_variance_is_bessel_corrected_like_tf_and_torch(self):
        """TF's fused_batch_norm (and torch) feed the EMA the BESSEL-
        corrected batch variance while normalizing with the biased one —
        flax's BatchNorm does not, which drifted running stats ~1% from the
        reference over a run (scripts/train_parity.py measured it)."""
        rng = np.random.default_rng(2)
        x = rng.normal(1.0, 2.0, size=(16, 3, 3, 5)).astype(np.float32)
        _, stats = self._bn_forward(jnp.asarray(x), momentum=0.9)

        tbn = torch.nn.BatchNorm2d(5, eps=1e-3, affine=False, momentum=0.1)
        tbn.train()
        tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(np.asarray(stats["BatchNorm_0"]["var"]),
                                   tbn.running_var.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(stats["BatchNorm_0"]["mean"]),
                                   tbn.running_mean.numpy(), rtol=1e-4,
                                   atol=1e-6)

    def test_dense_running_stats_match_torch_batchnorm1d(self):
        """The dense (2-D input) path must carry the same Bessel semantics
        (real slim routes 2-D inputs through the fused kernel)."""
        rng = np.random.default_rng(3)
        x = rng.normal(0.5, 1.5, size=(16, 6)).astype(np.float32)
        _, stats = self._bn_forward(jnp.asarray(x), momentum=0.9)

        tbn = torch.nn.BatchNorm1d(6, eps=1e-3, affine=False, momentum=0.1)
        tbn.train()
        tbn(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(stats["BatchNorm_0"]["var"]),
                                   tbn.running_var.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(stats["BatchNorm_0"]["mean"]),
                                   tbn.running_mean.numpy(), rtol=1e-4,
                                   atol=1e-6)


class TestSlimConvOrdering:
    def test_bn_applied_before_activation(self):
        """conv(no bias) -> BN -> activation: with a negative-shifting input,
        activation-after-BN differs from BN-after-activation."""
        x = jnp.asarray(np.random.default_rng(0).normal(
            -5.0, 1.0, size=(32, 3, 3, 4)).astype(np.float32))
        layer = SlimConv(8, 1, use_batch_norm=True, bn_momentum=0.9,
                         activation=jax.nn.relu)
        variables = layer.init(jax.random.key(0), x, train=True)
        out, _ = layer.apply(variables, x, train=True, mutable=["batch_stats"])
        out = np.asarray(out)
        # BN normalizes to ~zero mean before relu, so roughly half the
        # activations are exactly zero and the rest positive
        frac_zero = (out == 0).mean()
        assert 0.3 < frac_zero < 0.7
        assert out.min() == 0.0  # relu came last

    def test_conv_has_no_bias_under_bn(self):
        x = jnp.zeros((2, 3, 3, 4))
        layer = SlimConv(8, 1, use_batch_norm=True)
        variables = layer.init(jax.random.key(0), x, train=True)
        assert "bias" not in variables["params"]["Conv_0"]


class TestAugmentationQuirks:
    def _rotation_counts(self, n=2048):
        """Distribution of per-example rotations over a batch."""
        patches = jnp.tile(jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3, 1),
                           (n, 1, 1, 1))
        info = AugmentationInfo(perform_rotation_augmentation=True)
        out = np.asarray(augment_batch(patches, jax.random.key(0), info))
        base = np.arange(9, dtype=np.float32).reshape(3, 3)
        variants = {0: base, 1: np.rot90(base, 1), 2: np.rot90(base, 2),
                    3: np.rot90(base, 3)}
        counts = {kind: 0 for kind in variants}
        for i in range(n):
            for kind, v in variants.items():
                if np.allclose(out[i, :, :, 0], v):
                    counts[kind] += 1
                    break
        return counts

    def test_rotation_never_270_degrees(self):
        counts = self._rotation_counts()
        assert counts[3] == 0  # reference quirk: uniform(0,3) -> never 270
        assert counts[0] > 0 and counts[1] > 0 and counts[2] > 0

    def test_spectral_deltas_only_negative(self):
        patches = jnp.ones((256, 1, 1, 8))
        info = AugmentationInfo(perform_spectral_augmentation=0.1)
        out = np.asarray(augment_batch(patches, jax.random.key(0), info))
        assert (out <= 1.0).all()       # only negative deltas (reference quirk)
        assert (out < 1.0).any()
        assert (out >= 0.9 - 1e-6).all()

    def test_shadow_threshold_rate(self):
        patches = jnp.ones((4096, 1, 1, 4))
        from hypelcnn_tpu.data.augmentation import ShadowOps
        info = AugmentationInfo(
            shadow_struct=ShadowOps(shadow_fn=lambda p: p * 0.0),
            perform_shadow_augmentation=True,
            augmentation_random_threshold=0.25)
        out = np.asarray(augment_batch(patches, jax.random.key(0), info))
        shadowed_frac = (out.reshape(4096, -1).sum(axis=1) == 0).mean()
        assert shadowed_frac == pytest.approx(0.25, abs=0.03)
