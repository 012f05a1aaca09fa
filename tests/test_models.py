"""Golden shape/loss tests for each model family on fixed seeds (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypelcnn_tpu.models import CAPModel, CONCNNModel, DUALCNNModel, HYPELCNNModel
from hypelcnn_tpu.ops.nn import local_response_normalization, scale_in_to_out, squash

CLASSES = 5


def init_and_apply(model, x, train, algorithm_params=None, labels=None):
    params = {**model.default_params(), **(algorithm_params or {})}
    module = model.create_module(CLASSES, params)
    if labels is None:
        labels = jax.nn.one_hot(jnp.zeros((x.shape[0],), jnp.int32), CLASSES)
    variables = module.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                            x, labels=labels, train=train)
    out, _ = module.apply(variables, x, labels=labels, train=train,
                          rngs={"dropout": jax.random.key(2)},
                          mutable=["batch_stats"])
    return module, variables, out


class TestHYPELCNN:
    def test_forward_shapes_and_loss(self):
        model = HYPELCNNModel()
        x = jax.random.uniform(jax.random.key(3), (4, 3, 3, 12))
        _, _, out = init_and_apply(model, x, train=True,
                                   algorithm_params={"filter_count": 32})
        assert out.y_conv.shape == (4, CLASSES)
        assert out.image_output is not None
        assert out.image_output.shape == (4, 3 * 3 * 12)
        labels = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), CLASSES)
        loss = model.loss(out, labels)
        assert loss.shape == (4,)
        assert np.isfinite(np.asarray(loss)).all()

    def test_eval_has_no_decoder(self):
        model = HYPELCNNModel()
        x = jax.random.uniform(jax.random.key(3), (2, 3, 3, 12))
        _, _, out = init_and_apply(model, x, train=False,
                                   algorithm_params={"filter_count": 32})
        assert out.image_output is None
        assert out.y_conv.shape == (2, CLASSES)

    def test_no_residual_variant(self):
        model = HYPELCNNModel()
        x = jax.random.uniform(jax.random.key(3), (2, 1, 1, 8))
        _, _, out = init_and_apply(model, x, train=False,
                                   algorithm_params={"filter_count": 32, "use_residual": False})
        assert out.y_conv.shape == (2, CLASSES)


class TestDUALCNN:
    def test_forward(self):
        model = DUALCNNModel()
        x = jax.random.uniform(jax.random.key(4), (3, 5, 5, 13))
        _, _, out = init_and_apply(model, x, train=True,
                                   algorithm_params={"filter_count": 64})
        assert out.y_conv.shape == (3, CLASSES)
        assert out.image_output is None

    def test_1x1_patch_no_crop(self):
        model = DUALCNNModel()
        x = jax.random.uniform(jax.random.key(4), (2, 1, 1, 13))
        _, _, out = init_and_apply(model, x, train=False,
                                   algorithm_params={"filter_count": 64})
        assert out.y_conv.shape == (2, CLASSES)


class TestCONCNN:
    def test_forward(self):
        model = CONCNNModel()
        x = jax.random.uniform(jax.random.key(5), (2, 5, 5, 9))
        _, _, out = init_and_apply(model, x, train=True,
                                   algorithm_params={"filter_count": 16})
        assert out.y_conv.shape == (2, CLASSES)


class TestCAP:
    def test_forward_and_decoder(self):
        model = CAPModel()
        x = jax.random.uniform(jax.random.key(6), (2, 3, 3, 9))
        labels = jax.nn.one_hot(jnp.array([1, 2]), CLASSES)
        _, _, out = init_and_apply(model, x, train=True,
                                   algorithm_params={"feature_count": 16,
                                                     "primary_capsule_count": 4},
                                   labels=labels)
        assert out.y_conv.shape == (2, CLASSES)
        assert out.image_output is not None
        assert out.image_output.shape == (2, 3 * 3 * 9)
        # capsule norms are non-negative
        assert np.all(np.asarray(out.y_conv) >= 0)

    def test_eval_no_decoder(self):
        model = CAPModel()
        x = jax.random.uniform(jax.random.key(6), (2, 1, 1, 9))
        _, _, out = init_and_apply(model, x, train=False,
                                   algorithm_params={"feature_count": 16,
                                                     "primary_capsule_count": 4})
        assert out.image_output is None

    def test_digitcaps_init_uses_per_capsule_fan(self):
        """Init parity (reference CAPModel.py:73-78): each capsule's weight
        is an independent xavier draw over fan_in=pco — the capsule axis
        must NOT enlarge the initializer's receptive field (which would
        shrink std by ~sqrt(data_size))."""
        model = CAPModel()
        x = jax.random.uniform(jax.random.key(6), (2, 3, 3, 9))
        _, variables, _ = init_and_apply(model, x, train=False,
                                         algorithm_params={"feature_count": 16,
                                                           "primary_capsule_count": 4})
        w = np.asarray(variables["params"]["digitcaps_w"])
        data_size, pco, out_dim = w.shape
        # xavier_uniform: std = sqrt(2 / (fan_in + fan_out)) with the
        # per-capsule fans, independent of data_size
        expected_std = np.sqrt(2.0 / (pco + out_dim))
        assert 0.7 * expected_std < w.std() < 1.3 * expected_std, \
            (w.std(), expected_std)


class TestOps:
    def test_scale_in_to_out_repeat(self):
        x = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 1, 6)
        out_ref = jnp.zeros((1, 1, 1, 12))
        r = scale_in_to_out(x, out_ref, axis=-1)
        assert r.shape[-1] == 12
        np.testing.assert_allclose(np.asarray(r[0, 0, 0, :2]), [0, 0])

    def test_scale_in_to_out_gather(self):
        x = jnp.arange(10, dtype=jnp.float32).reshape(1, 10)
        out_ref = jnp.zeros((1, 3))
        r = scale_in_to_out(x, out_ref, axis=-1)
        # nearest index: round(i * 10/3) -> 0, 3, 7
        np.testing.assert_allclose(np.asarray(r)[0], [0, 3, 7])

    def test_scale_in_to_out_identity(self):
        x = jnp.ones((2, 4))
        assert scale_in_to_out(x, jnp.zeros((2, 4)), axis=-1) is x

    def test_lrn_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(2, 3, 3, 16)).astype(np.float32)
        got = np.asarray(local_response_normalization(jnp.asarray(x)))
        # brute force TF semantics
        expected = np.empty_like(x)
        r, bias, alpha, beta = 5, 1.0, 1.0, 0.5
        for c in range(16):
            lo, hi = max(0, c - r), min(16, c + r + 1)
            s = (x[..., lo:hi] ** 2).sum(axis=-1)
            expected[..., c] = x[..., c] / np.power(bias + alpha * s, beta)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_squash_mean_variant(self):
        s = jnp.array([[3.0, 4.0]])
        v = np.asarray(squash(s))
        norm_sq = (9 + 16) / 2
        expected = norm_sq * np.array([3.0, 4.0]) / ((1 + norm_sq) * np.sqrt(norm_sq + 1e-9))
        np.testing.assert_allclose(v[0], expected, rtol=1e-6)


class TestFusedLevels:
    """FusedMultiScaleLevel == the parallel-branch level, weight-for-weight."""

    def _equiv(self, model, x, algorithm_params):
        from hypelcnn_tpu.models.layers import fuse_variables
        labels = jax.nn.one_hot(jnp.zeros((x.shape[0],), jnp.int32), CLASSES)
        unfused = model.create_module(CLASSES, {**model.default_params(),
                                                **algorithm_params})
        fused = model.create_module(CLASSES, {**model.default_params(),
                                              **algorithm_params,
                                              "fuse_level_convs": True})
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
        v_unfused = unfused.init(rngs, x, labels=labels, train=True)
        v_fused = fuse_variables(v_unfused)
        # structural check vs a fresh fused init
        ref_shapes = jax.tree.map(jnp.shape, fused.init(rngs, x, labels=labels,
                                                        train=True))
        assert jax.tree.map(jnp.shape, v_fused) == ref_shapes

        # training mode: logits + decoder + mutated batch stats all match
        out_u, mut_u = unfused.apply(v_unfused, x, labels=labels, train=True,
                                     rngs={"dropout": jax.random.key(2)},
                                     mutable=["batch_stats"])
        out_f, mut_f = fused.apply(v_fused, x, labels=labels, train=True,
                                   rngs={"dropout": jax.random.key(2)},
                                   mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_u.y_conv),
                                   np.asarray(out_f.y_conv),
                                   rtol=2e-5, atol=2e-5)
        if "batch_stats" in mut_u:
            fused_mut = fuse_variables({"params": v_unfused["params"],
                                        "batch_stats": mut_u["batch_stats"]})
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
                fused_mut["batch_stats"], dict(mut_f["batch_stats"]))
            v_unfused = {"params": v_unfused["params"],
                         "batch_stats": mut_u["batch_stats"]}
            v_fused = fused_mut

        # eval mode with accumulated running stats
        out_u2 = unfused.apply(v_unfused, x, labels=labels, train=False)
        out_f2 = fused.apply(v_fused, x, labels=labels, train=False)
        np.testing.assert_allclose(np.asarray(out_u2.y_conv),
                                   np.asarray(out_f2.y_conv),
                                   rtol=2e-5, atol=2e-5)

    def test_hypelcnn_fused_equivalence(self):
        x = jax.random.uniform(jax.random.key(7), (4, 5, 5, 12))
        self._equiv(HYPELCNNModel(), x, {"filter_count": 32})

    def test_dualcnn_fused_equivalence(self):
        x = jax.random.uniform(jax.random.key(8), (3, 5, 5, 13))
        self._equiv(DUALCNNModel(), x, {"filter_count": 32})
