"""GAN subsystem tests: networks, losses, trainers, samplers, validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypelcnn_tpu.gan.losses import (
    least_squares_discriminator_loss,
    least_squares_generator_loss,
    nce_loss,
)
from hypelcnn_tpu.gan.models import (
    ShadowDiscriminator,
    ShadowFeatureDiscriminator,
    ShadowGenerator,
)
from hypelcnn_tpu.gan.sampling import DummySampler, RandomBasedSampler, read_hsi_data
from hypelcnn_tpu.gan.validation import (
    BestRatioHolder,
    compute_ratio_stats,
    divergence_for_ratios,
)
from hypelcnn_tpu.gan.wrapper_registry import get_sampling_map, get_trainer_dict
from hypelcnn_tpu.gan.wrappers.base import PoolState, pool_apply

BANDS = 12


def rand_pixels(key, n=4):
    return jax.random.uniform(jax.random.key(key), (n, 1, 1, BANDS))


class TestNetworks:
    def test_generator_zero_at_init(self):
        # zero-init conv weights + tanh final => output exactly 0 at init
        gen = ShadowGenerator(band_size=BANDS)
        x = rand_pixels(0)
        params = gen.init(jax.random.key(1), x)["params"]
        out = gen.apply({"params": params}, x)
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_generator_encoder_only(self):
        gen = ShadowGenerator(band_size=BANDS)
        x = rand_pixels(0)
        params = gen.init(jax.random.key(1), x)["params"]
        enc = gen.apply({"params": params}, x, encoder_only=True)
        assert enc.shape == x.shape
        # with zero conv weights the dense residuals sum to 5*x
        np.testing.assert_allclose(np.asarray(enc), 5 * np.asarray(x), rtol=1e-5)

    def test_discriminator_shape(self):
        disc = ShadowDiscriminator(band_size=BANDS)
        x = rand_pixels(0)
        params = disc.init(jax.random.key(2), x, x)["params"]
        out = disc.apply({"params": params}, x, x)
        assert out.shape == (4, 1, 1, BANDS // 2)

    def test_feature_discriminator_shape(self):
        featd = ShadowFeatureDiscriminator(band_size=BANDS, patch_count=3,
                                           embedded_feature_size=2)
        x = rand_pixels(0)
        params = featd.init(jax.random.key(3), x)["params"]
        out = featd.apply({"params": params}, x)
        assert out.shape == (4, 3, 2)


class TestLosses:
    def test_ls_losses(self):
        perfect = jnp.ones((4, 8))
        assert float(least_squares_generator_loss(perfect)) == 0.0
        fooled = jnp.zeros((4, 8))
        assert float(least_squares_generator_loss(fooled)) == 0.5
        assert float(least_squares_discriminator_loss(perfect, fooled)) == 0.0

    def test_nce_prefers_aligned_embeddings(self):
        key = jax.random.key(0)
        q = jax.random.normal(key, (4, 6, 3))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        aligned = float(nce_loss(q, q, tau=0.07))
        shuffled = float(nce_loss(q, jnp.roll(q, 1, axis=1), tau=0.07))
        assert aligned < shuffled

    def test_nce_gradient_matches_tf_fused_op(self):
        """TF's SoftmaxCrossEntropyWithLogits hardcodes backward
        ``softmax - labels`` even for the reference's flattened identity
        labels (which sum to P, not 1) — so the gradient the reference
        trains with is NOT the autodiff gradient of the loss value.
        Golden values from tf.gradients on TF 2.x (see
        hypelcnn_tpu/gan/losses.py `_tf_softmax_ce`); autodiffing the value
        expression instead gives max|delta| ~ 2 on this input.
        """
        q_in = jnp.asarray([
            [[0.304717093706131, -1.039984107017517],
             [0.7504512071609497, 0.9405646920204163],
             [-1.9510351419448853, -1.3021794557571411]],
            [[0.12784039974212646, -0.31624260544776917],
             [-0.01680115796625614, -0.8530439138412476],
             [0.879397988319397, 0.7777919173240662]]], jnp.float32)
        k_in = jnp.asarray([
            [[0.06603069603443146, 1.1272412538528442],
             [0.46750932931900024, -0.8592924475669861],
             [0.36875078082084656, -0.9588826298713684]],
            [[0.8784502744674683, -0.04992591217160225],
             [-0.18486236035823822, -0.6809295415878296],
             [1.222541332244873, -0.15452948212623596]]], jnp.float32)
        tf_loss = 41.40254211425781
        tf_grad_q = np.asarray([
            [[1.1443290710449219, -11.875170707702637],
             [-3.1383323669433594, 9.56950855255127],
             [-2.6336498260498047, 6.848425388336182]],
            [[-6.27443790435791, 0.35650214552879333],
             [1.3142067193984985, 4.840577602386475],
             [-0.14161643385887146, 0.035571884363889694]]], np.float32)
        tf_grad_k = np.asarray([
            [[0.10807792097330093, 10.29185676574707],
             [-5.036624908447266, -7.823290824890137],
             [14.859378814697266, 6.1436591148376465]],
            [[-0.6588402986526489, 2.483766555786133],
             [0.11945193260908127, 6.0640692710876465],
             [-0.28457388281822205, -0.2517927289009094]]], np.float32)

        loss, (gq, gk) = jax.value_and_grad(
            lambda a, b: nce_loss(a, b, tau=0.07), argnums=(0, 1))(q_in, k_in)
        np.testing.assert_allclose(float(loss), tf_loss, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gq), tf_grad_q, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), tf_grad_k, rtol=1e-4,
                                   atol=1e-5)


class TestPool:
    def test_fill_phase_passthrough(self):
        pool = PoolState.create(8, (1, 1, BANDS))
        x = rand_pixels(0)
        new_pool, out, _ = pool_apply(pool, x, x, jax.random.key(1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))
        assert int(new_pool.count) == 4

    def test_full_pool_swaps_sometimes(self):
        pool = PoolState.create(4, (1, 1, BANDS))
        x0 = rand_pixels(0)
        pool, _, _ = pool_apply(pool, x0, x0, jax.random.key(1))
        assert int(pool.count) == 4
        x1 = rand_pixels(2)
        outs = []
        for i in range(5):
            pool, out, _ = pool_apply(pool, x1, x1, jax.random.key(10 + i))
            outs.append(np.asarray(out))
        assert any(not np.allclose(o, np.asarray(x1)) for o in outs)


CONFIG = {"generator_lr": 2e-4, "discriminator_lr": 1e-4, "gen_discriminator_lr": 1e-4,
          "use_identity_loss": True, "identity_loss_weight": 0.5,
          "cycle_consistency_loss_weight": 10.0, "nce_loss_weight": 10.0,
          "tau": 0.07, "patches": 3, "embedded_feat_size": 2,
          "discriminator_reg_scale": 1e-5, "gen_disc_reg_scale": 1e-4}


@pytest.mark.parametrize("gan_type", ["gan_x2y", "gan_y2x", "cycle_gan",
                                      "cut_x2y", "cut_y2x", "dcl_gan", "dcl_cycle_gan"])
def test_trainer_steps(gan_type):
    trainer = get_trainer_dict(CONFIG, BANDS, max_steps=10)[gan_type]
    state = trainer.init_state(jax.random.key(0))
    x, y = rand_pixels(1), rand_pixels(2) * 0.5
    for i in range(2):
        state, metrics = trainer.train_step(state, x, y, jax.random.key(10 + i))
    assert int(state.step) == 2
    for name, value in metrics.items():
        assert np.isfinite(float(value)), f"{gan_type} {name} not finite"
    # the training loop's scan output keys on this for every trainer type
    # (apps/gan_train_for_shadow.py one_step) — DCL once lacked it
    assert "generator_loss" in metrics
    out = trainer.translate(jax.device_get(state.params), x, is_shadow=True)
    assert out.shape == x.shape
    # patch translation folds spatial cells into the batch
    patch = jax.random.uniform(jax.random.key(5), (2, 3, 3, BANDS))
    out_patch = trainer.translate(jax.device_get(state.params), patch, is_shadow=False)
    assert out_patch.shape == patch.shape


def test_translate_scene_matches_direct_translate_across_block_boundary():
    """translate_scene (one lax.map dispatch, pad + unpad) must equal the
    plain batched translate bit-for-bit — including pixels straddling block
    boundaries and a non-divisible tail."""
    trainer = get_trainer_dict(CONFIG, BANDS, max_steps=10)["cycle_gan"]
    state = trainer.init_state(jax.random.key(0))
    params = jax.device_get(state.params)
    h, w = 7, 11  # 77 px over block=16 -> 5 blocks with a 3-px pad tail
    scene = np.asarray(jax.random.uniform(jax.random.key(3), (h, w, BANDS)),
                       dtype=np.float32)
    swept = trainer.translate_scene(params, scene, True, block=16)
    direct = np.asarray(trainer.translate(
        params, scene.reshape(-1, 1, 1, BANDS), True)).reshape(h, w, BANDS)
    np.testing.assert_array_equal(swept, direct)


class TestSampling:
    def test_random_sampler_counts_and_alignment(self, synthetic_loader):
        scene = synthetic_loader.load_data(neighborhood=0, normalize=True)
        shadow_map, _ = synthetic_loader.load_shadow_map(0, scene)
        normal, shadow = RandomBasedSampler(True).get_sample_pairs(
            scene, synthetic_loader, shadow_map)
        assert normal.shape == shadow.shape
        assert normal.shape[1:] == tuple(scene.get_data_shape())
        # shadow samples come from the shadow region (left third has distinct values)
        sm = shadow_map
        n_shadow_px = int(sm.sum())
        assert shadow.shape[0] >= n_shadow_px

    def test_read_hsi_data_trims_to_casi(self, synthetic_loader):
        scene = synthetic_loader.load_data(neighborhood=0, normalize=True)
        shadow_map, _ = synthetic_loader.load_shadow_map(0, scene)
        normal, shadow = read_hsi_data(synthetic_loader, scene, shadow_map,
                                       "dummy", get_sampling_map())
        assert normal.shape[3] == scene.get_casi_band_count()

    def test_dummy_sampler(self, synthetic_loader):
        scene = synthetic_loader.load_data(neighborhood=0, normalize=True)
        normal, shadow = DummySampler(10, 0.5, 2).get_sample_pairs(scene, None, None)
        np.testing.assert_allclose(shadow, 0.5)
        np.testing.assert_allclose(normal, 1.0)


class TestValidation:
    def test_best_ratio_holder_sorted(self):
        h = BestRatioHolder(3)
        for it, d in [(1, 0.5), (2, 0.1), (3, 0.9), (4, 0.05)]:
            h.add_point(it, d)
        assert h.get_best_diver() == 0.05
        assert len(h.data_holder) == 3
        assert [p[0] for p in h.data_holder] == [4, 2, 1]

    def test_common_iterations(self):
        h1, h2 = BestRatioHolder(5), BestRatioHolder(5)
        h1.add_point(10, 0.1)
        h1.add_point(20, 0.2)
        h2.add_point(20, 0.25)
        h2.add_point(30, 0.3)
        common = BestRatioHolder.create_common_iterations(h1, h2)
        assert [p[0] for p in common.data_holder] == [20]

    def test_perfect_generator_zero_divergence(self):
        originals = np.random.default_rng(0).uniform(0.5, 1.0, (16, 1, 1, BANDS)
                                                     ).astype(np.float32)
        ratio = np.full((BANDS,), 2.0, dtype=np.float32)
        generated = originals / ratio  # exactly shadow = lit / ratio
        _, mean, _, div_mean, _ = compute_ratio_stats(generated, originals, ratio)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-5)
        assert div_mean < 1e-6

    def test_divergence_increases_with_error(self):
        good = divergence_for_ratios(np.full(12, 1.05))
        bad = divergence_for_ratios(np.full(12, 2.0))
        assert bad > good


def test_dcl_cycle_fix_advances_gen_schedule_once_per_step():
    """The apply_cycle_loss_fix extra update must use its OWN optimizer
    state: reusing the unit's gen state advanced the LR schedule count twice
    per global step, finishing the decay at half the horizon."""
    config = dict(CONFIG, apply_cycle_loss_fix=True)
    trainer = get_trainer_dict(config, BANDS, max_steps=100)["dcl_cycle_gan"]
    state = trainer.init_state(jax.random.key(0))
    assert "cycle_gen" in state.opt_states["x2y"]
    x, y = rand_pixels(1), rand_pixels(2) * 0.5
    for i in range(3):
        state, metrics = trainer.train_step(state, x, y, jax.random.key(7 + i))
    assert "cycle_loss" in metrics

    def schedule_count(opt_state):
        counts = [int(leaf) for leaf in jax.tree.leaves(opt_state)
                  if getattr(leaf, "ndim", None) == 0
                  and jnp.issubdtype(leaf.dtype, jnp.integer)]
        assert counts
        return max(counts)

    assert schedule_count(state.opt_states["x2y"]["gen"]) == 3
    assert schedule_count(state.opt_states["x2y"]["cycle_gen"]) == 3


class TestToeplitzGenerator:
    """impl="toeplitz" == impl="conv": same param tree, same outputs
    (VERDICT r2 item 5 — the GAN-step fusion experiment)."""

    def test_same_params_same_outputs(self):
        conv_gen = ShadowGenerator(band_size=BANDS)
        toe_gen = ShadowGenerator(band_size=BANDS, impl="toeplitz")
        x = jnp.asarray(np.random.default_rng(0)
                        .uniform(0, 1, (5, 1, 1, BANDS)).astype(np.float32))
        variables = conv_gen.init(jax.random.key(0), x)
        # zero-init generator gives zero outputs; randomize the params
        variables = jax.tree.map(
            lambda a: jnp.asarray(np.random.default_rng(a.size)
                                  .normal(0, 0.3, a.shape).astype(np.float32)),
            variables)
        # identical trees: the toeplitz path declares nn.Conv's exact layout
        assert jax.tree.map(jnp.shape, toe_gen.init(jax.random.key(0), x)) == \
            jax.tree.map(jnp.shape, variables)
        for enc in (False, True):
            np.testing.assert_allclose(
                np.asarray(conv_gen.apply(variables, x, encoder_only=enc)),
                np.asarray(toe_gen.apply(variables, x, encoder_only=enc)),
                rtol=2e-5, atol=2e-5)

    def test_trainer_with_fused_generator_steps(self):
        config = dict(CONFIG, fused_generator=True)
        trainer = get_trainer_dict(config, BANDS, max_steps=10)["cycle_gan"]
        state = trainer.init_state(jax.random.key(0))
        x, y = rand_pixels(1), rand_pixels(2) * 0.5
        state, metrics = trainer.train_step(state, x, y, jax.random.key(3))
        assert np.isfinite(float(metrics["generator_loss"]))
