"""Unit tests for scene handling, gather ops, and splitters — replacing the
reference's absent test suite per SURVEY.md §4's proposed pyramid."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypelcnn_tpu.data.scene import DualResScene, Scene
from hypelcnn_tpu.data.splitters import (
    read_targets_from_image,
    shuffle_test_data_using_ratio,
    shuffle_training_data_using_ratio,
    shuffle_training_data_using_size,
)
from hypelcnn_tpu.ops.window_gather import gather_patches_pallas, gather_patches_xla


def make_scene(h=10, w=14, bands=4, neighborhood=2, normalize=True, seed=0):
    rng = np.random.default_rng(seed)
    casi = rng.uniform(0, 1000, size=(h, w, bands)).astype(np.float32)
    lidar = rng.uniform(0, 50, size=(h, w, 1)).astype(np.float32)
    return Scene(casi=casi, lidar=lidar, neighborhood=neighborhood, normalize=normalize), casi, lidar


class TestScene:
    def test_shapes(self):
        scene, _, _ = make_scene(neighborhood=2)
        assert scene.get_data_shape() == [5, 5, 5]
        assert scene.get_scene_shape() == [10, 14]
        assert scene.get_casi_band_count() == 4

    def test_normalization_range(self):
        scene, _, _ = make_scene()
        assert np.isclose(scene.casi.min(), 0)
        assert np.isclose(scene.casi.max(), 1)
        assert np.isclose(scene.lidar.min(), 0)
        assert np.isclose(scene.lidar.max(), 1)

    def test_symmetric_padding_matches_numpy(self):
        scene, casi, _ = make_scene(normalize=False)
        expected = np.pad(casi, ((2, 2), (2, 2), (0, 0)), mode="symmetric")
        np.testing.assert_allclose(scene.casi, expected)

    def test_injected_normalization_stats(self):
        _, casi, lidar = make_scene(normalize=False)
        base = Scene(casi=casi.copy(), lidar=lidar.copy(), neighborhood=0, normalize=True)
        alt = Scene(casi=casi.copy() * 0.5, lidar=lidar.copy(), neighborhood=0, normalize=True,
                    casi_min=base.casi_min, casi_max=base.casi_max)
        assert np.all(np.asarray(alt.casi_max) == np.asarray(base.casi_max))

    def test_get_data_point_concat_order(self):
        scene, _, _ = make_scene()
        patch = scene.get_data_point(3, 4)
        assert patch.shape == (5, 5, 5)
        np.testing.assert_allclose(patch[:, :, :4], scene.casi[4:9, 3:8, :])
        np.testing.assert_allclose(patch[:, :, 4:], scene.lidar[4:9, 3:8, :])


class TestWindowGather:
    def test_xla_matches_host_gather(self):
        scene, _, _ = make_scene()
        coords = np.array([[0, 0], [3, 4], [9, 5], [13, 9]], dtype=np.int32)
        got = np.asarray(gather_patches_xla(scene.device_scene(), jnp.asarray(coords), 5))
        for i, (x, y) in enumerate(coords):
            np.testing.assert_allclose(got[i], scene.get_data_point(x, y), rtol=1e-6)

    def test_pallas_interpret_matches_xla(self):
        scene, _, _ = make_scene()
        coords = jnp.asarray(np.array([[1, 2], [5, 5], [0, 9]], dtype=np.int32))
        dev = scene.device_scene()
        xla = gather_patches_xla(dev, coords, 5)
        pal = gather_patches_pallas(dev, coords, 5, interpret=True)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(xla), rtol=1e-6)

    def test_dual_res_matches_host(self):
        rng = np.random.default_rng(1)
        n = 2
        casi = rng.uniform(size=(20, 24, 3)).astype(np.float32)
        lidar = rng.uniform(size=(20, 24, 1)).astype(np.float32)
        scene = DualResScene(casi=casi, lidar=lidar, neighborhood=n, normalize=False)
        coords = np.array([[4, 6], [7, 3], [10, 10]], dtype=np.int32)
        got = np.asarray(scene.gather_batch(jnp.asarray(coords)))
        for i, (x, y) in enumerate(coords):
            np.testing.assert_allclose(got[i], scene.get_data_point(x, y), rtol=1e-6)


class TestSplitters:
    def make_targets(self):
        gt = np.zeros((20, 20), dtype=np.uint8)
        gt[:] = 255
        gt[:10, :10] = 0
        gt[:10, 10:] = 1
        gt[10:, :10] = 2
        return gt

    def test_read_targets(self):
        gt = self.make_targets()
        rows = read_targets_from_image(gt, range(0, 3))
        assert rows.shape == (300, 3)
        # (x, y, class) convention
        r = rows[rows[:, 2] == 1]
        assert r[:, 0].min() >= 10 and r[:, 1].max() < 10

    def test_ratio_split_stratified(self):
        rows = read_targets_from_image(self.make_targets(), range(0, 3))
        train, val = shuffle_training_data_using_ratio(rows, 0.5)
        assert train.shape[0] == 150 and val.shape[0] == 150
        for c in range(3):
            assert (train[:, 2] == c).sum() == 50

    def test_size_split_with_overflow(self):
        rows = read_targets_from_image(self.make_targets(), range(0, 3))
        np.random.seed(0)
        train, val = shuffle_training_data_using_size(range(0, 3), rows, 60, None)
        assert (train[:, 2] == 0).sum() == 60
        assert (val[:, 2] == 0).sum() == 40

    def test_size_split_overflow_fallback_90pct(self):
        rows = read_targets_from_image(self.make_targets(), range(0, 3))
        np.random.seed(0)
        train, _ = shuffle_training_data_using_size(range(0, 3), rows, 200, None)
        assert (train[:, 2] == 0).sum() == 90  # 100 * 9 // 10

    def test_size_split_validation_clamp_persists_across_classes(self):
        """Reference quirk (common_nn_ops.py:524-526): the validation quota
        is REASSIGNED when clamped, so a small class permanently shrinks the
        quota for every later class."""
        # class 0: 10 samples, class 1: 100 samples
        rows = np.array([[i, 0, 0] for i in range(10)]
                        + [[i, 1, 1] for i in range(100)], dtype=int)
        np.random.seed(0)
        train, val = shuffle_training_data_using_size(range(0, 2), rows, 5, 50)
        # class 0: train 5, remainder 5 -> clamp 50 -> 5 (and the quota
        # itself becomes 5); class 1: remainder 95 but quota is now 5
        assert (val[:, 2] == 0).sum() == 5
        assert (val[:, 2] == 1).sum() == 5

    def test_test_split_deterministic(self):
        rows = read_targets_from_image(self.make_targets(), range(0, 3))
        t1, tr1 = shuffle_test_data_using_ratio(rows.copy(), 0.1)
        t2, tr2 = shuffle_test_data_using_ratio(rows.copy(), 0.1)
        np.testing.assert_array_equal(t1, t2)  # random_state=0 parity
        assert t1.shape[0] == 30

    def test_zero_test_ratio(self):
        rows = read_targets_from_image(self.make_targets(), range(0, 3))
        test, train = shuffle_test_data_using_ratio(rows, 0.0)
        assert test.shape[0] == 0 and train.shape[0] == 300

    def test_pallas_chunked_large_batch_and_ragged(self):
        # the round-2 kernel refused batch > 512 (scalar-prefetch SMEM cap);
        # the chunked-SMEM round-3 kernel has no limit and handles batches
        # that don't divide the chunk
        scene, _, _ = make_scene()
        dev = scene.device_scene()
        rng = np.random.default_rng(3)
        for batch in (700, 129):
            coords = jnp.asarray(np.stack(
                [rng.integers(0, 10, batch), rng.integers(0, 10, batch)],
                axis=1).astype(np.int32))
            np.testing.assert_allclose(
                np.asarray(gather_patches_pallas(dev, coords, 5, interpret=True)),
                np.asarray(gather_patches_xla(dev, coords, 5)), rtol=1e-6)
