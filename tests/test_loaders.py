"""Loader tests against small synthetic dataset directories on disk."""

import numpy as np
import pytest

from hypelcnn_tpu.core.registry import get_loader_from_name
from hypelcnn_tpu.data.loaders.base import LoadingMode
from hypelcnn_tpu.utils.tiff_io import imwrite


@pytest.fixture(scope="module")
def grss2013_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("data13")
    d = base / "2013_DFTC"
    d.mkdir()
    rng = np.random.default_rng(0)
    casi = rng.integers(100, 4000, size=(20, 30, 144)).astype(np.uint16)
    lidar = rng.uniform(0, 30, size=(20, 30)).astype(np.float32)
    imwrite(str(d / "2013_IEEE_GRSS_DF_Contest_CASI.tif"), casi)
    np.save(str(d / "2013_IEEE_GRSS_DF_Contest_LiDAR.npy"), lidar)
    gt = rng.integers(0, 15, size=(20, 30)).astype(np.uint8)
    gt[gt > 12] = 255
    np.save(str(d / "2013_IEEE_GRSS_DF_Contest_Samples_TR.npy"), gt)
    np.save(str(d / "2013_IEEE_GRSS_DF_Contest_Samples_VA.npy"), gt)
    shadow = np.zeros((20, 30), dtype=np.uint8)
    shadow[:, :10] = 1
    np.save(str(d / "shadow_map.npy"), shadow)
    return str(base)


class TestGRSS2013:
    def test_load_data_and_samples(self, grss2013_dir):
        loader = get_loader_from_name("GRSS2013DataLoader", grss2013_dir)
        scene = loader.load_data(neighborhood=1, normalize=True)
        assert scene.get_data_shape() == [3, 3, 145]
        assert scene.get_scene_shape() == [20, 30]
        np.random.seed(0)
        samples = loader.load_samples(0.1, 0.05)
        assert samples.training_targets.shape[0] > 0
        assert samples.validation_targets.shape[0] > 0
        sm, ratio = loader.load_shadow_map(1, scene)
        assert sm.shape == (22, 32)
        assert ratio.shape == (144,)
        assert loader.get_class_count() == range(0, 15)
        assert loader.get_samples_color_list().shape == (15, 3)
        assert loader.get_band_measurements().shape == (144,)


@pytest.fixture(scope="module")
def grss2018_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("data18")
    d = base / "2018_DFTC"
    d.mkdir()
    rng = np.random.default_rng(1)
    casi = rng.integers(100, 4000, size=(40, 50, 50)).astype(np.uint16)
    lidar = rng.uniform(0, 40, size=(80, 100)).astype(np.float32)
    lidar[0, 0] = 500.0  # outlier to zero
    np.save(str(d / "20170218_UH_CASI_S4_NAD83.tiff.npy"), casi)
    np.save(str(d / "UH17c_GEF051.npy"), lidar)
    gt = np.zeros((8, 10), dtype=np.uint8)
    gt[:4, :5] = 1
    gt[4:, 5:] = 2
    np.save(str(d / "2018_IEEE_GRSS_DFC_GT_TR.npy"), gt)
    return str(base)


class TestGRSS2018:
    def test_dual_res_and_offsets(self, grss2018_dir):
        loader = get_loader_from_name("GRSS2018DataLoader", grss2018_dir)
        scene = loader.load_data(neighborhood=2, normalize=True)
        assert scene.get_casi_band_count() == 48  # last 2 bands dropped
        assert float(scene.lidar.max()) <= 1.0
        patch = scene.get_data_point(10, 10)
        assert patch.shape == (5, 5, 49)
        np.random.seed(0)
        samples = loader.load_samples(0.5, 0.0)
        all_targets = np.vstack([samples.training_targets, samples.validation_targets])
        assert all_targets[:, 0].min() >= loader.X_DELTA
        assert all_targets[:, 1].min() >= loader.Y_DELTA
        assert set(all_targets[:, 2]) <= {0, 1}

    def test_device_gather_matches_host(self, grss2018_dir):
        import jax.numpy as jnp
        loader = get_loader_from_name("GRSS2018DataLoader", grss2018_dir)
        scene = loader.load_data(neighborhood=1, normalize=True)
        coords = np.array([[10, 12], [30, 40]], dtype=np.int32)
        got = np.asarray(scene.gather_batch(jnp.asarray(coords)))
        for i, (x, y) in enumerate(coords):
            np.testing.assert_allclose(got[i], scene.get_data_point(x, y), rtol=1e-6)


@pytest.fixture(scope="module")
def gulfport_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("datagp")
    d = base / "GULFPORT"
    d.mkdir()
    rng = np.random.default_rng(2)
    hsi = rng.uniform(0, 1, size=(24, 30, 64)).astype(np.float32)
    lidar = rng.uniform(0, 10, size=(24, 30)).astype(np.float32)
    np.save(str(d / "muulf_hsi.npy"), hsi)
    np.save(str(d / "muulf_lidar.npy"), lidar)
    gt = rng.integers(1, 12, size=(24, 30)).astype(np.uint8)
    np.save(str(d / "muulf_gt.npy"), gt)
    # ALT variant files
    np.save(str(d / "muulf_hsi_shadowed.npy"), hsi * 0.5)
    np.save(str(d / "muulf_hsi_deshadowed.npy"), hsi * 1.5)
    np.save(str(d / "muulf_gt_shadow_corrected.npy"), gt)
    shadow = np.zeros((24, 30), dtype=np.uint8)
    shadow[:, :10] = 1
    np.save(str(d / "muulf_shadow_map.npy"), shadow)
    return str(base)


class TestGULFPORT:
    def test_load_and_gt_shift(self, gulfport_dir):
        loader = get_loader_from_name("GULFPORTDataLoader", gulfport_dir)
        scene = loader.load_data(0, True)
        assert scene.get_casi_band_count() == 64
        np.random.seed(0)
        samples = loader.load_samples(0.5, 0.0)
        assert samples.training_targets[:, 2].min() >= 0
        assert samples.training_targets[:, 2].max() <= 10

    def test_alt_modes(self, gulfport_dir):
        loader = get_loader_from_name("GULFPORTALTDataLoader", gulfport_dir)
        orig = loader.load_data(0, True)

        loader.load_mode = LoadingMode.SHADOWED
        shadowed = loader.load_data(0, True)
        # shadowed variant reuses original normalization stats
        np.testing.assert_allclose(np.asarray(shadowed.casi_max),
                                   np.asarray(orig.casi_max))

        loader.load_mode = LoadingMode.MIXED
        mixed = loader.load_data(0, True)
        from hypelcnn_tpu.data.scene import MultiScene
        assert isinstance(mixed, MultiScene)
        assert len(mixed.scenes) == 4  # 1 original + 3x shadowed weighting

    def test_alt_samples_shadow_split(self, gulfport_dir):
        loader = get_loader_from_name("GULFPORTALTDataLoader", gulfport_dir)
        np.random.seed(0)
        samples = loader.load_samples(0.5, 0.0)
        shadow_map, _ = loader.load_shadow_map(0, None)
        # train targets only from lit area
        lit = shadow_map[samples.training_targets[:, 1], samples.training_targets[:, 0]]
        assert (lit == 0).all()
        assert samples.test_targets.shape[0] == 0

    def test_mixed_scene_device_gather(self, gulfport_dir):
        import jax
        import jax.numpy as jnp
        loader = get_loader_from_name("GULFPORTALTDataLoader", gulfport_dir)
        loader.load_mode = LoadingMode.MIXED
        mixed = loader.load_data(1, True)
        coords = jnp.asarray(np.array([[5, 6], [10, 11]], dtype=np.int32))
        out = mixed.gather_batch(coords, key=jax.random.key(0))
        assert out.shape == (2, 3, 3, 65)

    def test_mixed_scene_dedups_hbm_and_weights_sampling(self, gulfport_dir):
        """The 1:3 original:shadowed weighting must NOT store the shadowed
        scene three times; the weight lives in the lookup table and the
        random draw follows it (~3/4 shadowed)."""
        import jax
        import jax.numpy as jnp
        from hypelcnn_tpu.data.scene import gather_from_multi
        loader = get_loader_from_name("GULFPORTALTDataLoader", gulfport_dir)
        loader.load_mode = LoadingMode.MIXED
        mixed = loader.load_data(0, True)
        stacked, lookup = mixed.device_scenes()
        assert stacked.shape[0] == 2  # unique scenes only (original, shadowed)
        np.testing.assert_array_equal(np.asarray(lookup), [0, 1, 1, 1])

        # sampling follows the 1:3 weight: pick one fixed pixel many times
        coords = jnp.zeros((2000, 2), dtype=jnp.int32) + 5
        patches = gather_from_multi((stacked, lookup), coords, 0,
                                    key=jax.random.key(1))
        ref_orig = np.asarray(stacked[0, 5, 5])
        from_orig = np.isclose(np.asarray(patches[:, 0, 0, :]), ref_orig).all(axis=1)
        frac = from_orig.mean()
        assert 0.19 < frac < 0.31, frac  # expected 0.25

        # no key (eval drains pass a deterministic key; None = member 0)
        p0 = gather_from_multi((stacked, lookup), coords[:4], 0)
        np.testing.assert_allclose(np.asarray(p0[:, 0, 0, :]),
                                   np.tile(ref_orig, (4, 1)), rtol=1e-6)


@pytest.fixture(scope="module")
def avon_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("dataavon")
    d = base / "AVON"
    d.mkdir()
    rng = np.random.default_rng(3)
    # stored as [bands, W, H-ish] then axis-swapped by the loader
    casi = rng.integers(0, 3000, size=(360, 40, 130)).astype(np.uint16)
    np.save(str(d / "0920-1857.georef_cropped.npy"), casi)
    shadow = np.zeros((130 - 110, 40), dtype=np.uint8)  # after trim: 20 x 40
    shadow[:, :10] = 1
    np.save(str(d / "0920-1857.georef_cropped_shadow.npy"), shadow)
    mask1 = np.zeros((130, 40), dtype=bool)
    mask1[60:70, 5:15] = True
    mask2 = np.zeros((130, 40), dtype=bool)
    mask2[58:70, 20:30] = True  # rows must survive the [55:-55] trim
    for name, mask in (("1_nsh", mask1), ("1_sh", mask1), ("2_nsh", mask2), ("2_sh", mask2)):
        np.save(str(d / f"0920-1857.georef_cropped_rgb_with_targets_{name}.bmp.npy"),
                mask)
    return str(base)


class TestAVON:
    def test_band_trim_and_classes(self, avon_dir):
        loader = get_loader_from_name("AVONDataLoader", avon_dir)
        scene = loader.load_data(0, True)
        assert scene.get_casi_band_count() == 360
        assert scene.get_scene_shape() == [20, 40]  # H trimmed by 2*55
        assert scene.lidar is None
        assert loader.get_class_count() == range(0, 2)

    def test_samples_shadow_to_validation(self, avon_dir):
        loader = get_loader_from_name("AVONDataLoader", avon_dir)
        np.random.seed(0)
        samples = loader.load_samples(0.5, 0.0)
        assert samples.training_targets.shape[0] > 0
        assert samples.validation_targets.shape[0] > 0
        assert set(samples.training_targets[:, 2]) <= {0, 1}


class TestDualResTraining:
    def test_trainer_with_dual_res_scene(self, grss2018_dir):
        """End-to-end: the dual-resolution gather rides the jitted train chunk."""
        from hypelcnn_tpu.models import CONCNNModel
        from hypelcnn_tpu.train.trainer import ClassificationTrainer

        loader = get_loader_from_name("GRSS2018DataLoader", grss2018_dir)
        scene = loader.load_data(neighborhood=1, normalize=True)
        np.random.seed(0)
        samples = loader.load_samples(0.5, 0.0)
        params = {"batch_size": 8, "drop_out_ratio": 0.5, "learning_rate": 1e-3,
                  "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
                  "filter_count": 8, "optimizer": "AdamOptimizer"}
        trainer = ClassificationTrainer(
            model=CONCNNModel(), class_count=20, algorithm_params=params,
            scene=scene, sample_set=samples, test_cadence=10 ** 9)
        result = trainer.fit(num_steps=4, batch_size=8, log_every=4)
        assert np.isfinite(result.loss)
