"""Integration tests: training loop, importers, metrics, checkpointing,
full-scene inference — on the 8-device virtual CPU mesh."""

import os

import jax
import numpy as np
import pytest

from hypelcnn_tpu.core.registry import get_importer_from_name
from hypelcnn_tpu.data.augmentation import AugmentationInfo
from hypelcnn_tpu.models import CONCNNModel
from hypelcnn_tpu.parallel.mesh import create_mesh
from hypelcnn_tpu.train.metrics import compute_metrics, confusion_update
from hypelcnn_tpu.train.trainer import ClassificationTrainer, make_epoch_index_stream

PARAMS = {"batch_size": 16, "drop_out_ratio": 0.5, "learning_rate": 1e-3,
          "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
          "filter_count": 8, "optimizer": "AdamOptimizer", "compute_dtype": "float32"}


def make_trainer(synthetic_loader, importer_name="GeneratorImporter", **kw):
    importer = get_importer_from_name(importer_name)
    data = importer.read_data_set("SyntheticDataLoader",
                                  "synthetic://?h=48&w=64&bands=12&classes=5&seed=3",
                                  train_ratio=0.5, test_ratio=0.1, neighborhood=1)
    trainer = ClassificationTrainer(
        model=CONCNNModel(), class_count=data.class_count, algorithm_params=PARAMS,
        scene=data.scene, sample_set=data.sample_set,
        sources=data.sources, data_shape=data.data_shape,
        mesh=create_mesh(), **kw)
    return trainer, data


class TestMetrics:
    def test_confusion_update_masked(self):
        import jax.numpy as jnp
        conf = jnp.zeros((3, 3), dtype=jnp.int32)
        labels = jnp.array([0, 1, 2, 0])
        preds = jnp.array([0, 1, 1, 2])
        mask = jnp.array([1, 1, 1, 0])
        conf = confusion_update(conf, labels, preds, mask)
        expected = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 0]])
        np.testing.assert_array_equal(np.asarray(conf), expected)

    def test_compute_metrics_vs_sklearn(self):
        from sklearn.metrics import balanced_accuracy_score, cohen_kappa_score, confusion_matrix
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 4, 500)
        preds = np.where(rng.random(500) < 0.7, labels, rng.integers(0, 4, 500))
        conf = confusion_matrix(labels, preds, labels=range(4))
        res = compute_metrics(conf)
        assert res.overall_accuracy == pytest.approx((labels == preds).mean())
        assert res.kappa == pytest.approx(cohen_kappa_score(labels, preds), abs=1e-10)
        assert res.mean_per_class_accuracy == pytest.approx(
            balanced_accuracy_score(labels, preds), abs=1e-10)

    def test_mean_per_class_counts_absent_classes_as_zero(self):
        # tf.metrics.mean_per_class_accuracy semantics (reference AA):
        # absent classes contribute 0 to the mean over ALL classes
        conf = np.zeros((4, 4), dtype=int)
        conf[0, 0] = 10
        conf[1, 1] = 10  # classes 2, 3 absent from the eval split
        res = compute_metrics(conf)
        assert res.mean_per_class_accuracy == pytest.approx(0.5)

    def test_epoch_index_stream_covers_epoch(self):
        rng = np.random.default_rng(0)
        stream = make_epoch_index_stream(10, 2, 5, rng)
        assert stream.shape == (5, 2)
        assert sorted(stream.reshape(-1).tolist()) == list(range(10))


class TestTraining:
    def test_learns_synthetic(self, synthetic_loader):
        np.random.seed(0)
        trainer, data = make_trainer(synthetic_loader)
        result = trainer.fit(num_steps=60, batch_size=16, log_every=20)
        assert np.isfinite(result.loss)
        assert result.test_accuracy > 0.5  # separable classes learn fast

    def test_remat_training_matches_plain(self, synthetic_loader):
        """algorithm_params {'remat': true} rematerializes activations in
        the backward pass — numerically identical, just a FLOPs/HBM trade
        for very large batches."""
        results = []
        for remat in (False, True):
            np.random.seed(0)
            params = dict(PARAMS, remat=remat)
            importer = get_importer_from_name("GeneratorImporter")
            data = importer.read_data_set(
                "SyntheticDataLoader",
                "synthetic://?h=48&w=64&bands=12&classes=5&seed=3",
                train_ratio=0.5, test_ratio=0.1, neighborhood=1)
            trainer = ClassificationTrainer(
                model=CONCNNModel(), class_count=data.class_count,
                algorithm_params=params, scene=data.scene,
                sample_set=data.sample_set, sources=data.sources,
                data_shape=data.data_shape, mesh=create_mesh())
            results.append(trainer.fit(num_steps=8, batch_size=8,
                                       log_every=8).loss)
        np.testing.assert_allclose(results[0], results[1], rtol=1e-5)

    def test_eval_drain_pads_by_wrapping_real_samples(self, synthetic_loader):
        """Eval batch padding must WRAP to real samples, never zeros: CAP's
        always-batch-stats BN normalizes over the whole drain batch, and a
        zero tail poisons its statistics (measured -1.8% validation OA at
        the round-5 cap_trained point).  Wrapped rows stay masked out of
        the confusion."""
        np.random.seed(0)
        trainer, data = make_trainer(synthetic_loader)
        state = trainer.init_state()
        n = trainer.sample_set.test_targets.shape[0]
        batch = 2 ** int(np.ceil(np.log2(n))) * 2  # force a padded batch
        metrics = trainer.evaluate(state, "test", batch_size=batch)
        (key,) = [k for k in trainer._eval_tables if k[0] == "test"]
        idx, coords, labels, mask = trainer._eval_tables[key]
        idx, coords = np.asarray(idx).ravel(), np.asarray(coords).reshape(-1, 2)
        labels, mask = np.asarray(labels).ravel(), np.asarray(mask).ravel()
        targets = trainer.sample_set.test_targets
        assert idx.size > n  # padding actually happened
        # every padded row is a real sample repeated, and masked out
        np.testing.assert_array_equal(idx, np.arange(idx.size) % n)
        np.testing.assert_array_equal(coords, targets[idx, :2])
        np.testing.assert_array_equal(labels, targets[idx, 2])
        np.testing.assert_array_equal(mask, (np.arange(idx.size) < n))
        # the confusion counts exactly the real rows
        assert metrics.confusion.sum() == n

    def test_in_memory_importer_matches_scene_gather(self, synthetic_loader):
        np.random.seed(0)
        importer = get_importer_from_name("InMemoryImporter")
        data = importer.read_data_set("SyntheticDataLoader",
                                      "synthetic://?h=48&w=64&bands=12&classes=5&seed=3",
                                      train_ratio=0.5, test_ratio=0.1, neighborhood=1)
        import jax.numpy as jnp
        idx = jnp.arange(4)
        src = data.sources["training"]
        got = src.gather(src.device_arrays(), idx, None)
        targets = data.sample_set.training_targets
        for i in range(4):
            expected = data.scene.get_data_point(int(targets[i, 0]), int(targets[i, 1]))
            np.testing.assert_allclose(np.asarray(got[i]), expected, rtol=1e-6)

    def test_augmented_training_runs(self, synthetic_loader):
        np.random.seed(0)
        trainer, _ = make_trainer(synthetic_loader)
        trainer.augmentation_info = AugmentationInfo(
            perform_rotation_augmentation=True,
            perform_reflection_augmentation=True,
            perform_spectral_augmentation=0.01)
        result = trainer.fit(num_steps=20, batch_size=16, log_every=10)
        assert np.isfinite(result.loss)

    def test_simple_shadow_augmentation(self, synthetic_loader):
        from hypelcnn_tpu.gan.shadow_ops import build_shadow_creators
        np.random.seed(0)
        trainer, data = make_trainer(synthetic_loader)
        creators = build_shadow_creators(data.loader, data.scene, neighborhood=1)
        assert "simple" in creators
        trainer.augmentation_info = AugmentationInfo(
            shadow_struct=creators["simple"],
            perform_shadow_augmentation=True,
            augmentation_random_threshold=0.5)
        result = trainer.fit(num_steps=20, batch_size=16, log_every=10)
        assert np.isfinite(result.loss)

    def test_checkpoint_roundtrip(self, synthetic_loader, tmp_path):
        np.random.seed(0)
        trainer, _ = make_trainer(synthetic_loader, log_dir=str(tmp_path),
                                  save_checkpoint_steps=10)
        trainer.fit(num_steps=10, batch_size=16, log_every=10)
        restored = trainer.restore_checkpoint()
        assert restored is not None
        assert int(restored.step) == 10
        leaves = jax.tree_util.tree_leaves(restored.params)
        orig = jax.tree_util.tree_leaves(trainer.final_state.params)
        for a, b in zip(leaves, orig):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_log_model_params_writes_histograms(self, synthetic_loader, tmp_path,
                                                 monkeypatch):
        """--log_model_params histograms every model variable on the summary
        cadence (reference classify/monitored_session_runner.py:26-28)."""
        from hypelcnn_tpu.train.summaries import SummaryWriter
        calls = []
        monkeypatch.setattr(SummaryWriter, "histogram",
                            lambda self, tag, values, step: calls.append((tag, step)))
        np.random.seed(0)
        trainer, _ = make_trainer(synthetic_loader, log_dir=str(tmp_path))
        trainer.log_model_params = True
        trainer.fit(num_steps=10, batch_size=16, log_every=10)
        assert calls  # histograms were emitted
        tags = {tag for tag, _ in calls}
        assert any(tag.startswith("params/") for tag in tags)
        assert any(tag.endswith("kernel") for tag in tags)

    def test_non_chief_process_writes_no_summaries(self, synthetic_loader, tmp_path,
                                                   monkeypatch):
        """On a multi-host run only the chief writes summaries/history/CSVs;
        simulate a non-zero process index and assert the log dir stays
        empty.  (Checkpoints are NOT chief-gated — orbax's save is a global
        collective, exercised for real in tests/test_multiprocess.py — so
        checkpointing stays off here: a faked process_index with no actual
        distributed runtime would make orbax wait on a primary that never
        saves.)"""
        import hypelcnn_tpu.parallel.distributed as dist
        monkeypatch.setattr(dist.jax, "process_index", lambda: 1)
        np.random.seed(0)
        trainer, _ = make_trainer(synthetic_loader, log_dir=str(tmp_path))
        result = trainer.fit(num_steps=10, batch_size=16, log_every=10)
        assert np.isfinite(result.loss)
        assert os.listdir(str(tmp_path)) == []

    def test_record_importer_roundtrip(self, tmp_path):
        from hypelcnn_tpu.utils.record_writer import write_records
        np.random.seed(0)
        cache = write_records("SyntheticDataLoader",
                              "synthetic://?h=32&w=32&bands=6&classes=3",
                              train_ratio=0.5, test_ratio=0.1, neighborhood=1,
                              output_path=str(tmp_path))
        importer = get_importer_from_name("RecordImporter")
        data = importer.read_data_set(None, cache, None, None, None)
        assert data.class_count == 3
        assert data.data_shape == [3, 3, 7]
        assert data.sample_set.training_targets.shape[0] > 0
        import jax.numpy as jnp
        src = data.sources["training"]
        patches = src.gather(src.device_arrays(), jnp.arange(2), None)
        assert patches.shape[1:] == (3, 3, 7)


class TestInference:
    def test_full_scene_sweep_matches_target_predict(self, synthetic_loader):
        from hypelcnn_tpu.infer.scene_inference import predict_full_scene, predict_targets
        np.random.seed(0)
        trainer, data = make_trainer(synthetic_loader)
        trainer.fit(num_steps=30, batch_size=16, log_every=30)
        state = trainer.final_state
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        scene_map = predict_full_scene(trainer.module, variables, data.scene, batch_rows=16)
        h, w = data.scene.get_scene_shape()
        assert scene_map.shape == (h, w)
        # spot-check against per-target prediction
        targets = data.sample_set.test_targets[:20].astype(np.int32)
        preds = predict_targets(trainer.module, variables, data.scene, targets,
                                batch_size=32)
        np.testing.assert_array_equal(scene_map[targets[:, 1], targets[:, 0]], preds)

    def test_program_cache_evicts_one_entry_not_all(self):
        """Cache overflow must FIFO-evict a single entry: a full clear()
        would re-pay ~20 s of remote recompile per hot program."""
        from hypelcnn_tpu.infer import scene_inference as si

        built = []

        @si._module_cached
        def build(module, tag):
            built.append((id(module), tag))
            return (module, tag)

        keepalive = [object() for _ in range(70)]
        for obj in keepalive:
            build(obj, "t")
        assert len(si._PROGRAM_CACHE) <= 65
        # the most recent entries survive the overflow evictions
        assert build(keepalive[-1], "t") == (keepalive[-1], "t")
        n_built = len(built)
        build(keepalive[-1], "t")
        assert len(built) == n_built  # cache hit, not a rebuild
        # cleanup: drop the test's entries so production lookups are unaffected
        for key in [k for k in si._PROGRAM_CACHE if k[0] == "build"]:
            si._PROGRAM_CACHE.pop(key)

    def test_colored_image(self):
        from hypelcnn_tpu.infer.scene_inference import create_colored_image
        img = np.array([[0, 1], [255, 2]], dtype=np.uint8)
        colors = np.array([[10, 0, 0], [0, 10, 0], [0, 0, 10]], dtype=np.uint8)
        out = create_colored_image(img, colors)
        assert out.shape == (2, 2, 3)
        np.testing.assert_array_equal(out[0, 0], [10, 0, 0])
        np.testing.assert_array_equal(out[1, 0], [0, 0, 0])  # invalid -> black


class TestTFRecordCompat:
    def test_reads_reference_format_tfrecords(self, tmp_path):
        """Round-trip through the REFERENCE's serialization format."""
        tf = pytest.importorskip("tensorflow")
        rng = np.random.default_rng(0)
        shapes = {}
        for split, fname, n in (("training", "training.tfrecord", 6),
                                ("test", "test.tfrecord", 3),
                                ("validation", "validation.tfrecord", 4)):
            data = rng.uniform(size=(n, 3, 3, 5)).astype(np.float32)
            labels = rng.integers(0, 3, n)
            shapes[split] = data.shape
            with tf.io.TFRecordWriter(str(tmp_path / fname)) as writer:
                for i in range(n):
                    feature = {
                        "label": tf.train.Feature(
                            int64_list=tf.train.Int64List(value=[labels[i]])),
                        "image": tf.train.Feature(
                            float_list=tf.train.FloatList(value=data[i].reshape(-1))),
                    }
                    ex = tf.train.Example(features=tf.train.Features(feature=feature))
                    writer.write(ex.SerializeToString())
        with tf.io.TFRecordWriter(str(tmp_path / "metadata.tfrecord")) as writer:
            feature = {
                "training_data_shape": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=shapes["training"])),
                "testing_data_shape": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=shapes["test"])),
                "validation_data_shape": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=shapes["validation"])),
            }
            ex = tf.train.Example(features=tf.train.Features(feature=feature))
            writer.write(ex.SerializeToString())

        importer = get_importer_from_name("TFRecordImporter")  # reference alias
        data = importer.read_data_set(None, str(tmp_path), None, None, None)
        assert data.data_shape == [3, 3, 5]
        assert data.sample_set.training_targets.shape[0] == 6
        assert data.sample_set.validation_targets.shape[0] == 4
        import jax.numpy as jnp
        src = data.sources["test"]
        patches = src.gather(src.device_arrays(), jnp.arange(3), None)
        assert patches.shape == (3, 3, 3, 5)


class TestChunkGuard:
    def test_prime_cadence_does_not_degenerate_chunk(self, synthetic_loader):
        # a prime validation cadence collapses the cadence gcd to 1; the
        # guard floors the scan chunk and lets hooks fire <= chunk-1 late
        np.random.seed(0)
        trainer, _ = make_trainer(synthetic_loader, test_cadence=97)
        result = trainer.fit(num_steps=100, batch_size=16, log_every=10)
        assert trainer._last_chunk == 10  # min active cadence, not gcd==1
        assert np.isfinite(result.loss)
        # the test-cadence hook still ran (fired late, on a boundary)
        assert result.test_accuracy is not None

    def test_explicit_small_cadence_respected(self, synthetic_loader):
        np.random.seed(0)
        trainer, _ = make_trainer(synthetic_loader, test_cadence=2)
        trainer.fit(num_steps=8, batch_size=16, log_every=2)
        assert trainer._last_chunk == 2


class TestEvalTableFingerprint:
    def test_replaced_targets_not_served_stale(self, synthetic_loader):
        """The eval-table cache keys on a content fingerprint (ADVICE r2):
        swapping the sample_set's test targets must change the evaluated
        population, not silently reuse the old padded tables."""
        from hypelcnn_tpu.data.loaders.base import SampleSet
        np.random.seed(0)
        trainer, data = make_trainer(synthetic_loader)
        trainer.fit(num_steps=4, batch_size=16, log_every=4)
        state = trainer.final_state
        full = trainer.evaluate(state, "test")
        old = trainer.sample_set
        # restrict the test split to a single class: if the cache served the
        # stale tables, per-class accuracy over the other classes would
        # still be populated
        one_class = old.test_targets[old.test_targets[:, 2] == 0]
        assert 0 < one_class.shape[0] < old.test_targets.shape[0]
        trainer.sample_set = SampleSet(training_targets=old.training_targets,
                                       test_targets=one_class,
                                       validation_targets=old.validation_targets)
        restricted = trainer.evaluate(state, "test")
        assert restricted.confusion.sum() == one_class.shape[0]
        assert full.confusion.sum() == old.test_targets.shape[0]
