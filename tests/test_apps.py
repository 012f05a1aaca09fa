"""App-level (CLI main) smoke tests on CPU, including hyperparameter-search mode."""

import json
import os

import numpy as np
import pytest


class TestTrainApp:
    def test_training_mode_end_to_end(self, tmp_path):
        from hypelcnn_tpu.apps.train_for_classification import main
        cfg = tmp_path / "alg.json"
        cfg.write_text(json.dumps({
            "drop_out_ratio": 0.5, "learning_rate": 1e-3,
            "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
            "filter_count": 8, "optimizer": "AdamOptimizer"}))
        main(["--loader_name=SyntheticDataLoader",
              "--path=synthetic://?h=32&w=32&bands=8&classes=3",
              "--model_name=CONCNNModel", "--importer_name=GeneratorImporter",
              "--neighborhood=1", "--train_ratio=0.4", "--test_ratio=0.1",
              "--step=4", "--batch_size=8",
              f"--algorithm_param_path={cfg}",
              f"--base_log_path={tmp_path}", "--save_checkpoint_steps=4"])
        # log-dir codec + checkpoint artifacts
        subdirs = [d for d in os.listdir(tmp_path) if d.startswith("syntheticldr")]
        assert subdirs, os.listdir(tmp_path)
        run_dir = tmp_path / subdirs[0]
        assert (run_dir / "checkpoints").is_dir()
        assert (run_dir / "summaries.jsonl").exists()

    def test_hyperparameter_search_mode(self, tmp_path, monkeypatch):
        from hypelcnn_tpu.apps.train_for_classification import main
        monkeypatch.chdir(tmp_path)
        space = tmp_path / "space.json"
        space.write_text(json.dumps({
            "learning_rate": {"min": 1e-4, "max": 1e-2, "log": True},
            "filter_count": [8, 16],
            "drop_out_ratio": 0.5,
            "learning_rate_decay_factor": 0.96,
            "learning_rate_decay_step": 350,
            "optimizer": "AdamOptimizer",
        }))
        main(["--loader_name=SyntheticDataLoader",
              "--path=synthetic://?h=32&w=32&bands=8&classes=3",
              "--model_name=CONCNNModel", "--importer_name=GeneratorImporter",
              "--neighborhood=1", "--train_ratio=0.4", "--test_ratio=0.1",
              "--step=2", "--batch_size=8", "--perform_validation=true",
              "--validation_steps=2",
              f"--flag_config_file_opt={space}",
              "--opt_trial_count=2", "--opt_run_count=1",
              f"--base_log_path={tmp_path}"])
        assert (tmp_path / "classification_opt.db").exists()

    def test_log_suffix_codec(self):
        from types import SimpleNamespace
        from hypelcnn_tpu.apps.train_for_classification import get_log_suffix
        flags = SimpleNamespace(
            loader_name="GRSS2013DataLoader", model_name="HYPELCNNModel",
            train_ratio=0.10, algorithm_param_path="x/alg_param_hypelcnn.json",
            neighborhood=1, augment_data_with_shadow="cycle_gan",
            augmentation_random_threshold=0.5, augment_data_with_spectral=None)
        suffix = get_log_suffix(flags)
        assert suffix == "grss2013ldr_hypelcnnmdl_trn010_phypelcnn_3x3_cycle_gan_aug050"


class TestInferApp:
    def test_gt_domain(self, tmp_path):
        from hypelcnn_tpu.apps.infer_for_classification import main
        np.random.seed(0)
        main(["--loader_name=SyntheticDataLoader",
              "--path=synthetic://?h=32&w=32&bands=8&classes=3",
              "--domain=gt", f"--output_path={tmp_path}"])
        assert (tmp_path / "result_raw.tif").exists()
        assert (tmp_path / "result_colorized.tif").exists()


class TestClassicML:
    def test_random_forest_run(self, tmp_path):
        from hypelcnn_tpu.apps.classic_ml_trainer import main
        np.random.seed(0)
        main(["--loader_name=SyntheticDataLoader",
              "--path=synthetic://?h=32&w=32&bands=8&classes=3",
              "--neighborhood=0", f"--base_log_path={tmp_path}",
              f"--output_path={tmp_path}"])
        files = os.listdir(tmp_path)
        assert any(f.startswith("confusion_matrix_") for f in files)
        assert any(f.startswith("metrics_") for f in files)


class TestGanApps:
    def test_gan_train_and_infer_stats(self, tmp_path):
        from hypelcnn_tpu.apps.gan_train_for_shadow import main as gan_main
        gan_main(["--loader_name=SyntheticDataLoader",
                  "--path=synthetic://?h=32&w=32&bands=8&classes=3",
                  "--gan_type=gan_x2y", "--step=4", "--batch_size=8",
                  "--validation_steps=4", "--validation_sample_count=10",
                  "--pairing_method=dummy",
                  f"--base_log_path={tmp_path}/g"])
        run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("g_")]
        assert run_dirs
        run_dir = os.path.join(tmp_path, run_dirs[0])
        assert os.path.isdir(os.path.join(run_dir, "gan_params"))

        from hypelcnn_tpu.apps.gan_infer_for_shadow import main as infer_main
        infer_main(["--loader_name=SyntheticDataLoader",
                    "--path=synthetic://?h=32&w=32&bands=8&classes=3",
                    "--gan_type=gan_x2y", "--number_of_samples=10",
                    f"--base_log_path={run_dir}/gan_params",
                    f"--output_path={tmp_path}"])
        assert any(f.startswith("best_ratio_") for f in os.listdir(tmp_path))

    def test_gan_infer_image_single_dispatch_scene(self, tmp_path):
        """Full-scene translation app: trains a tiny GAN, then translates
        the whole scene via translate_scene (one jitted lax.map dispatch —
        the reference's per-pixel sess.run loop rebuilt,
        gan/gan_infer_image_for_shadow.py:62-104) and writes the HSI + RGB
        tifs with the shadow-map filter applied."""
        from hypelcnn_tpu.apps.gan_train_for_shadow import main as gan_main
        scene = "synthetic://?h=24&w=24&bands=8&classes=3"
        gan_main(["--loader_name=SyntheticDataLoader", f"--path={scene}",
                  "--gan_type=cycle_gan", "--step=2", "--batch_size=4",
                  "--validation_steps=2", "--validation_sample_count=6",
                  "--pairing_method=dummy", f"--base_log_path={tmp_path}/g"])
        run_dir = os.path.join(tmp_path, [d for d in os.listdir(tmp_path)
                                          if d.startswith("g_")][0])

        from hypelcnn_tpu.apps.gan_infer_image_for_shadow import main as img_main
        img_main(["--loader_name=SyntheticDataLoader", f"--path={scene}",
                  "--gan_type=cycle_gan", "--make_them_shadow=shadow",
                  f"--base_log_path={run_dir}/gan_params",
                  f"--output_path={tmp_path}"])
        outs = os.listdir(tmp_path)
        assert any(f.startswith("shadow_image_shadow") and f.endswith(".tif")
                   for f in outs), outs
        assert any(f.startswith("shadow_image_rgb_shadow") for f in outs), outs

    def test_gan_train_loop_runs_for_every_gan_type(self, tmp_path):
        """The CLI training loop keys its scan output on generator_loss;
        every registered gan_type must survive it (dcl_gan once crashed
        with a KeyError because its metrics were all unit-prefixed)."""
        from hypelcnn_tpu.apps.gan_train_for_shadow import main as gan_main
        for gan_type in ("dcl_gan", "dcl_cycle_gan", "cut_y2x", "gan_y2x"):
            gan_main(["--loader_name=SyntheticDataLoader",
                      "--path=synthetic://?h=24&w=24&bands=16&classes=3",
                      f"--gan_type={gan_type}", "--step=2", "--batch_size=4",
                      "--patches=4",
                      "--validation_steps=2", "--validation_sample_count=6",
                      "--pairing_method=dummy",
                      f"--base_log_path={tmp_path}/{gan_type}"])
            run_dirs = [d for d in os.listdir(tmp_path)
                        if d.startswith(f"{gan_type}_")]
            assert run_dirs, gan_type


class TestParityHarness:
    def test_accuracy_parity_smoke_on_synthetic(self, tmp_path):
        """The ready-to-run parity experiment (scripts/accuracy_parity.py)
        stays a working COMMAND: run its documented synthetic smoke and
        check the report it writes (full-scene sweep + OA fields)."""
        import importlib.util
        import json as json_mod

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "accuracy_parity", os.path.join(repo_root, "scripts",
                                            "accuracy_parity.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = tmp_path / "alg.json"
        cfg.write_text(json_mod.dumps({
            "drop_out_ratio": 0.5, "learning_rate": 1e-3,
            "learning_rate_decay_factor": 0.96,
            "learning_rate_decay_step": 350,
            "filter_count": 32, "batch_size": 8,
            "optimizer": "AdamOptimizer"}))
        mod.main(["--algorithm_param_path", str(cfg),
                  "--loader_name", "SyntheticDataLoader",
                  "--path", "synthetic://?h=32&w=32&bands=8&classes=4",
                  "--steps", "8", "--batch_size", "8",
                  "--train_ratio", "0.4", "--test_ratio", "0.1",
                  "--reference_oa", "0.8",
                  "--output_path", str(tmp_path / "parity")])
        report = json_mod.load(open(tmp_path / "parity" / "parity_report.json"))
        assert report["test_oa"] is not None
        assert "full_scene_seconds" in report
        assert "parity_target_met" in report
        assert (tmp_path / "parity" / "scene_map.npy").exists()


class TestLoudErrors:
    def test_unknown_shadow_method_raises(self, tmp_path):
        """A typo'd --augment_data_with_shadow must fail loudly (reference
        dict[...] KeyError), not silently train without augmentation."""
        from hypelcnn_tpu.apps.train_for_classification import main
        with pytest.raises(KeyError, match="cyclegan"):
            main(["--loader_name=SyntheticDataLoader",
                  "--path=synthetic://?h=32&w=32&bands=8&classes=3",
                  "--model_name=CONCNNModel", "--importer_name=GeneratorImporter",
                  "--neighborhood=1", "--train_ratio=0.4", "--test_ratio=0.1",
                  "--step=2", "--batch_size=8",
                  "--augment_data_with_shadow=cyclegan",
                  f"--base_log_path={tmp_path}"])

    def test_malformed_synthetic_path_raises(self):
        from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader
        with pytest.raises(ValueError, match="synthetic://"):
            SyntheticDataLoader("/data/2013_DFTC/2013_DFTC")
        with pytest.raises(ValueError, match="synthetic://"):
            SyntheticDataLoader("synthetic:?h=128")
