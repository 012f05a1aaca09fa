"""Smoke tests for the offline utility CLIs."""

import json
import os

import numpy as np
import pytest

SYN = "synthetic://?h=32&w=32&bands=8&classes=3"


class TestSummaryReader:
    def test_process_log_dir(self, tmp_path):
        from hypelcnn_tpu.utils.summary_reader import process_log_dir
        np.savetxt(tmp_path / "validation_confusion_100.csv",
                   np.eye(3, dtype=int), fmt="%d", delimiter=",")
        with open(tmp_path / "history.jsonl", "w") as fid:
            fid.write(json.dumps({"step": 100, "loss": 0.5}) + "\n")
            fid.write(json.dumps({"step": 200, "val_oa": 0.9}) + "\n")
        out = tmp_path / "out"
        process_log_dir(str(tmp_path), str(out))
        assert (out / "validation_confusion_100.csv").exists()
        assert (out / "metrics_history.csv").exists()
        header = (out / "metrics_history.csv").read_text().splitlines()[0]
        assert "loss" in header and "val_oa" in header


class TestMeasureShadowRatio:
    def test_runs_and_plots(self, tmp_path):
        from hypelcnn_tpu.utils.measure_targets_shadow_ratio import main
        main(["--loader_name=SyntheticDataLoader", f"--path={SYN}",
              "--pairing_method=random", f"--output_path={tmp_path}"])
        assert any(f.endswith(".pdf") for f in os.listdir(tmp_path))


class TestRemoveTestTargets:
    def test_zeroes_validation_pixels(self, tmp_path):
        from hypelcnn_tpu.utils.remove_test_targets_from_shadow import main
        np.random.seed(0)
        main(["--loader_name=SyntheticDataLoader", f"--path={SYN}",
              f"--output_path={tmp_path}"])
        assert (tmp_path / "shadow_map.tif").exists()
        assert (tmp_path / "shadow_map_before.png").exists()


class TestActivationGraph:
    def test_histograms_for_hypelcnn(self, tmp_path):
        from hypelcnn_tpu.utils.nn_layer_activation_graph import main
        main(["--model_name=HYPELCNNModel", "--neighborhood=1",
              "--class_count=4", "--bands=9", "--level_count=2",
              f"--output_path={tmp_path}"])
        files = os.listdir(tmp_path)
        assert any(f.startswith("activation_spectral_expansion") for f in files)
        assert any(f.startswith("activation_classification") for f in files)

    def test_restores_trained_checkpoint(self, tmp_path, capsys):
        """--base_log_path must histogram the TRAINED variables (reference
        restores nn_core, utilities/nn_layer_activation_graph.py:135-143) —
        this tool once silently plotted random-init activations."""
        import json

        from hypelcnn_tpu.apps.train_for_classification import main as train_main
        from hypelcnn_tpu.utils.nn_layer_activation_graph import main

        cfg = tmp_path / "alg.json"
        cfg.write_text(json.dumps({
            "drop_out_ratio": 0.5, "learning_rate": 1e-3,
            "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
            "filter_count": 32, "optimizer": "AdamOptimizer"}))
        train_main(["--loader_name=SyntheticDataLoader",
                    "--path=synthetic://?h=32&w=32&bands=8&classes=4",
                    "--model_name=HYPELCNNModel",
                    "--importer_name=GeneratorImporter",
                    "--neighborhood=1", "--train_ratio=0.4", "--test_ratio=0.1",
                    "--step=4", "--batch_size=8",
                    f"--algorithm_param_path={cfg}",
                    f"--base_log_path={tmp_path}", "--save_checkpoint_steps=4"])
        run_dir = [d for d in os.listdir(tmp_path)
                   if (tmp_path / d / "checkpoints").is_dir()][0]

        main(["--model_name=HYPELCNNModel", "--neighborhood=1",
              "--class_count=4", "--bands=9", "--level_count=2",
              f"--algorithm_param_path={cfg}",
              f"--base_log_path={tmp_path / run_dir}",
              f"--output_path={tmp_path / 'act'}"])
        assert "Restored checkpoint at step 4" in capsys.readouterr().out
        assert os.listdir(tmp_path / "act")


class TestGanInferImage:
    def test_scene_translation_outputs(self, tmp_path):
        import jax
        from hypelcnn_tpu.apps.gan_infer_image_for_shadow import main
        from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict
        from hypelcnn_tpu.train.checkpoint import save_params_pytree

        trainer = get_trainer_dict({}, 8, max_steps=1)["cycle_gan"]
        params = jax.device_get(trainer.init_state(jax.random.key(0)).params)
        ckpt = tmp_path / "gan_params"
        save_params_pytree(str(ckpt), params)

        main(["--loader_name=SyntheticDataLoader", f"--path={SYN}",
              "--gan_type=cycle_gan", "--make_them_shadow=shadow",
              f"--base_log_path={ckpt}", f"--output_path={tmp_path}"])
        files = os.listdir(tmp_path)
        assert any(f.startswith("shadow_image_shadow") for f in files)
        assert any(f.startswith("shadow_image_rgb_shadow") for f in files)


class TestRecordWriterCLI:
    def test_cli_writes_cache(self, tmp_path):
        from hypelcnn_tpu.utils.record_writer import main
        np.random.seed(0)
        main(["--loader_name=SyntheticDataLoader", f"--path={SYN}",
              "--neighborhood=1", "--train_ratio=0.4", "--test_ratio=0.1",
              f"--output_path={tmp_path}"])
        assert (tmp_path / "patch_cache.npz").exists()


class TestStatExtractorCLI:
    def test_prints_stats(self, tmp_path, capsys):
        from hypelcnn_tpu.utils import stat_extractor
        np.savetxt(tmp_path / "a.csv", np.array([[8, 2], [1, 9]]), fmt="%d", delimiter=",")
        np.savetxt(tmp_path / "b.csv", np.array([[7, 3], [2, 8]]), fmt="%d", delimiter=",")
        import sys
        old = sys.argv
        try:
            sys.argv = ["stat_extractor", str(tmp_path)]
            stat_extractor.main()
        finally:
            sys.argv = old
        out = capsys.readouterr().out
        assert "OA:" in out and "Kappa:" in out and "+-" in out
