"""Multi-host (multi-process) runtime tests.

The reference's multi-worker support is vestigial PS flags
(`gan/gan_train_for_shadow.py:70-78`); the rebuild's is real: a 2-process
``jax.distributed`` run over a gloo CPU backend, the global mesh spanning
both processes, gradient all-reduce crossing process boundaries, and
chief-only summary/checkpoint I/O.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.heavy
class TestTwoProcessTraining:
    def test_training_spans_processes_single_writer(self, tmp_path):
        """Both ranks train the same global program to the same loss; only
        the chief writes summaries."""
        port = _free_port()
        log_dir = str(tmp_path / "logs")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(pid), str(port), log_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO) for pid in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

        results = {}
        for out in outs:
            line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
            fields = dict(kv.split("=") for kv in line.split()[1:])
            results[int(fields["pid"])] = fields
        # same global program: identical loss on every rank
        assert results[0]["loss"] == results[1]["loss"]
        assert results[0]["chief"] == "True" and results[1]["chief"] == "False"

        # single-writer: exactly one summaries.jsonl, owned by the chief
        assert os.path.isfile(os.path.join(log_dir, "summaries.jsonl"))
        event_files = [f for f in os.listdir(log_dir) if f.startswith("events.out")]
        assert len(event_files) <= 1  # one TB writer (zero if tb unavailable)


def _run_workers(nprocs, port, log_dir, devices_per_proc=2, mode="classify",
                 steps=4, timeout=600):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
         str(pid), str(port), log_dir, str(nprocs), str(devices_per_proc),
         mode, str(steps)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=REPO) for pid in range(nprocs)]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        fields = dict(kv.split("=") for kv in line.split()[1:])
        results[int(fields["pid"])] = fields
    return results


@pytest.mark.heavy
class TestFourProcessTraining:
    def test_four_process_one_device_each(self, tmp_path):
        """4 processes x 1 device: the mesh spans 4 single-device hosts;
        every rank sees the identical global loss (VERDICT r2 item 10)."""
        results = _run_workers(4, _free_port(), str(tmp_path / "logs"),
                               devices_per_proc=1)
        losses = {results[p]["loss"] for p in range(4)}
        assert len(losses) == 1
        chiefs = [p for p in range(4) if results[p]["chief"] == "True"]
        assert chiefs == [0]


@pytest.mark.heavy
class TestTwoProcessGAN:
    def test_gan_training_spans_processes(self, tmp_path):
        """cycle_gan train steps over a 2-process mesh: generator loss is a
        global value, identical on both ranks."""
        results = _run_workers(2, _free_port(), str(tmp_path / "logs"),
                               mode="gan", steps=3)
        assert results[0]["loss"] == results[1]["loss"]
        assert float(results[0]["loss"]) == float(results[0]["loss"])  # finite


@pytest.mark.heavy
class TestResumeAcrossProcessCounts:
    def test_resume_single_process_from_two_process_checkpoint(self, tmp_path):
        """A checkpoint written by a 2-process run restores into THIS
        process's 8-device mesh (different process topology) and training
        continues — reshard-on-restore."""
        import numpy as np
        log_dir = str(tmp_path / "logs")
        _run_workers(2, _free_port(), log_dir, steps=4)

        from hypelcnn_tpu.core.registry import get_importer_from_name
        from hypelcnn_tpu.models import CONCNNModel
        from hypelcnn_tpu.parallel.mesh import create_mesh
        from hypelcnn_tpu.train.trainer import ClassificationTrainer

        importer = get_importer_from_name("GeneratorImporter")
        data = importer.read_data_set(
            "SyntheticDataLoader", "synthetic://?h=32&w=32&bands=6&classes=4&seed=3",
            train_ratio=0.5, test_ratio=0.1, neighborhood=1)
        params = {"batch_size": 8, "drop_out_ratio": 0.0, "learning_rate": 1e-3,
                  "learning_rate_decay_factor": 0.96,
                  "learning_rate_decay_step": 350,
                  "filter_count": 8, "optimizer": "AdamOptimizer"}
        np.random.seed(0)
        trainer = ClassificationTrainer(
            model=CONCNNModel(), class_count=data.class_count,
            algorithm_params=params, scene=data.scene,
            sample_set=data.sample_set, sources=data.sources,
            data_shape=data.data_shape, mesh=create_mesh(), log_dir=log_dir,
            save_checkpoint_steps=8)
        result = trainer.fit(num_steps=8, batch_size=8, log_every=4)
        # resumed from step 4, trained 4 more on a different device topology
        assert int(trainer.final_state.step) == 8
        assert np.isfinite(result.loss)
