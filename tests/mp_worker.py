"""Worker for the multi-process ``jax.distributed`` tests (run via subprocess).

Each process owns ``devices_per_proc`` virtual CPU devices; the global mesh
spans all of them and a full training run executes on it — gradient
all-reduce rides the gloo cross-process backend.  Chief-only I/O (reference
``is_chief = task == 0``, `gan/gan_train_for_shadow.py:300`) means only
process 0 writes summaries.

Usage: python mp_worker.py <pid> <port> <log_dir> [nprocs] [devices_per_proc]
                           [mode: classify|gan] [steps]
"""

import os
import sys


def main() -> None:
    pid, port, log_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    nprocs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    devices_per_proc = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    mode = sys.argv[6] if len(sys.argv) > 6 else "classify"
    steps = int(sys.argv[7]) if len(sys.argv) > 7 else 4

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from hypelcnn_tpu.parallel.distributed import initialize_distributed, is_chief
    assert initialize_distributed(f"127.0.0.1:{port}", nprocs, pid) is True
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs * devices_per_proc

    import numpy as np

    if mode == "classify":
        from hypelcnn_tpu.core.registry import get_importer_from_name
        from hypelcnn_tpu.models import CONCNNModel
        from hypelcnn_tpu.parallel.mesh import create_mesh
        from hypelcnn_tpu.train.trainer import ClassificationTrainer

        importer = get_importer_from_name("GeneratorImporter")
        data = importer.read_data_set(
            "SyntheticDataLoader", "synthetic://?h=32&w=32&bands=6&classes=4&seed=3",
            train_ratio=0.5, test_ratio=0.1, neighborhood=1)
        params = {"batch_size": 8, "drop_out_ratio": 0.0, "learning_rate": 1e-3,
                  "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
                  "filter_count": 8, "optimizer": "AdamOptimizer"}
        np.random.seed(0)
        trainer = ClassificationTrainer(
            model=CONCNNModel(), class_count=data.class_count,
            algorithm_params=params, scene=data.scene,
            sample_set=data.sample_set, sources=data.sources,
            data_shape=data.data_shape, mesh=create_mesh(), log_dir=log_dir,
            # checkpointing must be exercised multi-process: orbax's save is
            # a global collective — a chief-only call deadlocks on its barrier
            save_checkpoint_steps=4)
        result = trainer.fit(num_steps=steps, batch_size=8, log_every=4)
        assert os.path.isdir(os.path.join(log_dir, "checkpoints"))
        print(f"RESULT pid={pid} chief={is_chief()} loss={result.loss:.6f}",
              flush=True)
    elif mode == "gan":
        import jax.numpy as jnp
        from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict
        from hypelcnn_tpu.parallel.mesh import create_mesh

        bands, batch = 12, 16
        trainer = get_trainer_dict({"patches": 3, "embedded_feat_size": 2},
                                   bands, max_steps=100,
                                   mesh=create_mesh())["cycle_gan"]
        state = trainer.init_state(jax.random.key(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (batch, 1, 1, bands)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 1, (batch, 1, 1, bands)).astype(np.float32))
        loss = float("nan")
        for i in range(steps):
            state, metrics = trainer.train_step(state, x, y, jax.random.key(i))
            loss = float(metrics["generator_loss"])
        print(f"RESULT pid={pid} chief={is_chief()} loss={loss:.6f}", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")

    # re-sync before interpreter exit: the chief spends extra wall time on
    # its summary/checkpoint I/O, and on a loaded machine the non-chief can
    # hit the coordination-service shutdown barrier so much earlier that the
    # barrier times out (observed under a full parallel test run).  A global
    # collective makes both ranks reach shutdown together.
    from jax.experimental.multihost_utils import sync_global_devices
    sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
