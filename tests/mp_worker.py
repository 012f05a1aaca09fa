"""Worker for the 2-process ``jax.distributed`` test (run via subprocess).

Each process owns 2 virtual CPU devices; the global mesh spans all 4 and a
full training run executes on it — gradient all-reduce rides the gloo
cross-process backend.  Chief-only I/O (reference ``is_chief = task == 0``,
`gan/gan_train_for_shadow.py:300`) means only process 0 writes summaries.

Usage: python mp_worker.py <process_id> <coordinator_port> <log_dir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, port, log_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from hypelcnn_tpu.parallel.distributed import initialize_distributed, is_chief
    assert initialize_distributed(f"127.0.0.1:{port}", 2, pid) is True
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # the mesh spans both processes

    import numpy as np
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
        # checkpointing must be exercised multi-process: orbax's save is a
        # global collective — a chief-only call deadlocks on its barrier
        save_checkpoint_steps=4)
    result = trainer.fit(num_steps=4, batch_size=8, log_every=4)
    assert os.path.isdir(os.path.join(log_dir, "checkpoints"))
    print(f"RESULT pid={pid} chief={is_chief()} loss={result.loss:.6f}", flush=True)

    # re-sync before interpreter exit: the chief spends extra wall time on
    # its summary/checkpoint I/O, and on a loaded machine the non-chief can
    # hit the coordination-service shutdown barrier so much earlier that the
    # barrier times out (observed under a full parallel test run).  A global
    # collective makes both ranks reach shutdown together.
    from jax.experimental.multihost_utils import sync_global_devices
    sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
