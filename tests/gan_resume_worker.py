"""Worker for the GAN crash-resume test (run via subprocess).

Trains a small cycle_gan run via the real CLI main.  With the ``die``
argument, the process hard-exits (``os._exit`` — no cleanup, equivalent to
SIGKILL) immediately after the FIRST full-state checkpoint commits, which is
the deterministic version of killing the process mid-run.  The test then
re-launches without ``die`` and asserts the resumed run's final params match
an uninterrupted run's (reference auto-resume semantics,
`gan/gan_train_for_shadow.py:128-139`).

Usage: python gan_resume_worker.py <base_log_path> [die]
"""

import os
import sys

GAN_FLAGS = [
    "--loader_name=SyntheticDataLoader",
    "--path=synthetic://?h=24&w=24&bands=8&classes=3",
    "--gan_type=cycle_gan", "--step=6", "--batch_size=4",
    "--validation_steps=2", "--validation_sample_count=6",
    "--pairing_method=dummy",
]


def main() -> None:
    base_log_path = sys.argv[1]
    die_after_first_ckpt = len(sys.argv) > 2 and sys.argv[2] == "die"

    os.environ["XLA_FLAGS"] = "--xla_backend_optimization_level=0"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("HYPELCNN_TEST_CACHE",
                                     "/tmp/hypelcnn_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if die_after_first_ckpt:
        from hypelcnn_tpu.train import checkpoint as ckpt_mod
        orig = ckpt_mod.save_checkpoint

        def dying_save(*args, **kwargs):
            orig(*args, **kwargs)
            os._exit(42)  # hard crash right after the checkpoint commit

        ckpt_mod.save_checkpoint = dying_save

    from hypelcnn_tpu.apps.gan_train_for_shadow import main as gan_main
    gan_main(GAN_FLAGS + [f"--base_log_path={base_log_path}"])


if __name__ == "__main__":
    main()
