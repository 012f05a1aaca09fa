"""GAN crash-resume: a run killed mid-training resumes from its latest
full-state checkpoint and lands on the SAME final params as an uninterrupted
run (reference `MonitoredTrainingSession(checkpoint_dir=…)` auto-resume,
`gan/gan_train_for_shadow.py:128-139`, Saver keeping optimizer slot
variables `:289`)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "gan_resume_worker.py")


def _run_worker(base_log_path, die=False):
    cmd = [sys.executable, WORKER, str(base_log_path)] + (["die"] if die else [])
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device: deterministic run
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=900, cwd=REPO_ROOT)


def _final_params(base_log_path):
    """Load <run_dir>/gan_params with a template from the same trainer config."""
    import jax

    from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict
    from hypelcnn_tpu.train.checkpoint import restore_params_pytree
    from tests.gan_resume_worker import GAN_FLAGS

    run_dirs = [d for d in os.listdir(os.path.dirname(base_log_path))
                if d.startswith(os.path.basename(base_log_path) + "_")]
    assert len(run_dirs) == 1, run_dirs
    run_dir = os.path.join(os.path.dirname(base_log_path), run_dirs[0])

    config = {}
    for f in GAN_FLAGS:
        k, _, v = f.lstrip("-").partition("=")
        config[k] = v
    config.update(use_identity_loss=True, identity_loss_weight=0.5,
                  cycle_consistency_loss_weight=10.0, generator_lr=2e-4,
                  discriminator_lr=1e-4, gen_discriminator_lr=1e-4,
                  nce_loss_weight=10.0, tau=0.07, patches=4,
                  embedded_feat_size=2, batch_size=4)
    trainer = get_trainer_dict(config, band_count=8, max_steps=6)["cycle_gan"]
    template = jax.device_get(trainer.init_state(jax.random.key(0)).params)
    params = restore_params_pytree(os.path.join(run_dir, "gan_params"), template)
    return run_dir, params


@pytest.mark.heavy
def test_killed_gan_run_resumes_to_identical_params(tmp_path):
    # uninterrupted baseline
    full = _run_worker(tmp_path / "full")
    assert full.returncode == 0, full.stderr[-2000:]

    # run that hard-dies (os._exit) right after its first checkpoint commit
    died = _run_worker(tmp_path / "crash", die=True)
    assert died.returncode == 42, (died.returncode, died.stderr[-2000:])

    # the crashed run left a resumable full-state checkpoint
    resumed = _run_worker(tmp_path / "crash")
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert "Resuming GAN training from checkpoint at step 2" in resumed.stdout

    _, params_full = _final_params(tmp_path / "full")
    run_dir, params_resumed = _final_params(tmp_path / "crash")

    # full-state checkpoints exist for every validated iteration (2, 4, 6)
    ckpt_root = os.path.join(run_dir, "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_root) if d.isdigit())
    assert steps == [2, 4, 6], steps

    import jax
    leaves_f = jax.tree_util.tree_leaves(params_full)
    leaves_r = jax.tree_util.tree_leaves(params_resumed)
    assert len(leaves_f) == len(leaves_r)
    for a, b in zip(leaves_f, leaves_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
