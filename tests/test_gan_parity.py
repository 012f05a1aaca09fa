"""Two-sided GAN training parity smoke (VERDICT r3 item 1).

The committed measurement is ``GAN_PARITY.json`` (full 2000-step, 3-seed
runs).  This CI gate runs the DETERMINISTIC phase at small scale: the
reference's own cycle_gan wrapper (under the tf_slim + tensorflow_gan
shims) and the rebuild train 12 matched-init steps on shared batches inside
the pool-free window, and the generator/discriminator loss trajectories
must agree step-for-step — this catches any regression in loss wiring, the
TF-exact Adam, the leaky-relu subgradient convention, or the model stacks.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout not present")


@pytest.mark.heavy
def test_matched_init_trajectory_parity(tmp_path):
    out = str(tmp_path / "gan_parity.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gan_episode_parity.py"),
         "--h", "32", "--w", "32", "--bands", "8", "--classes", "3",
         "--traj_steps", "12", "--traj_batch", "4", "--skip_statistical",
         "--jax_platform", "cpu", "--out", out],
        capture_output=True, text=True, timeout=1200,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    with open(out) as fid:
        report = json.load(fid)
    traj = report["trajectory"]
    assert traj["max_abs_gen_delta"] < 5e-4, traj
    assert traj["max_abs_disc_delta"] < 5e-4, traj
    assert report["parity_target_met"], report
