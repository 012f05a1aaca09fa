"""Weight-for-weight forward parity vs the reference's OWN TF graphs.

Runs ``scripts/forward_parity.py`` in a subprocess (isolating the TF
import + graph mode from this jax process): the reference model graph and
the rebuild's flax module get identical random weights and must produce
identical logits.  This is the strongest accuracy-parity evidence available
without the licensed datasets — given equal weights the stacks are
numerically identical, so training-accuracy parity reduces to
optimizer/data parity (covered by the optimizer/splitter/augmentation
tests).

Measured deltas (scale-normalized): HYPELCNN 5.4e-7, CONCNN 2.4e-6,
DUALCNN 8.0e-7, CAP 2.4e-6 — pure f32 reduction-order noise.  The CAP
check stacks the reference's data_size per-capsule conv weights into the
rebuild's fused einsum parameter and exercises the preserved
always-batch-stats BN quirk.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("model", ["HYPELCNNModel", "CONCNNModel",
                                   "DUALCNNModel", "CAPModel"])
def test_forward_matches_reference_graph(model):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "forward_parity.py"),
         "--model", model, "--json"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert report["tf_variables_unmapped"] == []
    assert report["scale_normalized_delta"] < 1e-4


def test_gan_stack_matches_reference_graph():
    """Generator (full + encoder), discriminator, and feature discriminator
    vs reference gan/shadow_data_models.py, weight-for-weight (measured
    deltas 3e-7..1.1e-6 of scale)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "forward_parity.py"),
         "--gan", "--json"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert {c["check"] for c in report["checks"]} == {
        "generator_full", "generator_encoder", "discriminator",
        "feature_discriminator"}


def test_training_trajectory_tracks_reference():
    """25 identical steps from one shared init: loss trajectories must track
    (measured 2.7e-5 relative; budget 2%). Covers optimizer, loss
    composition, and BN running-stat semantics end-to-end."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_parity.py"),
         "--json"],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert report["max_loss_rel_diff"] < 0.02
