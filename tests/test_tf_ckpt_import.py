"""Reference TF-checkpoint migration round-trip (VERDICT r2 item 2).

Runs ``scripts/tf_ckpt_roundtrip.py`` in a subprocess: the reference graphs
are built under their real training scopes, a genuine ``model.ckpt-N`` is
saved by ``tf.compat.v1.train.Saver`` (with live Adam slot variables), and
``utils/tf_checkpoint_import.py`` must reproduce the TF outputs through the
rebuild's modules — GAN translate both directions plus classifier logits in
both the branch-conv and fused-level layouts.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout not present")


def test_tf_checkpoint_roundtrip():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tf_ckpt_roundtrip.py"),
         "--json"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    names = {c["check"] for c in report["checks"]}
    assert names == {"gan_translate_shadow", "gan_translate_deshadow",
                     "classifier_logits_fused=0", "classifier_logits_fused=1"}
    for check in report["checks"]:
        assert check["scale_normalized_delta"] < 1e-4, check
