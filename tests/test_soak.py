"""CI gate for the soak harness (scripts/soak_round5.py).

The round-5 soaks run the real CLI apps at reference-documented step counts
(reference defaults: 50k classification steps, `common/cmd_parser.py:19-21`;
100k+ GAN steps, notebook cell 8) with a mid-run SIGKILL + auto-resume; this
test locks in the harness machinery — and with it the CLASSIFIER
kill-and-resume equality path, which otherwise has no CI coverage (the GAN
twin is tests/test_gan_resume.py) — at smoke scale.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_classifier_soak_smoke_kill_resume_equality(tmp_path):
    out = tmp_path / "soak.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak_round5.py"),
         "classifier", "--smoke", "--jax_platform", "cpu",
         "--workdir", str(tmp_path / "work"), "--out", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.load(open(out))["classifier_smoke"]
    assert report["ok"] is True
    # the uninterrupted and killed+resumed runs must end bit-identical:
    # index streams are derived from absolute step numbers, so a resume
    # replays the exact tail of the schedule (train/trainer.py:341-346)
    assert report["resume_equality_max_abs_diff"] == 0.0
    assert report["killed_at_checkpoint"] < report["steps"]
    assert report["retention_pruning_ok"] is True
    assert report["history_records"] > 0
