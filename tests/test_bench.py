"""bench.py outage-proofing tests (VERDICT r4 item 1).

Round 4's driver bench capture was erased by a transient tunnel outage
(BENCH_r04.json rc=1, raw traceback).  These tests pin the contract that
``python bench.py`` now prints exactly ONE parseable JSON line on BOTH the
success and the final-failure path, and that the failure line carries the
error plus the last good recorded value.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, args=(), timeout=120):
    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH, *args], text=True,
                          capture_output=True, timeout=timeout, env=env)


def test_failure_path_emits_parseable_json_with_last_good():
    # a probe that always fails, tiny backoff: the supervisor must exhaust
    # its attempts and still print ONE valid JSON line, not a traceback
    proc = _run({"BENCH_PROBE_OVERRIDE": "exit 1", "BENCH_ATTEMPTS": "2",
                 "BENCH_BACKOFF_S": "0.05"})
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "hypelcnn_train_patches_per_sec_per_chip"
    assert rec["value"] is None
    assert "probe rc=1" in rec["error"]
    # this repo carries BENCH_r03.json (792,895.2 patches/s) — the failure
    # line must surface it so a driver outage never erases the perf record
    assert rec["last_good"] is not None
    assert rec["last_good"]["value"] > 0
    assert rec["last_good"]["source"].startswith("BENCH_r")


def test_probe_hang_is_killed_not_waited_on():
    # the tunnel's worst mode is a HANG on jax.devices(); the supervisor
    # must kill the probe subprocess at the timeout and classify it
    proc = _run({"BENCH_PROBE_OVERRIDE": "sleep 60", "BENCH_ATTEMPTS": "1",
                 "BENCH_PROBE_TIMEOUT_S": "1", "BENCH_BACKOFF_S": "0.05"},
                timeout=60)
    assert proc.returncode == 0, proc.stderr[-800:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "hung" in rec["error"]


@pytest.mark.heavy
def test_supervised_success_relays_inner_json():
    # full supervisor round-trip on CPU: probe ok -> inner --smoke runs ->
    # its JSON line is relayed verbatim as the sole stdout line
    proc = _run({"BENCH_PROBE_OVERRIDE": "true", "JAX_PLATFORMS": "cpu"},
                args=("--smoke", "--supervise"), timeout=600)
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "hypelcnn_train_patches_per_sec_per_chip"
    assert rec["value"] and rec["value"] > 0
    assert "error" not in rec
