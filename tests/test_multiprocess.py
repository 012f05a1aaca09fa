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
