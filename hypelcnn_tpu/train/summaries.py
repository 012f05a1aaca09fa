"""Training summaries: TensorBoard events when available, JSONL always.

Replaces the reference's summary plumbing — scalar/histogram summaries and
start-of-run text summaries (`classify/monitored_session_runner.py:16-28`,
`common/common_nn_ops.py:588-600`).  Event files are written through
torch.utils.tensorboard when importable (baked into this environment);
every record also lands in ``summaries.jsonl`` so logs are greppable
without TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
try:
    from torch.utils.tensorboard import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover
    _TBWriter = None


class SummaryWriter:
    def __init__(self, log_dir: str, enable_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "summaries.jsonl"), "a", encoding="utf-8")
        self._tb = _TBWriter(log_dir) if (_TBWriter and enable_tensorboard) else None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps({"ts": time.time(), "tag": tag,
                                      "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb:
            self._tb.add_scalar(tag, float(value), int(step))

    def text(self, tag: str, value: str, step: int = 0) -> None:
        """Start-of-run config dump (TextSummaryAtStartHook role)."""
        self._jsonl.write(json.dumps({"ts": time.time(), "tag": tag,
                                      "text": value, "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb:
            self._tb.add_text(tag, f"<pre>{value}</pre>", int(step))

    def histogram(self, tag: str, values, step: int) -> None:
        if self._tb:
            import numpy as np
            self._tb.add_histogram(tag, np.asarray(values), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb:
            self._tb.close()
