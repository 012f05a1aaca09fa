"""Summarize a JAX device trace (xplane.pb) captured by capture_profile.py.

Usage: python scripts/analyze_profile.py /tmp/jax_trace [--top 20]

Prints, per device timeline: total module wall time, and the top XLA ops by
accumulated duration (sync compute line and async DMA line separately).
This is how the round-2 step-floor analysis was done (see DESIGN.md perf
notes): the training chunk turned out to be op-count/bandwidth-bound —
~1250 device ops per step, dominated by f32 activation copies that the
residual-chain dtype fix removed — not MXU-bound.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--top", type=int, default=20)
    args = parser.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {args.trace_dir}")
    path = paths[-1]
    print(f"trace: {path}")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        print(f"\n=== device plane: {plane.name}")
        for line in plane.lines:
            if not line.events:
                continue
            durs: collections.Counter = collections.Counter()
            cnts: collections.Counter = collections.Counter()
            for e in line.events:
                name = emeta.get(e.metadata_id, str(e.metadata_id))
                durs[name] += e.duration_ps / 1e6  # ps -> us
                cnts[name] += 1
            total = sum(durs.values())
            print(f"--- line {line.name!r}: {len(line.events)} events, "
                  f"sum {total / 1e3:.1f} ms")
            for name, d in durs.most_common(args.top):
                print(f"  {d:10.0f} us  x{cnts[name]:<6d} {name[:100]}")


if __name__ == "__main__":
    main()
