"""Measure the REFERENCE's GAN training throughput on this image's CPU.

Runs the reference's own wrapper graphs (via scripts/gan_parity_tf.py under
the tf_slim/tfgan shims) for a timed stretch of steps at the same
configuration as the rebuild's GAN benchmark (GAN_BENCH.json `config`:
144 bands, batch 32), and merges a ``baseline_tf_reference`` section into
GAN_BENCH.json so every rebuild row has a measured reference anchor —
the GAN analog of BASELINE_TF_MEASURED.json (classifier).

The reference has no GPU in this image (and none of its GAN code is
TPU-aware); CPU TF is its achievable performance here, measured not
assumed.  Usage: ``python scripts/measure_tf_gan_reference.py
[--families cycle_gan,...] [--steps 300]``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import types

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS_DIR)

import numpy as np

FAMILIES = ("cycle_gan", "gan_x2y", "cut_x2y", "dcl_gan", "dcl_cycle_gan")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--families", default=",".join(FAMILIES))
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--bands", type=int, default=144)
    p.add_argument("--out", default=os.path.join(REPO, "GAN_BENCH.json"))
    args = p.parse_args(argv)

    from gan_episode_parity import build_shared
    scene_args = types.SimpleNamespace(
        h=96, w=128, bands=args.bands, classes=6, scene_seed=11,
        noise=120.0, validation_count=16)
    _, normal, shadow, val_lit, val_shadow, _ = build_shared(scene_args)
    rng = np.random.default_rng(1234)

    rows = {}
    with tempfile.TemporaryDirectory() as tmp:
        for fam in args.families.split(","):
            # 6 sub-updates/step for DCL, 3 for CUT, 2 otherwise
            rows_per_step = {"cut_x2y": 3, "dcl_gan": 6,
                             "dcl_cycle_gan": 6}.get(fam, 2)
            idx = rng.integers(0, normal.shape[0],
                               (rows_per_step * args.steps,
                                args.batch)).astype(np.int32)
            data_npz = os.path.join(tmp, f"data_{fam}.npz")
            np.savez(data_npz, normal=normal, shadow=shadow, idx=idx,
                     val_lit=val_lit, val_shadow=val_shadow)
            out_json = os.path.join(tmp, f"tf_{fam}.json")
            # gan_x2y maps to the vanilla GAN wrapper; y2x variants are the
            # same graph with swapped inputs — not measured separately
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(SCRIPTS_DIR, "gan_parity_tf.py"),
                 "--data", data_npz, "--gan_type", fam,
                 "--steps", str(args.steps), "--validation_steps", "100000",
                 "--batch_mode", "ref", "--out", out_json],
                cwd=REPO, text=True, capture_output=True)
            if proc.returncode != 0:
                print(f"{fam}: FAILED\n{proc.stderr[-1500:]}")
                return 1
            rep = json.load(open(out_json))
            rows[fam] = {
                "steps": rep["steps"],
                "train_seconds": rep["train_seconds"],
                "steps_per_sec": rep["steps_per_sec"],
                "patches_per_sec": round(
                    rep["steps_per_sec"] * args.batch, 1),
            }
            print(f"{fam}: {rep['steps_per_sec']} steps/s "
                  f"({rows[fam]['patches_per_sec']} patches/s)", flush=True)

    bench = json.load(open(args.out)) if os.path.exists(args.out) else {}
    bench["baseline_tf_reference"] = {
        "provenance": ("reference wrapper graphs from /root/reference run "
                       "via scripts/gan_parity_tf.py (tf_slim/tfgan shims), "
                       "one session.run per sequential-hook sub-update as "
                       "in the real MonitoredTrainingSession runtime"),
        "device": "cpu (no CUDA GPU in image; TF 2.21 compat.v1, oneDNN)",
        "bands": args.bands, "batch": args.batch,
        "results": rows,
    }
    with open(args.out, "w") as fid:
        json.dump(bench, fid, indent=2)
    print(f"merged baseline_tf_reference -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
