"""Round-4 reference-scale episode-parity driver (VERDICT r3 item 6).

Waits for the TPU perf suite to release the chip, calibrates the synthetic
scene's noise so the 145-band/15-class operating point lands at a
discriminating mid-range OA, then runs the full two-sided 5000-step
comparison (TF reference on CPU, rebuild on the ambient TPU) with 3 seeds
and merges a ``grss2013_scale`` point into ACCURACY_PARITY.json.
"""

import json
import os
import subprocess
import sys
import time

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)

SCALE = ["--h", "128", "--w", "192", "--bands", "145", "--classes", "15",
         "--neighborhood", "2", "--filter_count", "480",
         "--spectral_augmentation", "0.1", "--train_ratio", "0.10",
         "--test_ratio", "0.05"]
STEPS = "5000"


def run(extra, out):
    cmd = [sys.executable, os.path.join(SCRIPTS_DIR, "episode_parity.py"),
           "--steps", STEPS, "--out", out] + SCALE + extra
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, cwd=REPO, text=True).returncode


def main():
    pid_file = "/tmp/perf_r4.pid"
    if os.path.exists(pid_file):
        pid = int(open(pid_file).read().strip())
        while True:
            try:
                os.kill(pid, 0)
            except OSError:
                break
            print(f"waiting for perf suite (pid {pid})...", flush=True)
            time.sleep(120)

    # calibration: rebuild side only on TPU, pick a mid-range noise.
    # Track the candidate CLOSEST to the 0.90-0.995 discriminating window —
    # never silently fall through to the last (highest-noise) point, which
    # may be non-discriminating (ADVICE r4).
    target_mid = 0.95
    chosen, chosen_oa, in_window = None, None, False
    for noise in ("2200", "6000", "12000"):
        out = f"/tmp/grss_cal_{noise}.json"
        if run(["--noise", noise, "--skip_reference", "--seeds", "1234"],
               out) != 0:
            continue
        with open(out) as fid:
            rep = json.load(fid)
        oa = rep["rebuild"]["validation_oa"] if isinstance(
            rep["rebuild"], dict) else rep["rebuild"][0]["validation_oa"]
        print(f"noise {noise}: rebuild validation OA {oa}", flush=True)
        if chosen is None or abs(oa - target_mid) < abs(chosen_oa - target_mid):
            chosen, chosen_oa = noise, oa
        if 0.90 <= oa <= 0.995:
            in_window = True
            break
    if chosen is None:
        print("calibration failed entirely")
        return 1
    if not in_window:
        print(f"WARNING: no calibration point landed in the 0.90-0.995 OA "
              f"window; using closest candidate noise={chosen} "
              f"(OA {chosen_oa}) — the comparison may be non-discriminating",
              flush=True)

    out = "/tmp/grss_scale_full.json"
    rc = run(["--noise", chosen, "--seeds", "1234,7,99"], out)
    with open(out) as fid:
        report = json.load(fid)
    acc_path = os.path.join(REPO, "ACCURACY_PARITY.json")
    with open(acc_path) as fid:
        full = json.load(fid)
    full["grss2013_scale"] = report
    with open(acc_path, "w") as fid:
        json.dump(full, fid, indent=2)
    print(f"grss2013_scale point merged into {acc_path}; "
          f"parity_target_met={report.get('parity_target_met')}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
