"""Reference-documented-scale soaks with a mid-run kill (VERDICT r4 item 2).

The reference's documented operating points are 50k classification steps
(`common/cmd_parser.py:19-21`) and 100k-800k GAN steps (notebook.ipynb cell
8); round 4 never ran either runtime that long in one piece.  This script
runs each soak TWICE through the real CLI apps — once uninterrupted, once
SIGKILLed at ``--kill_frac`` and auto-resumed — then asserts the two final
checkpoints are equal, and audits retention pruning, history/summary growth,
and best-ratio persistence along the way.

    python scripts/soak_round5.py classifier [--steps 50000] [--smoke]
    python scripts/soak_round5.py gan        [--steps 100000] [--smoke]

Equality holds by design: both runtimes derive their index streams from a
seeded rng pool and fold ABSOLUTE step numbers into per-step keys, so a
resume at a checkpoint boundary replays the exact tail of the uninterrupted
schedule (`train/trainer.py:341-346`, `apps/gan_train_for_shadow.py:206-214`).

Writes one JSON report (--out, default SOAK_r05.json section per mode).
"""

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, REPO)


def _latest_ckpt_step(log_root):
    """Largest step among <any log dir>/checkpoints/<step>/ under log_root."""
    best = -1
    for path in glob.glob(os.path.join(log_root, "**", "checkpoints", "*"),
                          recursive=True):
        name = os.path.basename(path)
        if name.isdigit():
            best = max(best, int(name))
    return best


def _kept_ckpt_steps(log_root):
    steps = sorted(int(os.path.basename(p)) for p in glob.glob(
        os.path.join(log_root, "**", "checkpoints", "*"), recursive=True)
        if os.path.basename(p).isdigit())
    return steps


def _ckpt_dir(log_root):
    hits = glob.glob(os.path.join(log_root, "**", "checkpoints"),
                     recursive=True)
    assert len(hits) == 1, f"expected one checkpoints dir under {log_root}: {hits}"
    return hits[0]


def _restore_raw(ckpt_dir, step):
    """Restore a checkpoint as a raw pytree (no template needed)."""
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    restored = mgr.restore(step)
    mgr.close()
    return restored


def _tree_max_abs_diff(a, b):
    import jax

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b), \
        f"tree structure mismatch: {len(leaves_a)} vs {len(leaves_b)} leaves"
    worst = 0.0
    for la, lb in zip(leaves_a, leaves_b):
        la, lb = np.asarray(la), np.asarray(lb)
        assert la.shape == lb.shape and la.dtype == lb.dtype
        if la.size and np.issubdtype(la.dtype, np.floating):
            worst = max(worst, float(np.max(np.abs(la.astype(np.float64)
                                                   - lb.astype(np.float64)))))
        elif la.size:
            worst = max(worst, float(np.max(np.abs(
                la.astype(np.int64) - lb.astype(np.int64)))))
    return worst


def _run_to_completion(cmd, log_file, timeout=7200):
    with open(log_file, "a") as lf:
        proc = subprocess.run(cmd, cwd=REPO, stdout=lf, stderr=subprocess.STDOUT,
                              timeout=timeout)
    assert proc.returncode == 0, \
        f"run failed rc={proc.returncode}; tail: " + _tail(log_file)
    return proc


def _tail(log_file, n=30):
    with open(log_file) as f:
        return "".join(f.readlines()[-n:])


def _run_with_kill(cmd, log_file, log_root, kill_at, total_steps,
                   poll_s=0.5, timeout=7200):
    """Launch, SIGKILL once a checkpoint >= kill_at exists, relaunch to finish."""
    with open(log_file, "a") as lf:
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=lf,
                                stderr=subprocess.STDOUT)
        deadline = time.time() + timeout
        killed_at = None
        while time.time() < deadline:
            if proc.poll() is not None:
                # finished before the kill point — kill_at too late
                raise AssertionError(
                    f"run finished (rc={proc.returncode}) before reaching "
                    f"kill point {kill_at}; tail: " + _tail(log_file))
            step = _latest_ckpt_step(log_root)
            if step >= kill_at:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()
                killed_at = step
                break
            time.sleep(poll_s)
        assert killed_at is not None, f"timeout waiting for checkpoint {kill_at}"
        assert killed_at < total_steps, \
            (f"kill raced past the final checkpoint ({killed_at}); the resume "
             f"would be a no-op — rerun with an earlier --kill_frac")
    print(f"  killed at checkpoint step {killed_at}; resuming")
    _run_to_completion(cmd, log_file, timeout=timeout)
    return killed_at


# --------------------------------------------------------------- classifier --


def soak_classifier(args):
    steps = args.steps or (50000 if not args.smoke else 600)
    scene = args.scene or (
        "synthetic://?h=349&w=1905&bands=144&classes=15" if not args.smoke
        else "synthetic://?h=48&w=64&bands=8&classes=4")
    save_every = 2000 if not args.smoke else 100
    val_every = 5000 if not args.smoke else 200
    batch = 48 if not args.smoke else 32
    kill_at = int(steps * args.kill_frac)
    base = args.workdir or f"/tmp/soak_cls_{int(time.time())}"
    os.makedirs(base, exist_ok=True)
    params_path = args.params or "configs/modelconfigs/alg_param_hypelcnn.json"
    if args.smoke:
        # partial modelconfig overlays model defaults (core/config.py)
        params_path = os.path.join(base, "alg_param_smoke.json")
        with open(params_path, "w") as f:
            json.dump({"filter_count": 32, "batch_size": batch}, f)

    def cmd(tag):
        return [sys.executable, "-u", "-m",
                "hypelcnn_tpu.apps.train_for_classification",
                "--loader_name=SyntheticDataLoader", f"--path={scene}",
                "--model_name=HYPELCNNModel", "--importer_name=GeneratorImporter",
                "--neighborhood=1", "--train_ratio=0.1", "--test_ratio=0.02",
                f"--step={steps}", f"--batch_size={batch}",
                "--perform_validation=true", f"--validation_steps={val_every}",
                f"--save_checkpoint_steps={save_every}",
                f"--algorithm_param_path={params_path}",
                f"--base_log_path={base}/{tag}"]

    t0 = time.time()
    print(f"classifier soak: {steps} steps, kill at ~{kill_at}, dirs under {base}")
    os.makedirs(base, exist_ok=True)
    print("  run A (uninterrupted)...")
    _run_to_completion(cmd("a"), f"{base}/a.log")
    a_seconds = time.time() - t0
    print(f"  run A done in {a_seconds:.0f}s; run B (kill+resume)...")
    killed_at = _run_with_kill(cmd("b"), f"{base}/b.log", f"{base}/b", kill_at,
                               steps)

    ck_a, ck_b = _ckpt_dir(f"{base}/a"), _ckpt_dir(f"{base}/b")
    kept_a, kept_b = _kept_ckpt_steps(f"{base}/a"), _kept_ckpt_steps(f"{base}/b")
    final_a, final_b = _restore_raw(ck_a, max(kept_a)), _restore_raw(ck_b, max(kept_b))
    assert max(kept_a) == max(kept_b) == steps
    diff = _tree_max_abs_diff(final_a, final_b)

    # retention: MAX_TO_KEEP=20 (train/checkpoint.py:20, the reference's
    # Saver max_to_keep=20) — a 50k/2000 run saves >20 times so pruning
    # must have dropped the oldest.  (The end-of-fit save lands on the same
    # final step, so distinct saves = steps // save_every.)
    total_saves = steps // save_every
    retention_ok = len(kept_a) == min(total_saves, 20)

    log_dir_a = os.path.dirname(ck_a)
    history = os.path.join(log_dir_a, "history.jsonl")
    n_history = sum(1 for _ in open(history)) if os.path.exists(history) else 0
    events = glob.glob(os.path.join(log_dir_a, "events.out.tfevents.*"))
    conf_csvs = glob.glob(os.path.join(log_dir_a, "validation_confusion_*.csv"))

    # the soak must also end TRAINED, not just alive
    tail = _tail(f"{base}/a.log", 5)
    m = re.search(r"Validation accuracy=([0-9.]+)", tail)
    val_acc = float(m.group(1)) if m else None

    report = {
        "mode": "classifier", "steps": steps, "batch": batch, "scene": scene,
        "save_checkpoint_steps": save_every, "validation_steps": val_every,
        "killed_at_checkpoint": killed_at,
        "resume_equality_max_abs_diff": diff,
        "resume_equality_ok": diff <= args.tol,
        "kept_checkpoints": kept_a,
        "retention_pruning_ok": bool(retention_ok),
        "history_records": n_history,
        "tb_event_bytes": sum(os.path.getsize(p) for p in events),
        "validation_confusion_csvs": len(conf_csvs),
        "final_validation_accuracy": val_acc,
        "uninterrupted_wall_s": round(a_seconds, 1),
        "workdir": base,
        "platform": args.jax_platform or "ambient",
    }
    ok = report["resume_equality_ok"] and retention_ok and n_history > 0
    report["ok"] = bool(ok)
    return report


# ---------------------------------------------------------------------- gan --


def soak_gan(args):
    steps = args.steps or (100000 if not args.smoke else 400)
    scene = args.scene or (
        "synthetic://?h=349&w=1905&bands=144&classes=15" if not args.smoke
        else "synthetic://?h=48&w=64&bands=8&classes=4")
    val_every = 1000 if not args.smoke else 100
    batch = 32
    kill_at = int(steps * args.kill_frac)
    base = args.workdir or f"/tmp/soak_gan_{int(time.time())}"

    def cmd(tag):
        return [sys.executable, "-u", "-m",
                "hypelcnn_tpu.apps.gan_train_for_shadow",
                "--loader_name=SyntheticDataLoader", f"--path={scene}",
                "--gan_type=cycle_gan", "--pairing_method=random",
                f"--step={steps}", f"--batch_size={batch}",
                f"--validation_steps={val_every}",
                "--validation_sample_count=300",
                f"--base_log_path={base}/{tag}/log"]

    t0 = time.time()
    print(f"gan soak: {steps} cycle_gan steps, kill at ~{kill_at}, dirs under {base}")
    os.makedirs(base, exist_ok=True)
    print("  run A (uninterrupted)...")
    _run_to_completion(cmd("a"), f"{base}/a.log", timeout=4 * 3600)
    a_seconds = time.time() - t0
    print(f"  run A done in {a_seconds:.0f}s; run B (kill+resume)...")
    killed_at = _run_with_kill(cmd("b"), f"{base}/b.log", f"{base}/b", kill_at,
                               steps, timeout=4 * 3600)

    ck_a, ck_b = _ckpt_dir(f"{base}/a"), _ckpt_dir(f"{base}/b")
    kept_a, kept_b = _kept_ckpt_steps(f"{base}/a"), _kept_ckpt_steps(f"{base}/b")
    final_a, final_b = _restore_raw(ck_a, max(kept_a)), _restore_raw(ck_b, max(kept_b))
    assert max(kept_a) == max(kept_b) == steps
    diff = _tree_max_abs_diff(final_a, final_b)

    # GAN retention contract: Saver(max_to_keep=step // validation_steps)
    # (`apps/gan_train_for_shadow.py:132`, reference `:289`)
    keep = max(steps // val_every, 1)
    retention_ok = len(kept_a) == min(steps // val_every, keep)

    log_dir_a = os.path.dirname(ck_a)
    best_jsons = glob.glob(os.path.join(log_dir_a, "*best*.json")) + \
        glob.glob(os.path.join(log_dir_a, "**", "*best*.json"), recursive=True)
    plots = glob.glob(os.path.join(log_dir_a, "**", "*.pdf"), recursive=True) \
        + glob.glob(os.path.join(log_dir_a, "*.pdf"))
    params_snaps = glob.glob(os.path.join(log_dir_a, "ckpt_params_*"))

    best_payload = None
    if best_jsons:
        with open(sorted(best_jsons)[0]) as f:
            best_payload = json.load(f)

    report = {
        "mode": "gan", "gan_type": "cycle_gan", "steps": steps, "batch": batch,
        "scene": scene, "validation_steps": val_every,
        "killed_at_checkpoint": killed_at,
        "resume_equality_max_abs_diff": diff,
        "resume_equality_ok": diff <= args.tol,
        "kept_full_checkpoints": len(kept_a),
        "retention_max_to_keep": keep,
        "retention_pruning_ok": bool(retention_ok),
        "params_only_snapshots": len(params_snaps),
        "best_ratio_jsons": [os.path.relpath(p, log_dir_a) for p in best_jsons],
        "best_ratio_payload_entries": (len(best_payload)
                                       if isinstance(best_payload, (list, dict))
                                       else None),
        "validation_plots": len(plots),
        "uninterrupted_wall_s": round(a_seconds, 1),
        "workdir": base,
        "platform": args.jax_platform or "ambient",
    }
    ok = report["resume_equality_ok"] and retention_ok and bool(best_jsons)
    report["ok"] = bool(ok)
    return report


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=("classifier", "gan"))
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--kill_frac", type=float, default=0.7)
    parser.add_argument("--tol", type=float, default=1e-5,
                        help="resume-equality gate on max |param diff|")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny CPU shapes to validate the harness itself")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--params", default=None,
                        help="override the classifier modelconfig path (a "
                             "narrow filter_count keeps a full-step-count "
                             "CPU fallback soak tractable; retention/resume "
                             "behavior is width-independent)")
    parser.add_argument("--scene", default=None,
                        help="override the scene URL (e.g. a smaller scene "
                             "for a full-step-count CPU fallback soak; the "
                             "runtime behaviors under test — retention, "
                             "resume, file growth — scale with step counts, "
                             "not scene size)")
    parser.add_argument("--jax_platform", default=None,
                        help="'cpu' for smoke runs (the env var alone is "
                             "ignored; subprocesses honor it via the apps)")
    parser.add_argument("--out", default=os.path.join(REPO, "SOAK_r05.json"))
    args = parser.parse_args(argv)
    if args.jax_platform:
        os.environ["JAX_PLATFORMS"] = args.jax_platform
        # subprocesses honor the env var via core.platform; THIS process
        # (the checkpoint comparison) needs the authoritative config switch
        # (the env var alone is overridden by an ambient plugin, CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", args.jax_platform)

    report = soak_classifier(args) if args.mode == "classifier" else soak_gan(args)

    full = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            full = json.load(f)
    full[report["mode"] + ("_smoke" if args.smoke else "")] = report
    with open(args.out, "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
