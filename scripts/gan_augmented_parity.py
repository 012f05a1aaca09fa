"""Two-sided GAN-AUGMENTED classification parity (VERDICT r3 item 5).

The subtlest reference mechanism end-to-end: a cycle_gan generator trained by
the REFERENCE's own code (scripts/gan_parity_tf.py under the tfgan shim) is
frozen and used as the shadow augmenter inside classifier training in BOTH
frameworks — the reference restoring the Saver checkpoint natively
(`classify/monitored_session_runner.py:131-138`), the rebuild importing the
SAME checkpoint via utils/tf_checkpoint_import — and final accuracies are
compared with the 3-seed mean gate.  This exercises the TF-checkpoint
importer in its real role.

Usage:
    python scripts/gan_augmented_parity.py [--steps 2000] [--gan_steps 1000]
        [--seeds 1234,7,99]

Merges a ``gan_augmented`` operating point into ACCURACY_PARITY.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from types import SimpleNamespace

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS_DIR)

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=96)
    p.add_argument("--w", type=int, default=128)
    p.add_argument("--bands", type=int, default=24)
    p.add_argument("--classes", type=int, default=6)
    p.add_argument("--scene_seed", type=int, default=11)
    p.add_argument("--noise", type=float, default=2200.0,
                   help="spectral noise sigma; MUST match the episode "
                        "harness's scene so the generator trains on the "
                        "same data the classifier sees")
    p.add_argument("--gan_steps", type=int, default=1000)
    p.add_argument("--gan_batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--seeds", default="1234,7,99")
    p.add_argument("--keep_ckpt", default=None,
                   help="copy the trained reference GAN ckpt here")
    p.add_argument("--out", default=os.path.join(REPO, "ACCURACY_PARITY.json"))
    args = p.parse_args(argv)

    from gan_episode_parity import build_shared

    shared_args = SimpleNamespace(h=args.h, w=args.w, bands=args.bands,
                                  classes=args.classes,
                                  scene_seed=args.scene_seed, noise=args.noise,
                                  validation_count=50)
    _, normal, shadow, val_lit, val_shadow, _ = build_shared(shared_args)
    n_pairs = normal.shape[0]

    with tempfile.TemporaryDirectory() as tmp:
        # 1. train a reference GAN on the shared scene, save a REAL Saver ckpt
        rng = np.random.default_rng(4242)
        idx = rng.integers(0, n_pairs,
                           (2 * args.gan_steps, args.gan_batch)).astype(np.int32)
        data_npz = os.path.join(tmp, "gan_data.npz")
        np.savez(data_npz, normal=normal, shadow=shadow, idx=idx,
                 val_lit=val_lit, val_shadow=val_shadow)
        ckpt_dir = os.path.join(tmp, "gan_ckpt")
        os.makedirs(ckpt_dir, exist_ok=True)
        ckpt_prefix = os.path.join(ckpt_dir, "model.ckpt")
        proc = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS_DIR, "gan_parity_tf.py"),
             "--data", data_npz, "--steps", str(args.gan_steps),
             "--validation_steps", str(args.gan_steps), "--run_seed", "1234",
             "--batch_mode", "ref",
             "--out", os.path.join(tmp, "gan_report.json"),
             "--save_ckpt", ckpt_prefix], cwd=REPO, text=True)
        if proc.returncode != 0:
            print("reference GAN training FAILED")
            return 1
        if args.keep_ckpt:
            import shutil
            os.makedirs(args.keep_ckpt, exist_ok=True)
            for f in os.listdir(ckpt_dir):
                shutil.copy(os.path.join(ckpt_dir, f), args.keep_ckpt)

        # 2. both frameworks train classifiers augmented by the SAME frozen
        #    generator, 3-seed mean gate
        aug_out = os.path.join(tmp, "gan_aug_report.json")
        proc = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS_DIR, "episode_parity.py"),
             "--h", str(args.h), "--w", str(args.w), "--bands",
             str(args.bands), "--classes", str(args.classes),
             "--seed", str(args.scene_seed), "--noise", str(args.noise),
             "--steps", str(args.steps), "--seeds", args.seeds,
             "--gan_ckpt", ckpt_prefix, "--jax_platform", "cpu",
             "--out", aug_out], cwd=REPO, text=True)
        rc = proc.returncode
        if not os.path.exists(aug_out):
            # the inner run died before writing its report — nothing to
            # merge; do NOT touch the committed parity artifact
            print(f"episode_parity.py produced no report (rc={rc}); "
                  f"leaving {args.out} untouched")
            return rc or 1
        with open(aug_out) as fid:
            aug_report = json.load(fid)
        if rc != 0:
            # gate FAILED: report exists but must not silently overwrite a
            # passing point in the committed artifact
            print(f"gan_augmented parity gate FAILED (rc={rc}); report at "
                  f"{aug_out} NOT merged into {args.out}")
            print(json.dumps(aug_report, indent=2)[:2000])
            return rc

    aug_report["gan_generator"] = {
        "trained_by": "reference (gan_parity_tf under tfgan shim)",
        "gan_steps": args.gan_steps, "gan_batch": args.gan_batch,
        "restored_via": {"reference": "tf.train.Saver (native)",
                         "rebuild": "utils/tf_checkpoint_import"}}

    # merge as an operating point into the committed parity artifact
    if os.path.exists(args.out):
        with open(args.out) as fid:
            full = json.load(fid)
    else:
        full = {}
    full["gan_augmented"] = aug_report
    with open(args.out, "w") as fid:
        json.dump(full, fid, indent=2)
    print(f"gan_augmented point merged into {args.out}; "
          f"parity_target_met={aug_report.get('parity_target_met')}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
