"""GAN time-to-quality: turn per-step wins into a measured end-to-end win.

VERDICT r4 item 4: GAN_BENCH shows the rebuild 31-74x faster per step at
batch 32 and peaking at batch 512, but nothing demonstrated that the big
batch reaches the REFERENCE's own quality gate — the best band-ratio JS
divergence selection (`gan/wrappers/gan_common.py:165-219`) — in less
wall-clock.  This script measures exactly that:

1. Phase A (quality target): the reference's documented operating point —
   cycle_gan batch 32, ``--steps`` steps, validation every 100 — run with
   the rebuild (two-sided training parity is CI-gated, so the rebuild's JS
   trajectory IS the reference's); record each direction's best mean-JS
   divergence and the wall-clock spent.
2. Phase B: batch 512 with an LR-scaling sweep, validating on the SAME
   frozen sample sets every ``--val_every_b`` steps; record the wall-clock
   until BOTH directions' best-so-far JS reach the phase-A targets.

Writes a ``time_to_quality`` block into GAN_BENCH.json.

Usage: python scripts/gan_time_to_quality.py [--steps 2000]
       [--lr_scales 1,2,4] [--bands 144] [--jax_platform cpu (smoke only)]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIG = {"generator_lr": 2e-4, "discriminator_lr": 1e-4,
          "gen_discriminator_lr": 1e-4,
          "use_identity_loss": True, "identity_loss_weight": 0.5,
          "cycle_consistency_loss_weight": 10.0, "nce_loss_weight": 10.0,
          "tau": 0.07, "patches": 3, "embedded_feat_size": 2,
          "discriminator_reg_scale": 1e-5, "gen_disc_reg_scale": 1e-4}


def build_phase_runner(bands, normal, shadow, lit_samples, shadow_samples,
                       ratio_shadowed, ratio_deshadowed):
    import jax
    import jax.numpy as jnp

    from hypelcnn_tpu.gan.validation import compute_ratio_stats
    from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict

    normal_dev = jnp.asarray(normal)
    shadow_dev = jnp.asarray(shadow)
    n_pairs = normal.shape[0]

    def run(gan_type, batch, max_steps, val_every, lr_scale=1.0, targets=None,
            label=""):
        cfg = dict(CONFIG)
        for k in ("generator_lr", "discriminator_lr", "gen_discriminator_lr"):
            cfg[k] = CONFIG[k] * lr_scale
        trainer = get_trainer_dict(cfg, bands, max_steps)[gan_type]
        state = trainer.init_state(jax.random.key(0))
        step_fn = trainer.build_train_step()
        rng_base = jax.random.key(1)

        def one_step(carry, inp):
            state, normal_d, shadow_d = carry
            idx, step_no = inp
            key = jax.random.fold_in(rng_base, step_no)
            x = jnp.take(normal_d, idx, axis=0)
            y = jnp.take(shadow_d, idx, axis=0)
            new_state, metrics = step_fn(state, x, y, key)
            return (new_state, normal_d, shadow_d), metrics["generator_loss"]

        def chunk_fn(state, normal_d, shadow_d, idx_chunk, step_nos):
            (state, _, _), losses = jax.lax.scan(
                one_step, (state, normal_d, shadow_d), (idx_chunk, step_nos))
            return state, losses

        chunk_jit = jax.jit(chunk_fn, donate_argnums=(0,))
        host = np.random.default_rng(7)
        epochs = int(np.ceil(max_steps * batch / n_pairs)) + 1
        perms = np.concatenate([host.permutation(n_pairs) for _ in range(epochs)])
        idx_stream = perms[: max_steps * batch].astype(np.int32).reshape(
            max_steps, batch)

        # compile OUTSIDE the clock (the reference comparator's session build
        # isn't timed either); the tunnel compile is minutes at 144 bands
        warm_idx = jnp.asarray(idx_stream[:val_every])
        warm_nos = jnp.arange(val_every, dtype=jnp.uint32)
        state, losses = chunk_jit(state, normal_dev, shadow_dev, warm_idx, warm_nos)
        float(losses[-1])
        # warm the translate path too (both directions)
        params_now = jax.device_get(state.params)
        np.asarray(trainer.translate(params_now, jnp.asarray(lit_samples[:4]), True))
        np.asarray(trainer.translate(params_now, jnp.asarray(shadow_samples[:4]), False))
        # restart cleanly so the timed run begins from untrained state under
        # the already-compiled program
        state = trainer.init_state(jax.random.key(0))

        best = {"shadowed": float("inf"), "deshadowed": float("inf")}
        best_iter = {"shadowed": None, "deshadowed": None}
        reached_at = None
        history = []
        t0 = time.perf_counter()
        start = 0
        while start < max_steps:
            n = min(val_every, max_steps - start)
            idx_chunk = jnp.asarray(idx_stream[start:start + n])
            step_nos = jnp.arange(start, start + n, dtype=jnp.uint32)
            state, losses = chunk_jit(state, normal_dev, shadow_dev,
                                      idx_chunk, step_nos)
            float(losses[-1])  # fetch = sync through the tunnel
            start += n
            params_now = jax.device_get(state.params)
            gen_lit = np.asarray(trainer.translate(
                params_now, jnp.asarray(lit_samples), True))
            _, _, _, div_shadowed, _ = compute_ratio_stats(
                gen_lit, lit_samples, ratio_shadowed)
            gen_shadow = np.asarray(trainer.translate(
                params_now, jnp.asarray(shadow_samples), False))
            _, _, _, div_deshadowed, _ = compute_ratio_stats(
                gen_shadow, shadow_samples, ratio_deshadowed)
            for name, div in (("shadowed", div_shadowed),
                              ("deshadowed", div_deshadowed)):
                if div < best[name]:
                    best[name], best_iter[name] = float(div), start
            wall = time.perf_counter() - t0
            history.append({"step": start, "wall_s": round(wall, 3),
                            "js_shadowed": round(float(div_shadowed), 6),
                            "js_deshadowed": round(float(div_deshadowed), 6)})
            if targets and reached_at is None and \
                    best["shadowed"] <= targets["shadowed"] and \
                    best["deshadowed"] <= targets["deshadowed"]:
                reached_at = {"step": start, "wall_s": round(wall, 3)}
                break  # time-to-quality reached; stop the clock
        wall_total = time.perf_counter() - t0
        print(f"[{label}] batch={batch} lr_scale={lr_scale}: "
              f"best js shadowed={best['shadowed']:.6f}@{best_iter['shadowed']} "
              f"deshadowed={best['deshadowed']:.6f}@{best_iter['deshadowed']} "
              f"wall={wall_total:.1f}s reached={reached_at}")
        return {"batch": batch, "lr_scale": lr_scale, "steps_run": start,
                "best_js": best, "best_iter": best_iter,
                "wall_s": round(wall_total, 3), "reached_target_at": reached_at,
                "validations": history}

    return run


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gan_type", default="cycle_gan")
    parser.add_argument("--steps", type=int, default=2000,
                        help="phase-A steps at batch 32 (the measured "
                             "reference parity operating point)")
    parser.add_argument("--val_every_a", type=int, default=100)
    parser.add_argument("--val_every_b", type=int, default=25)
    parser.add_argument("--max_steps_b", type=int, default=None,
                        help="phase-B cap (default: phase-A steps)")
    parser.add_argument("--batch_b", type=int, default=512,
                        help="the measured batch-512 throughput peak")
    parser.add_argument("--lr_scales", default="1,2,4")
    parser.add_argument("--bands", type=int, default=144)
    parser.add_argument("--h", type=int, default=349)
    parser.add_argument("--w", type=int, default=1905)
    parser.add_argument("--samples", type=int, default=300)
    parser.add_argument("--jax_platform", default=None)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GAN_BENCH.json"))
    args = parser.parse_args(argv)

    import jax

    if args.jax_platform:
        jax.config.update("jax_platforms", args.jax_platform)

    from hypelcnn_tpu.core.registry import get_loader_from_name
    from hypelcnn_tpu.gan.sampling import read_hsi_data
    from hypelcnn_tpu.gan.validation import (adj_shadow_ratio,
                                             load_samples_for_testing)
    from hypelcnn_tpu.gan.wrapper_registry import get_sampling_map

    spec = (f"synthetic://?h={args.h}&w={args.w}&bands={args.bands}"
            f"&classes=15&seed=11")
    loader = get_loader_from_name("SyntheticDataLoader", spec)
    data_set = loader.load_data(0, True)
    shadow_map, shadow_ratio = loader.load_shadow_map(0, data_set)
    normal, shadow = read_hsi_data(loader, data_set, shadow_map, "random",
                                   get_sampling_map())
    print(f"pairs: normal={normal.shape} shadow={shadow.shape}")

    # frozen validation sample sets shared by every phase (seeded: the
    # reference's loader uses the python random module)
    random.seed(42)
    lit_samples = load_samples_for_testing(data_set, args.samples, 0,
                                           shadow_map, fetch_shadows=False)
    shadow_samples = load_samples_for_testing(data_set, args.samples, 0,
                                              shadow_map, fetch_shadows=True)
    ratio_shadowed = adj_shadow_ratio(shadow_ratio, is_shadow=False)
    ratio_deshadowed = adj_shadow_ratio(shadow_ratio, is_shadow=True)

    run = build_phase_runner(args.bands, normal, shadow, lit_samples,
                             shadow_samples, ratio_shadowed, ratio_deshadowed)

    phase_a = run(args.gan_type, 32, args.steps, args.val_every_a,
                  label="phase A (reference operating point)")
    targets = phase_a["best_js"]

    phase_b = []
    for scale in [float(s) for s in args.lr_scales.split(",")]:
        phase_b.append(run(args.gan_type, args.batch_b,
                           args.max_steps_b or args.steps, args.val_every_b,
                           lr_scale=scale, targets=targets,
                           label=f"phase B lr x{scale}"))

    winners = [r for r in phase_b if r["reached_target_at"]]
    block = {
        "gan_type": args.gan_type, "bands": args.bands,
        "scene": f"{args.h}x{args.w}",
        "device": str(jax.devices()[0].device_kind),
        "quality_gate": "best band-ratio mean JS divergence per direction "
                        "(reference gan/wrappers/gan_common.py:165-219)",
        "phase_a_reference_point": {k: phase_a[k] for k in
                                    ("batch", "steps_run", "best_js",
                                     "best_iter", "wall_s")},
        "phase_b_runs": [{k: r[k] for k in ("batch", "lr_scale", "steps_run",
                                            "best_js", "reached_target_at",
                                            "wall_s")} for r in phase_b],
        "speedup_to_quality": (round(phase_a["wall_s"]
                                     / min(r["reached_target_at"]["wall_s"]
                                           for r in winners), 2)
                               if winners else None),
        "histories": {"phase_a": phase_a["validations"],
                      "phase_b": [r["validations"] for r in phase_b]},
    }

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    out["time_to_quality"] = block
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in block.items() if k != "histories"},
                     indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
