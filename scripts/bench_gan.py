"""GAN shadow-synthesis throughput bench — writes GAN_BENCH.json.

Measures device steps/s for the headline GAN wrappers (the reference's
documented long runs: `gan/gan_train_for_shadow.py` with 100k-800k steps on
a Colab GPU) at the GRSS2013 working point: 144-band pixel pairs, batch 32.

Method mirrors the production loop in `apps/gan_train_for_shadow.py`: the
jitted unit is a ``lax.scan`` chunk of CHUNK steps (pair gather by index +
train step), pair arrays ride the carry (never closed over), per-step keys
via ``fold_in``.  Median of WINDOWS timed windows — the shared chip's
wall-clock swings ~25x between windows (CLAUDE.md), so only the median is
meaningful.

Output: GAN_BENCH.json at the repo root:
  {"config": {...}, "results": {gan_type: {"steps_per_sec": ..,
   "ms_per_step": .., "windows_s": [...]}}}

Usage:  python scripts/bench_gan.py [--gan_types cycle_gan,cut_x2y,dcl_gan]
        [--chunk 200] [--windows 10] [--batch 32] [--bands 144]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor an explicit platform request: the ambient TPU plugin otherwise wins
# even when JAX_PLATFORMS is set in the environment (CLAUDE.md hazard)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict

# same hyperparameters the shipped optuna-best configs use
# (configs/gan/*.json; reference gan/gan_train_for_shadow.py defaults)
CONFIG = {"generator_lr": 2e-4, "discriminator_lr": 1e-4,
          "gen_discriminator_lr": 1e-4,
          "use_identity_loss": True, "identity_loss_weight": 0.5,
          "cycle_consistency_loss_weight": 10.0, "nce_loss_weight": 10.0,
          "tau": 0.07, "patches": 3, "embedded_feat_size": 2,
          "discriminator_reg_scale": 1e-5, "gen_disc_reg_scale": 1e-4}


def bench_one(gan_type: str, bands: int, batch: int, chunk: int,
              windows: int, n_pairs: int = 4096):
    trainer = get_trainer_dict(CONFIG, bands, max_steps=100_000)[gan_type]
    state = trainer.init_state(jax.random.key(0))
    step_fn = trainer.build_train_step()

    host = np.random.default_rng(0)
    normal = jnp.asarray(host.uniform(0, 1, (n_pairs, 1, 1, bands)),
                         dtype=jnp.float32)
    shadow = normal * 0.5
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
    idx = jnp.asarray(host.integers(0, n_pairs, (chunk, batch)).astype(np.int32))

    times = []
    step_base = 0
    final_loss = float("nan")
    for w in range(windows + 1):  # first window = warmup/compile
        step_nos = jnp.arange(step_base, step_base + chunk, dtype=jnp.uint32)
        t0 = time.perf_counter()
        state, losses = chunk_jit(state, normal, shadow, idx, step_nos)
        # time by FETCHING: through the remote tunnel block_until_ready does
        # not reliably block (verify SKILL.md), a device_get does
        final_loss = float(losses[-1])
        dt = time.perf_counter() - t0
        step_base += chunk
        if w > 0:
            times.append(dt)
    assert np.isfinite(final_loss), f"{gan_type}: non-finite loss {final_loss}"
    med = statistics.median(times)
    return {"steps_per_sec": round(chunk / med, 1),
            "ms_per_step": round(med / chunk * 1e3, 4),
            "final_generator_loss": round(final_loss, 4),
            "windows_s": [round(t, 4) for t in times]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gan_types", default="cycle_gan,cut_x2y,dcl_gan,gan_x2y")
    p.add_argument("--bands", type=int, default=144)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--batch_sweep", default=None,
                   help="comma list (e.g. 32,128,512,1024): bench each batch "
                        "size, decomposing fixed per-step overhead vs compute "
                        "(nothing in the reference pins batch 32 for "
                        "throughput, VERDICT r2)")
    p.add_argument("--fused_generator", action="store_true",
                   help="Toeplitz-matmul generator (gan/models.py impl="
                        "'toeplitz'): same params/numerics, matmul lowering")
    p.add_argument("--chunk", type=int, default=200)
    p.add_argument("--windows", type=int, default=10)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GAN_BENCH.json"))
    args = p.parse_args(argv)

    if args.fused_generator:
        CONFIG["fused_generator"] = True
    gan_types = [t.strip() for t in args.gan_types.split(",")]
    known = set(get_trainer_dict(CONFIG, args.bands, max_steps=1))
    unknown = [t for t in gan_types if t not in known]
    if unknown:  # validate BEFORE spending minutes of chip time per type
        raise SystemExit(f"unknown gan_types {unknown}; known: {sorted(known)}")

    dev = jax.devices()[0]
    out = {"config": {"bands": args.bands, "batch": args.batch,
                      "chunk": args.chunk, "windows": args.windows,
                      "device": dev.device_kind, "platform": dev.platform},
           "results": {}}
    # MERGE with an existing artifact: a crashed/partial sweep re-run with
    # the remaining gan_types must not clobber completed measurements
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            # compare the FULL measurement config, not just bands: results
            # taken at a different chunk/windows/device are not comparable
            # and must not be mixed into one artifact (ADVICE r4)
            prev_cfg = dict(prev.get("config", {}))
            if prev_cfg == out["config"]:
                out["results"].update(prev.get("results", {}))
            else:
                print(f"existing {args.out} has different config "
                      f"({prev_cfg} != {out['config']}); starting fresh")
        except (json.JSONDecodeError, KeyError):
            pass

    def flush():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")

    batches = ([int(b) for b in args.batch_sweep.split(",")]
               if args.batch_sweep else [args.batch])
    for gan_type in gan_types:
        for batch in batches:
            print(f"benching {gan_type} batch={batch} ...", flush=True)
            res = bench_one(gan_type, args.bands, batch, args.chunk,
                            args.windows)
            res["batch"] = batch
            res["patches_per_sec"] = round(res["steps_per_sec"] * batch, 1)
            if args.batch_sweep:
                out["results"].setdefault(gan_type, {})[f"batch_{batch}"] = res
            else:
                out["results"][gan_type] = res
            flush()  # each completed measurement survives a later failure
            print(f"  {gan_type} b{batch}: {res['steps_per_sec']} steps/s "
                  f"({res['ms_per_step']} ms/step, "
                  f"{res['patches_per_sec']:.0f} patches/s)", flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
