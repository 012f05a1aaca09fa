"""Capture a device profile trace of the GAN training chunk (VERDICT r3 3b).

Same jitted unit as scripts/bench_gan.py / apps/gan_train_for_shadow.py: a
``lax.scan`` chunk of train steps over HBM-resident pair arrays.  Inspect
with scripts/analyze_profile.py <out>.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/jax_gan_trace")
    parser.add_argument("--gan_type", default="cycle_gan")
    parser.add_argument("--bands", type=int, default=144)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--chunk", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_gan import CONFIG
    from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict

    trainer = get_trainer_dict(CONFIG, args.bands, max_steps=100_000)[args.gan_type]
    state = trainer.init_state(jax.random.key(0))
    step_fn = trainer.build_train_step()

    host = np.random.default_rng(0)
    n_pairs = 4096
    normal = jnp.asarray(host.uniform(0, 1, (n_pairs, 1, 1, args.bands)),
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
    idx = jnp.asarray(host.integers(0, n_pairs, (args.chunk, args.batch))
                      .astype(np.int32))
    nos = jnp.arange(args.chunk, dtype=jnp.uint32)
    state, losses = chunk_jit(state, normal, shadow, idx, nos)
    print("compiled; warm loss:", float(losses[-1]))  # fetch = sync

    with jax.profiler.trace(args.out):
        state, losses = chunk_jit(state, normal, shadow,
                                  idx, nos + args.chunk)
        print("traced loss:", float(losses[-1]))
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
