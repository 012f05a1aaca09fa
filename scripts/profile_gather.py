"""Microbenchmark: XLA vs Pallas window gather + train-step breakdown on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hypelcnn_tpu.ops.window_gather import gather_patches_pallas, gather_patches_xla


def timeit(fn, *args, n=20, windows=5):
    # synchronize by FETCHING a value: block_until_ready does not reliably
    # block through the axon tunnel (CLAUDE.md); median of several windows —
    # shared-chip wall-clock swings ~25x between windows
    np.asarray(fn(*args)[-1, -1, -1, -1])  # compile + settle
    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out[-1, -1, -1, -1])
        times.append((time.time() - t0) / n)
    return sorted(times)[len(times) // 2]


def main():
    rng = np.random.default_rng(0)
    for (h, w, c, k, b) in [(349, 1905, 145, 3, 512), (349, 1905, 145, 5, 512),
                            (601, 2384, 49, 7, 512), (349, 1905, 145, 3, 4096),
                            (349, 1905, 145, 3, 16384)]:
        scene = jnp.asarray(rng.uniform(size=(h + k - 1, w + k - 1, c)).astype(np.float32))
        coords = jnp.asarray(
            np.stack([rng.integers(0, w, b), rng.integers(0, h, b)], 1).astype(np.int32))
        t_xla = timeit(jax.jit(lambda s, co: gather_patches_xla(s, co, k)), scene, coords)
        bytes_moved = b * k * k * c * 4
        msg = (f"scene {h}x{w}x{c} k={k} B={b}: xla={t_xla*1e6:.0f}us "
               f"({bytes_moved/t_xla/1e9:.1f} GB/s)")
        # round-3 kernel: chunked SMEM coordinate blocks, no batch limit
        t_pal = timeit(lambda s, co: gather_patches_pallas(s, co, k), scene, coords)
        msg += f" pallas={t_pal*1e6:.0f}us ({bytes_moved/t_pal/1e9:.1f} GB/s)"
        print(msg)


if __name__ == "__main__":
    main()
