"""On-device neighborhood window gather.

This op replaces the reference's #1 hot loop: the host-side per-patch numpy
slice feeding training and inference (`common/common_nn_ops.py:169-185`, and
its numba dual-resolution variant `loader/GRSS2018DataLoader.py:12-44`).  In
the rebuild the padded scene lives in device HBM and a batch of (x, y) sample
coordinates is turned into a batch of [k, k, C] windows on-device, fused
ahead of the model inside the same jitted step — no host round-trip, no
per-pixel Python.

Two implementations:

- ``gather_patches_xla``: one fused advanced-indexing gather — the
  production path on every backend (measured near HBM bandwidth standalone,
  and ~7x faster than a vmapped dynamic_slice when lowered inside scan
  train loops; ``gather_patches_slice`` keeps that variant for A/B).
- ``gather_patches_pallas``: a Pallas TPU kernel using
  ``PrefetchScalarGridSpec`` — coordinates are scalar-prefetched into SMEM so
  each grid step issues one aligned async DMA of its window from the
  HBM-resident scene into VMEM scratch, then stores it to the pipelined
  output block.  Runs COMPILED on real TPU hardware (round 2): the round-1
  version DMA'd directly into the Mosaic-pipelined output block, which
  deadlocks the chip — the fix is DMA -> scratch -> normal store, letting
  Mosaic keep ownership of the output pipeline.  Measured vs the XLA gather
  at batch 512 on v5e: 29.1 ms vs 28.0 ms (both round-trip-dominated; the
  gather itself is bandwidth-bound either way), and the scalar-prefetch
  coordinate buffer exceeds SMEM beyond batch ~1k — so the XLA gather
  remains the production path and this kernel stays the scaffold for
  future per-modality fusions.

The dual-resolution variant (CASI at half the LiDAR resolution, GRSS2018)
is ``gather_patches_dual``: per-modality integer scale factors reproduce
``int(index * scale)`` resampling semantics of the reference numba kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_patches_xla(scene: jax.Array, coords: jax.Array, patch_size: int) -> jax.Array:
    """Gather ``[k, k, C]`` windows for a batch of coordinates.

    Args:
      scene: ``[Hp, Wp, C]`` padded scene (pad = neighborhood on each side,
        reference `common/common_nn_ops.py:54-60`).
      coords: ``[B, 2]`` int32 of (x, y) in unpadded scene space; the padding
        offset cancels the neighborhood back-step exactly as in the reference
        (`common/common_nn_ops.py:169-173`), so the window starts at (y, x).
      patch_size: k = 2 * neighborhood + 1 (static).

    Returns: ``[B, k, k, C]`` windows.

    Implementation note: one fused advanced-indexing gather.  A vmapped
    ``lax.dynamic_slice`` is equivalent semantically but lowers poorly
    inside ``lax.scan`` train loops (measured 2.8 ms vs 0.4 ms per step at
    batch 2048 on v5e).  Out-of-bounds indices clamp (gather semantics).
    """
    k = patch_size
    coords = coords.astype(jnp.int32)
    ys = coords[:, 1][:, None, None] + jnp.arange(k, dtype=jnp.int32)[None, :, None]
    xs = coords[:, 0][:, None, None] + jnp.arange(k, dtype=jnp.int32)[None, None, :]
    return scene[ys, xs]


def gather_patches_slice(scene: jax.Array, coords: jax.Array, patch_size: int) -> jax.Array:
    """vmapped-dynamic-slice variant of :func:`gather_patches_xla`.

    Same result; different lowering.  The fused indexing form measured
    faster everywhere once timings were contention-controlled (3.5x faster
    for full-scene sweeps, ~7x inside scan train loops); this variant is
    kept for A/B comparisons.
    """
    def one(xy):
        return jax.lax.dynamic_slice(
            scene, (xy[1], xy[0], 0), (patch_size, patch_size, scene.shape[2]))
    return jax.vmap(one)(coords.astype(jnp.int32))


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _gather_kernel_chunked(coords_ref, scene_ref, out_ref, scratch, sems):
    # scene is flattened to [H, W*Cp] with Cp a multiple of 128, so a window
    # row of k pixels is one lane-aligned slice of length k*Cp at x*Cp —
    # the whole [k, k*Cp] window moves in ONE DMA regardless of x.
    # G windows are processed per grid step: all G DMAs are issued before
    # any is waited on, so the copies overlap in the DMA engines.  The DMAs
    # land in VMEM scratch and a normal store hands the chunk to the
    # pipelined output block: DMAing directly into the Mosaic-managed
    # output block deadlocks the chip (the round-1 bug).
    g = out_ref.shape[0]
    k = out_ref.shape[1]
    row_len = out_ref.shape[3]
    cp = row_len // k

    def window_copy(j):
        x = coords_ref[j, 0]
        y = coords_ref[j, 1]
        return pltpu.make_async_copy(
            scene_ref.at[pl.ds(y, k), :, pl.ds(x * cp, row_len)],
            scratch.at[j], sems.at[j])

    def issue(j, carry):
        window_copy(j).start()
        return carry

    def drain(j, carry):
        window_copy(j).wait()
        return carry

    jax.lax.fori_loop(0, g, issue, 0)
    jax.lax.fori_loop(0, g, drain, 0)
    out_ref[:] = scratch[:]


@functools.partial(jax.jit, static_argnames=("patch_size", "interpret", "chunk"))
def gather_patches_pallas(scene: jax.Array, coords: jax.Array, patch_size: int,
                          interpret: bool = False, chunk: int = 128) -> jax.Array:
    """Pallas TPU window gather: scene stays in HBM; each grid step moves
    ``chunk`` whole windows with overlapping async DMAs into VMEM scratch,
    then stores the chunk to the pipelined output block.

    Mosaic constrains HBM slice shapes/offsets on the two minor (tiled)
    dims, so the scene is laid out as ``[H, 1, W*Cp]`` with channels padded
    to a multiple of 128: row slicing rides the untiled major dim and any
    window-row lane slice is aligned by construction.  (Peak-throughput
    callers should pre-pad once and reuse; this entry pads per call, which
    XLA fuses but still costs a scene copy.)

    NO batch limit (round-3 fix of the round-2 ``batch <= 512`` SMEM cap):
    coordinates arrive as a pipelined SMEM *input block* of ``chunk`` rows
    per grid step instead of a whole-array scalar prefetch — the output
    index map never needed the coordinate values, so prefetch was the wrong
    tool.  The batch is padded to a multiple of ``chunk`` (duplicate reads,
    sliced off afterwards).

    COMPILED A/B on the v5e (round 4, scripts/profile_gather.py, median of
    5 fetch-synchronized windows): the XLA gather wins at every measured
    shape — 3.5/3.5/4.3 ms vs 9.1/9.2/9.5 ms at batch 512 (k=3/5/7),
    4.0 vs 9.4 ms at batch 4096, 6.4 vs 10.5 ms at batch 16384 (timings
    round-trip-dominated; the ratio is what matters).  The per-window DMA
    issue/drain loops cost more than XLA's fused gather at small k, and the
    advantage does not appear at any batch — so the XLA gather REMAINS the
    production path and this kernel stays a scaffold for future
    per-modality fusions (e.g. gather+normalize in one pass).
    """
    batch = coords.shape[0]
    h, w, channels = scene.shape
    cp = _pad128(channels)
    k = patch_size
    # VMEM guard: each grid step holds the scratch chunk plus the (double-
    # buffered) output block, ~3 copies of chunk*k*k*cp elements.  Scale the
    # chunk down so that stays inside a conservative VMEM budget (v5e has
    # 128 MiB/core but Mosaic needs headroom for pipeline buffers) instead
    # of failing to compile at large k/cp (e.g. k=9, cp=512 fp32).
    vmem_budget = 48 * 1024 * 1024
    per_window = 3 * k * k * cp * jnp.dtype(scene.dtype).itemsize
    g = max(1, min(chunk, batch, vmem_budget // per_window))
    padded = ((batch + g - 1) // g) * g
    scene_flat = jnp.pad(scene, ((0, 0), (0, 0), (0, cp - channels))).reshape(h, 1, w * cp)
    coords = jnp.pad(coords.astype(jnp.int32), ((0, padded - batch), (0, 0)))
    grid_spec = pl.GridSpec(
        grid=(padded // g,),
        in_specs=[
            pl.BlockSpec((g, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (g, k, 1, k * cp),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((g, k, 1, k * cp), scene.dtype),
                        pltpu.SemaphoreType.DMA((g,))],
    )
    windows = pl.pallas_call(
        _gather_kernel_chunked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded, k, 1, k * cp), scene.dtype),
        interpret=interpret,
    )(coords, scene_flat)
    return windows[:batch].reshape(batch, k, k, cp)[..., :channels]


def gather_patches(scene: jax.Array, coords: jax.Array, patch_size: int,
                   backend: str = "auto") -> jax.Array:
    """Dispatch between the window-gather implementations.

    ``auto`` resolves to the XLA gather (bandwidth-bound on TPU already);
    pass ``backend="pallas"`` explicitly to use the experimental kernel.
    """
    if backend == "pallas":
        return gather_patches_pallas(scene, coords, patch_size)
    return gather_patches_xla(scene, coords, patch_size)


def gather_patches_dual(casi: jax.Array, lidar: jax.Array, coords: jax.Array,
                        neighborhood: int, casi_scale: float = 0.5) -> jax.Array:
    """Dual-resolution gather: CASI sampled at ``casi_scale``, LiDAR at 1.0.

    Reproduces the reference numba kernels' index math
    (`loader/GRSS2018DataLoader.py:12-44`): window start for a modality with
    scale s is ``int(point * s) + neighborhood - int(neighborhood * s)``, and
    output pixel (yi, xi) reads the modality at offset ``int(i * s)``.

    Returns ``[B, k, k, C_casi + 1]`` with LiDAR as the last channel.
    """
    k = 2 * neighborhood + 1
    actual_pad = int(neighborhood * casi_scale)
    offs = (jnp.arange(k) * casi_scale).astype(jnp.int32)  # int(i * scale)
    coords = coords.astype(jnp.int32)

    cx = (coords[:, 0].astype(jnp.float32) * casi_scale).astype(jnp.int32) \
        + neighborhood - actual_pad
    cy = (coords[:, 1].astype(jnp.float32) * casi_scale).astype(jnp.int32) \
        + neighborhood - actual_pad
    # fused advanced-indexing gathers; OOB indices clamp (gather semantics)
    casi_patch = casi[cy[:, None, None] + offs[None, :, None],
                      cx[:, None, None] + offs[None, None, :]]
    full = jnp.arange(k, dtype=jnp.int32)
    lidar_patch = lidar[coords[:, 1][:, None, None] + full[None, :, None],
                        coords[:, 0][:, None, None] + full[None, None, :]]
    return jnp.concatenate([casi_patch, lidar_patch.astype(casi_patch.dtype)], axis=-1)
