"""Full-scene classification inference.

Replaces the reference's feed-loop sweep — every scene pixel flowing
host->device->host per batch through ``perform_prediction``
(`common/common_nn_ops.py:313-327`, driven by
`classify/infer_for_classification.py:86-128`) — with an on-device sharded
sweep: the padded scene stays in HBM, pixel coordinates are generated
on-device, window gather + model forward run as one jitted program per
mega-batch, and only the argmax class ids come back to the host.

Spatial sharding over the mesh's ``data`` axis is this domain's "context
parallelism": each chip sweeps a horizontal band of the scene.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypelcnn_tpu.models.base import NNModel

INVALID_TARGET_VALUE = 255  # reference common/common_nn_ops.py:20

# The jitted sweep programs are cached by their static configuration.
# Defining the @jax.jit closure inside each call would make every
# invocation a fresh cache miss — through the remote-compile tunnel that
# is ~20 s of recompile per call vs ~1 s of actual compute for a full
# GRSS2013 scene.  Modules are keyed by identity (flax modules holding
# dict attributes are unhashable); the cache keeps a strong reference to
# the keyed module so its id cannot be recycled while the entry lives.

_PROGRAM_CACHE: "OrderedDict" = OrderedDict()


def _module_cached(builder):
    @functools.wraps(builder)
    def lookup(module, *key_rest):
        key = (builder.__name__, id(module), key_rest)
        entry = _PROGRAM_CACHE.get(key)
        if entry is not None and entry[0] is module:
            # LRU: refresh on hit so a long-lived server cycling module
            # instances evicts cold entries, not the hot sweep (~20 s
            # remote recompile to re-pay)
            _PROGRAM_CACHE.move_to_end(key)
            return entry[1]
        while len(_PROGRAM_CACHE) > 64:
            # evict least-recently-used: a full clear() would drop every hot
            # compiled sweep at once and re-pay ~20 s remote recompile each
            _PROGRAM_CACHE.popitem(last=False)
        fn = builder(module, *key_rest)
        _PROGRAM_CACHE[key] = (module, fn)
        return fn
    return lookup


@_module_cached
def _build_target_step(module, k: int):
    @jax.jit
    def step(sc, v, coords):
        from hypelcnn_tpu.ops.window_gather import gather_patches_xla
        patches = gather_patches_xla(sc, coords, k)
        out = module.apply(v, patches, train=False)
        return jnp.argmax(out.y_conv, axis=1)
    return step


def predict_targets(module, variables, scene, targets_xy: np.ndarray,
                    batch_size: int = 4096) -> np.ndarray:
    """Predict class ids for an explicit (x, y) target list."""
    k = 2 * scene.neighborhood + 1
    scene_dev = scene.device_scene()
    step = _build_target_step(module, k)

    n = targets_xy.shape[0]
    preds = np.empty((n,), dtype=np.int32)
    coords_all = np.asarray(targets_xy[:, :2], dtype=np.int32)
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        pad = batch_size - (end - start)
        coords = np.pad(coords_all[start:end], ((0, pad), (0, 0)))
        batch_preds = np.asarray(step(scene_dev, variables, jnp.asarray(coords)))
        preds[start:end] = batch_preds[: end - start]
    return preds


def _band_coords(batch_rows: int, width: int, row_start, mesh):
    """On-device dense pixel coordinates for one row-band; optionally sharded
    over the mesh's data axis (spatial "context parallelism": each chip
    sweeps a slice of the band, the scene replicated in every chip's HBM)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (batch_rows, width), 0) + row_start
    cols = jax.lax.broadcasted_iota(jnp.int32, (batch_rows, width), 1)
    coords = jnp.stack([cols.reshape(-1), rows.reshape(-1)], axis=1)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from hypelcnn_tpu.parallel.mesh import DATA_AXIS
        coords = jax.lax.with_sharding_constraint(
            coords, NamedSharding(mesh, P(DATA_AXIS, None)))
    return coords


@_module_cached
def _build_band_sweep(module, batch_rows: int, width: int, k: int, mesh):
    @jax.jit
    def sweep_rows(sc, v, row_start):
        # batched window gather over a dense row-band of pixels; measured
        # faster per pixel than a static-shift im2col variant (XLA picks
        # better layouts for the gather at this batch size) and compiles
        # far faster
        coords = _band_coords(batch_rows, width, row_start, mesh)
        from hypelcnn_tpu.ops.window_gather import gather_patches_xla
        patches = gather_patches_xla(sc, coords, k)
        out = module.apply(v, patches, train=False)
        return jnp.argmax(out.y_conv, axis=1).reshape(batch_rows, width)
    return sweep_rows


@_module_cached
def _build_scan_sweep(module, batch_rows: int, width: int, k: int, mesh):
    @jax.jit
    def sweep(sc, v, starts):
        def body(carry, row_start):
            coords = _band_coords(batch_rows, width, row_start, mesh)
            from hypelcnn_tpu.ops.window_gather import gather_patches_xla
            patches = gather_patches_xla(sc, coords, k)
            out = module.apply(v, patches, train=False)
            return carry, jnp.argmax(out.y_conv, axis=1).astype(jnp.int32).reshape(
                batch_rows, width)
        _, blocks = jax.lax.scan(body, None, starts)
        return blocks
    return sweep


def predict_full_scene(module, variables, scene, batch_rows: int = 16,
                       mesh=None) -> np.ndarray:
    """Classify every pixel; returns an [H, W] uint8 class map.

    Row-major mega-batches of ``batch_rows`` full scene rows each; the
    coordinate grid is generated on-device (broadcasted_iota), so the host
    never materializes per-pixel work.  ~665k pixels for GRSS2013 run in a
    few jitted calls instead of the reference's ~665k-element feed loop.
    The scene and params are program ARGUMENTS (a closure would bake the
    scene into the compiled program as a multi-hundred-MB constant).
    """
    height, width = scene.get_scene_shape()
    k = 2 * scene.neighborhood + 1
    scene_dev = scene.device_scene()
    sweep_rows = _build_band_sweep(module, batch_rows, width, k, mesh)

    result = np.empty((height, width), dtype=np.int32)
    padded_h = ((height + batch_rows - 1) // batch_rows) * batch_rows
    # pad the scene sweep by clamping the last block's row_start
    for row_start in range(0, padded_h, batch_rows):
        rs = min(row_start, height - batch_rows) if height >= batch_rows else 0
        block = np.asarray(sweep_rows(scene_dev, variables, rs))
        take = min(batch_rows, height - rs)
        result[rs:rs + take] = block[:take]
    return result.astype(np.uint8)


def predict_full_scene_scan(module, variables, scene, batch_rows: int = 16,
                            mesh=None) -> np.ndarray:
    """Classify every pixel in ONE jitted dispatch (``lax.scan`` over bands).

    Same sweep as :func:`predict_full_scene`, but the loop over row-bands
    runs on-device: at tunnel dispatch latencies (0.25-5 s per call) the
    per-band dispatch loop costs more than the compute itself.  The band
    row-starts are precomputed (last band clamped into range), so every
    scan step is the same static-shape program.
    """
    height, width = scene.get_scene_shape()
    k = 2 * scene.neighborhood + 1
    scene_dev = scene.device_scene()
    n_bands = (height + batch_rows - 1) // batch_rows
    row_starts = np.minimum(np.arange(n_bands, dtype=np.int32) * batch_rows,
                            max(height - batch_rows, 0)).astype(np.int32)
    sweep = _build_scan_sweep(module, batch_rows, width, k, mesh)

    blocks = np.asarray(sweep(scene_dev, variables, jnp.asarray(row_starts)))
    result = np.empty((height, width), dtype=np.int32)
    for rs, block in zip(row_starts, blocks):
        take = min(batch_rows, height - rs)
        result[rs:rs + take] = block[:take]
    return result.astype(np.uint8)


def create_colored_image(target_image: np.ndarray, color_list: np.ndarray) -> np.ndarray:
    """Class map -> RGB via LUT (reference `common/common_nn_ops.py:455-462`),
    vectorized."""
    lut = np.zeros((256, 3), dtype=np.uint8)
    lut[: len(color_list)] = color_list
    return lut[target_image]


def create_target_image_via_samples(sample_set, scene_shape) -> np.ndarray:
    """Rasterize the sample set into a class map (reference `:465-470`)."""
    image = np.full((scene_shape[0], scene_shape[1]), INVALID_TARGET_VALUE, dtype=np.uint8)
    targets = np.vstack([sample_set.training_targets, sample_set.test_targets,
                         sample_set.validation_targets])
    for point in targets.astype(int):
        image[point[1], point[0]] = point[2]
    return image
