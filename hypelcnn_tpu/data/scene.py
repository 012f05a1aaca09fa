"""Scene containers: padding, normalization, and on-device residency.

Equivalent of the reference's ``DataSet``/``BasicDataSet``
(`common/common_nn_ops.py:23-106`): symmetric-pads CASI+LiDAR by the
neighborhood, per-band min/max-normalizes CASI and scalar min/max-normalizes
LiDAR, and exposes patch extraction.  The TPU-native difference: the scene
is materialized once as a single fused ``[Hp, Wp, C(+1)]`` device array in
HBM (:meth:`Scene.device_scene`), and batch patch extraction happens
on-device via :mod:`hypelcnn_tpu.ops.window_gather` instead of per-pixel
host slicing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hypelcnn_tpu.ops.window_gather import gather_patches_dual, gather_patches_xla


def gather_from_scene(scene_dev: jax.Array, coords: jax.Array, neighborhood: int) -> jax.Array:
    """Pure batched window gather; ``scene_dev`` passed explicitly so jitted
    callers don't capture a huge array as a program constant."""
    return gather_patches_xla(scene_dev, coords, 2 * neighborhood + 1)


def gather_from_dual(casi: jax.Array, lidar: jax.Array, coords: jax.Array,
                     neighborhood: int) -> jax.Array:
    return gather_patches_dual(casi, lidar, coords, neighborhood,
                               DualResScene.CASI_SCALE)


def gather_from_multi(arrays, coords: jax.Array, neighborhood: int,
                      key: Optional[jax.Array] = None) -> jax.Array:
    """Random-source gather over member scenes (MultiScene).

    ``arrays`` is ``(stacked_unique, lookup)``: duplicate members (e.g. the
    1:3 original:shadowed weighting, reference
    `loader/GULFPORTALTDataLoader.py:60`) are stored ONCE in HBM and the
    weighting lives in the small ``lookup`` table the random draw indexes.
    """
    stacked, lookup = arrays
    k = 2 * neighborhood + 1
    n_members = lookup.shape[0]
    coords = coords.astype(jnp.int32)
    if key is None:
        member = jnp.zeros((coords.shape[0],), dtype=jnp.int32)
    else:
        member = jax.random.randint(key, (coords.shape[0],), 0, n_members)
    src = jnp.take(lookup, member)
    offs = jnp.arange(k, dtype=jnp.int32)
    ys = coords[:, 1][:, None, None] + offs[None, :, None]
    xs = coords[:, 0][:, None, None] + offs[None, None, :]
    return stacked[src[:, None, None], ys, xs]


class Scene:
    """A padded, normalized scene with optional LiDAR band.

    Normalization statistics may be injected (``casi_min``/``casi_max``...)
    so shadow-augmented variants reuse the original scene's range, matching
    the reference (`loader/GULFPORTALTDataLoader.py:58-61`).
    """

    def __init__(self, casi: Optional[np.ndarray], lidar: Optional[np.ndarray],
                 neighborhood: int, normalize: bool,
                 casi_min=None, casi_max=None, lidar_min=None, lidar_max=None,
                 shadow_creator_dict=None) -> None:
        self.neighborhood = neighborhood
        self.shadow_creator_dict = shadow_creator_dict
        self.casi_unnormalized_dtype = None if casi is None else casi.dtype

        pad = ((neighborhood, neighborhood), (neighborhood, neighborhood), (0, 0))
        if lidar is not None:
            lidar = np.pad(lidar, pad, mode="symmetric")
        if casi is not None:
            casi = np.pad(casi, pad, mode="symmetric")

        self.casi_min, self.casi_max = 0, 1
        self.lidar_min, self.lidar_max = 0, 1
        if normalize:
            if lidar is not None:
                self.lidar_min = np.min(lidar) if lidar_min is None else lidar_min
                lidar = lidar - self.lidar_min
                self.lidar_max = np.max(lidar) if lidar_max is None else lidar_max
                lidar = lidar / self.lidar_max
            if casi is not None:
                self.casi_min = np.min(casi, axis=(0, 1)) if casi_min is None else casi_min
                casi = casi - self.casi_min
                self.casi_max = np.max(casi, axis=(0, 1)) if casi_max is None else casi_max
                casi = casi / np.asarray(self.casi_max, dtype=np.float32)

        self.casi = casi
        self.lidar = lidar
        self._device_scene: Optional[jax.Array] = None

    # ---- shape contracts (reference common/common_nn_ops.py:84-103) ----

    def get_data_shape(self) -> list:
        dim = self.neighborhood * 2 + 1
        channels = self.casi.shape[2] + (0 if self.lidar is None else 1)
        return [dim, dim, channels]

    def get_casi_band_count(self) -> int:
        return self.casi.shape[2]

    def get_scene_shape(self) -> list:
        padding = self.neighborhood * 2
        primary = self.lidar if self.lidar is not None else self.casi
        return [primary.shape[0] - padding, primary.shape[1] - padding]

    def get_unnormalized_casi_dtype(self):
        return self.casi_unnormalized_dtype

    # ---- host-side patch extraction (tests / parity checks) ----

    def get_data_point(self, point_x: int, point_y: int) -> np.ndarray:
        k = 2 * self.neighborhood + 1
        window = self.casi[point_y:point_y + k, point_x:point_x + k, :]
        if self.lidar is None:
            return window
        return np.concatenate(
            [window, self.lidar[point_y:point_y + k, point_x:point_x + k, :]], axis=2)

    # ---- device-side scene + batched gather (the TPU path) ----

    def device_scene(self) -> jax.Array:
        """The fused float32 scene array, cached on device (HBM-resident).

        Always float32: compute dtype is the model's concern (its first
        operation casts), and a dtype-keyed cache invited silent staleness.
        """
        if self._device_scene is None:
            parts = []
            if self.casi is not None:
                parts.append(np.asarray(self.casi, dtype=np.float32))
            if self.lidar is not None:
                parts.append(np.asarray(self.lidar, dtype=np.float32))
            fused = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=2)
            self._device_scene = jnp.asarray(fused)
        return self._device_scene

    def gather_batch(self, coords: jax.Array) -> jax.Array:
        """Gather ``[B, k, k, C]`` patches on-device for (x, y) coords."""
        k = 2 * self.neighborhood + 1
        return gather_patches_xla(self.device_scene(), coords, k)

    def warm_cache(self) -> None:
        """Materialize device buffers eagerly (must happen outside jit traces)."""
        self.device_scene()


class DualResScene(Scene):
    """GRSS2018-style scene: CASI at 0.5x the LiDAR resolution.

    Patch extraction resamples CASI with ``int(i * 0.5)`` indexing while
    LiDAR is read at full resolution, matching the reference numba kernels
    (`loader/GRSS2018DataLoader.py:12-44`).  Note the CASI array here is the
    *full-size* padded grid of the reference (padded by ``neighborhood`` like
    LiDAR) — only the sampling differs.
    """

    CASI_SCALE = 0.5

    def get_data_point(self, point_x: int, point_y: int) -> np.ndarray:
        n = self.neighborhood
        k = 2 * n + 1
        actual_pad = int(n * self.CASI_SCALE)
        sx = int(point_x * self.CASI_SCALE) + n - actual_pad
        sy = int(point_y * self.CASI_SCALE) + n - actual_pad
        offs = (np.arange(k) * self.CASI_SCALE).astype(int)
        casi_patch = self.casi[np.ix_(sy + offs, sx + offs)]
        lidar_patch = self.lidar[point_y:point_y + k, point_x:point_x + k, :]
        return np.concatenate([casi_patch, lidar_patch.astype(casi_patch.dtype)], axis=2)

    def device_modalities(self):
        if getattr(self, "_device_modalities", None) is None:
            self._device_modalities = (
                jnp.asarray(np.asarray(self.casi, dtype=np.float32)),
                jnp.asarray(np.asarray(self.lidar, dtype=np.float32)))
        return self._device_modalities

    def warm_cache(self) -> None:
        self.device_modalities()

    def gather_batch(self, coords: jax.Array) -> jax.Array:
        casi, lidar = self.device_modalities()
        return gather_patches_dual(casi, lidar, coords, self.neighborhood, self.CASI_SCALE)


class MultiScene:
    """Randomly picks a member scene per sample (GULFPORT-ALT MIXED mode,
    reference `loader/GULFPORTALTDataLoader.py:17-42`).

    On-device: all member scenes are stacked into ``[S, Hp, Wp, C]`` and the
    per-sample source index becomes part of the gather coordinates, so the
    random choice is a jitted ``lax.dynamic_slice`` start index rather than a
    Python branch.
    """

    def __init__(self, scenes: Sequence[Scene]):
        assert len(scenes) > 0
        self.scenes = list(scenes)
        self.neighborhood = scenes[0].neighborhood
        self._stacked = None

    def __getattr__(self, item):
        return getattr(self.scenes[0], item)

    def get_data_point(self, point_x: int, point_y: int) -> np.ndarray:
        idx = np.random.randint(0, len(self.scenes))
        return self.scenes[idx].get_data_point(point_x, point_y)

    def device_scenes(self):
        """``(stacked_unique, lookup)``: duplicate members are uploaded and
        stored once; the member->unique ``lookup`` carries the sampling
        weight (e.g. [0, 1, 1, 1] for the 1:3 MIXED weighting) so HBM holds
        each distinct scene a single time."""
        if self._stacked is None:
            unique: list = []
            lookup = []
            for scene in self.scenes:
                for i, seen in enumerate(unique):
                    if seen is scene:
                        lookup.append(i)
                        break
                else:
                    lookup.append(len(unique))
                    unique.append(scene)
            self._stacked = (
                jnp.stack([s.device_scene() for s in unique], axis=0),
                jnp.asarray(lookup, dtype=jnp.int32))
        return self._stacked

    def warm_cache(self) -> None:
        self.device_scenes()

    def gather_batch(self, coords: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        return gather_from_multi(self.device_scenes(), coords, self.neighborhood, key)
