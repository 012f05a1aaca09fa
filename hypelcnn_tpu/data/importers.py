"""Input-pipeline strategies ("importers").

The reference has three (`importer/`): InMemoryImporter (eagerly gathers
every patch to host arrays, `importer/InMemoryImporter.py:27-38`),
GeneratorImporter (lazy per-target host generator,
`importer/GeneratorImporter.py:16-100`), TFRecordImporter (pre-serialized
records, `importer/TFRecordImporter.py:14-72`).

TPU-native redesign: every strategy yields a jittable :class:`PatchSource`
the train/eval steps call *inside* the compiled program:

- ``GeneratorImporter`` -> :class:`ScenePatchSource`: the padded scene lives
  in HBM and windows are gathered on-device per step.  This is the preferred
  TPU path — it replaces the reference's host generator hot loop entirely.
- ``InMemoryImporter`` -> :class:`ArrayPatchSource`: all patches are
  pre-gathered into one device array per split; a step is a pure ``take``.
- ``RecordImporter`` -> :class:`ArrayPatchSource` fed from an ``.npz`` cache
  written by :mod:`hypelcnn_tpu.utils.record_writer` (the tfrecord_writer
  equivalent) — same role: decouple training from the original scene files.

All three return an :class:`ImportedDataSet` carrying the loader, scene,
sample set and per-split patch sources.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypelcnn_tpu.core.registry import get_loader_from_name, register_importer
from hypelcnn_tpu.data.loaders.base import SampleSet


class PatchSource:
    """Jittable patch access for one split.

    The backing device arrays are exposed via :meth:`device_arrays` and
    passed explicitly into the jitted step (``gather(arrays, ...)``) —
    closing over a large concrete array would bake it into the compiled
    program as a literal constant (hundreds of MB for a real scene).
    """

    def device_arrays(self):
        raise NotImplementedError

    def gather(self, arrays, idx: jax.Array, coords: jax.Array,
               key: Optional[jax.Array] = None) -> jax.Array:
        raise NotImplementedError


class ScenePatchSource(PatchSource):
    def __init__(self, scene):
        self.scene = scene
        self._kind = type(scene).__name__

    def device_arrays(self):
        from hypelcnn_tpu.data.scene import DualResScene, MultiScene
        if isinstance(self.scene, MultiScene):
            return self.scene.device_scenes()
        if isinstance(self.scene, DualResScene):
            return self.scene.device_modalities()
        return self.scene.device_scene()

    def gather(self, arrays, idx, coords, key=None):
        del idx
        from hypelcnn_tpu.data.scene import (
            DualResScene,
            MultiScene,
            gather_from_dual,
            gather_from_multi,
            gather_from_scene,
        )
        n = self.scene.neighborhood
        if isinstance(self.scene, MultiScene):
            return gather_from_multi(arrays, coords, n, key)
        if isinstance(self.scene, DualResScene):
            casi, lidar = arrays
            return gather_from_dual(casi, lidar, coords, n)
        return gather_from_scene(arrays, coords, n)


class ArrayPatchSource(PatchSource):
    def __init__(self, patches: jax.Array):
        self.patches = patches

    def device_arrays(self):
        return self.patches

    def gather(self, arrays, idx, coords, key=None):
        del coords, key
        return jnp.take(arrays, idx, axis=0)


@dataclass
class ImportedDataSet:
    loader: Any
    scene: Any
    sample_set: SampleSet
    class_count: int
    data_shape: list
    color_list: np.ndarray
    sources: Dict[str, PatchSource]           # keys: training / test / validation
    requires_separate_validation_branch: bool = True

    def targets(self, split: str) -> np.ndarray:
        return {"training": self.sample_set.training_targets,
                "test": self.sample_set.test_targets,
                "validation": self.sample_set.validation_targets}[split]


def _load_common(loader_name: str, path: str, neighborhood: int,
                 train_ratio: float, test_ratio: float, normalize: bool = True):
    loader = get_loader_from_name(loader_name, path)
    scene = loader.load_data(neighborhood, normalize=normalize)
    sample_set = loader.load_samples(train_ratio, test_ratio)
    return loader, scene, sample_set


def _gather_all_host(scene, targets: np.ndarray) -> np.ndarray:
    """Host-side eager gather of every target patch
    (reference `importer/InMemoryImporter.py:27-38`)."""
    n = targets.shape[0]
    shape = scene.get_data_shape()
    out = np.empty((n, *shape), dtype=np.float32)
    for i in range(n):
        out[i] = scene.get_data_point(int(targets[i, 0]), int(targets[i, 1]))
    return out


class BaseImporter:
    def read_data_set(self, loader_name: str, path: str, train_ratio: float,
                      test_ratio: float, neighborhood: int,
                      normalize: bool = True) -> ImportedDataSet:
        raise NotImplementedError


@register_importer("GeneratorImporter")
class GeneratorImporter(BaseImporter):
    """On-device window gather from the HBM-resident scene (TPU-preferred)."""

    requires_separate_validation_branch = True

    def read_data_set(self, loader_name, path, train_ratio, test_ratio, neighborhood,
                      normalize=True):
        loader, scene, sample_set = _load_common(loader_name, path, neighborhood,
                                                 train_ratio, test_ratio, normalize)
        src = ScenePatchSource(scene)
        return ImportedDataSet(
            loader=loader, scene=scene, sample_set=sample_set,
            class_count=loader.get_class_count().stop,
            data_shape=scene.get_data_shape(),
            color_list=loader.get_samples_color_list(),
            sources={"training": src, "test": src, "validation": src},
            requires_separate_validation_branch=True)


@register_importer("InMemoryImporter")
class InMemoryImporter(BaseImporter):
    """Pre-gathered per-split patch arrays resident on device.

    Reference quirk documented (NOT preserved): the reference aliases the
    validation tensors to the testing ones (`importer/InMemoryImporter.py:76-78`)
    so "validation" metrics are computed on the test split; here validation
    uses the loader's real validation targets.
    """

    requires_separate_validation_branch = True

    def read_data_set(self, loader_name, path, train_ratio, test_ratio, neighborhood,
                      normalize=True):
        loader, scene, sample_set = _load_common(loader_name, path, neighborhood,
                                                 train_ratio, test_ratio, normalize)
        sources = {}
        for split, targets in (("training", sample_set.training_targets),
                               ("test", sample_set.test_targets),
                               ("validation", sample_set.validation_targets)):
            patches = _gather_all_host(scene, targets) if targets.shape[0] else \
                np.zeros((0, *scene.get_data_shape()), dtype=np.float32)
            sources[split] = ArrayPatchSource(jnp.asarray(patches))
        return ImportedDataSet(
            loader=loader, scene=scene, sample_set=sample_set,
            class_count=loader.get_class_count().stop,
            data_shape=scene.get_data_shape(),
            color_list=loader.get_samples_color_list(),
            sources=sources,
            requires_separate_validation_branch=True)


@register_importer("RecordImporter")
class RecordImporter(BaseImporter):
    """Reads the ``.npz`` patch cache written by
    :func:`hypelcnn_tpu.utils.record_writer.write_records` (tfrecord_writer
    equivalent, reference `utilities/tfrecord_writer.py:10-82` /
    `importer/TFRecordImporter.py:14-72`).  ``path`` points at the cache
    file or its directory."""

    requires_separate_validation_branch = False

    def read_data_set(self, loader_name, path, train_ratio, test_ratio, neighborhood,
                      normalize=True):
        import os
        del train_ratio, test_ratio, neighborhood, normalize
        record_dir = path if os.path.isdir(path) else os.path.dirname(path) or "."
        if not path.endswith(".npz") and \
                os.path.exists(os.path.join(record_dir, "metadata.tfrecord")):
            return self._read_reference_tfrecords(loader_name, record_dir)
        cache_path = path if path.endswith(".npz") else os.path.join(path, "patch_cache.npz")
        blob = np.load(cache_path, allow_pickle=False)
        sources = {}
        sample_targets = {}
        for split in ("training", "test", "validation"):
            patches = blob[f"{split}_patches"]
            sample_targets[split] = blob[f"{split}_targets"]
            sources[split] = ArrayPatchSource(jnp.asarray(patches))
        sample_set = SampleSet(training_targets=sample_targets["training"],
                               test_targets=sample_targets["test"],
                               validation_targets=sample_targets["validation"])
        class_count = int(blob["class_count"])
        color_list = blob["color_list"] if "color_list" in blob else \
            np.zeros((class_count, 3), dtype=np.uint8)
        return ImportedDataSet(
            loader=None, scene=None, sample_set=sample_set,
            class_count=class_count,
            data_shape=list(blob["data_shape"]),
            color_list=color_list,
            sources=sources,
            requires_separate_validation_branch=False)

    def _read_reference_tfrecords(self, loader_name, record_dir):
        """Load the reference's own .tfrecord files
        (format: `utilities/tfrecord_writer.py:45-81` in the reference)."""
        from hypelcnn_tpu.utils.tfrecord_compat import read_reference_tfrecords
        splits = read_reference_tfrecords(record_dir)
        sources = {}
        sample_targets = {}
        data_shape = None
        for split, (patches, labels) in splits.items():
            # the reference record format stores ONLY {label, image}
            # (`utilities/tfrecord_writer.py:61-62`) — positions never
            # existed, so zero (x, y) is exact parity, and anything needing
            # scene coordinates (scene scatter, target rasterization) must
            # use a scene-backed importer instead
            targets = np.zeros((labels.shape[0], 3), dtype=np.int32)
            targets[:, 2] = labels
            sample_targets[split] = targets
            sources[split] = ArrayPatchSource(jnp.asarray(patches))
            if patches.shape[0]:
                data_shape = list(patches.shape[1:])
        sample_set = SampleSet(training_targets=sample_targets["training"],
                               test_targets=sample_targets["test"],
                               validation_targets=sample_targets["validation"])
        class_count = int(max(int(t[:, 2].max(initial=0)) for t in sample_targets.values())) + 1
        color_list = np.zeros((class_count, 3), dtype=np.uint8)
        if loader_name:
            try:
                from hypelcnn_tpu.core.registry import get_loader_from_name
                loader = get_loader_from_name(loader_name, record_dir)
                class_count = loader.get_class_count().stop
                color_list = loader.get_samples_color_list()
            except Exception:
                loader = None
        else:
            loader = None
        return ImportedDataSet(
            loader=loader, scene=None, sample_set=sample_set,
            class_count=class_count, data_shape=data_shape,
            color_list=color_list, sources=sources,
            requires_separate_validation_branch=False)
