"""Read the reference's actual .tfrecord datasets.

The reference serializes patches as tf.train.Examples with an int64
``label`` and a flat float ``image`` (`utilities/tfrecord_writer.py:45-68`),
plus a ``metadata.tfrecord`` carrying the per-split shapes (`:71-81`).
Users migrating with existing record files can load them directly: the
``RecordImporter`` falls back to this reader when it finds
``metadata.tfrecord`` instead of the native ``patch_cache.npz``.

Gated on tensorflow being importable (it is not a framework dependency —
only this compatibility shim touches it, CPU-only and eagerly).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def _require_tf():
    try:
        import tensorflow as tf  # noqa: F401
        return tf
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "Reading reference .tfrecord files requires tensorflow; "
            "convert once with utils/record_writer.py instead.") from exc


def _iter_records(tf, path: str):
    for compression in ("", "GZIP"):
        try:
            ds = tf.data.TFRecordDataset(path, compression_type=compression)
            for item in ds:
                yield bytes(item.numpy())
            return
        except tf.errors.DataLossError:
            continue  # retry as GZIP
    raise IOError(f"could not read tfrecord {path} (tried raw and GZIP)")


def read_metadata(record_dir: str) -> Dict[str, np.ndarray]:
    tf = _require_tf()
    shapes = {}
    for record in _iter_records(tf, os.path.join(record_dir, "metadata.tfrecord")):
        example = tf.train.Example()
        example.ParseFromString(record)
        for split, key in (("training", "training_data_shape"),
                           ("test", "testing_data_shape"),
                           ("validation", "validation_data_shape")):
            shapes[split] = np.array(example.features.feature[key].int64_list.value)
    return shapes


def read_split(record_dir: str, split: str, shape: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (patches [N, k, k, C] float32, labels [N] int32)."""
    tf = _require_tf()
    fname = {"training": "training.tfrecord", "test": "test.tfrecord",
             "validation": "validation.tfrecord"}[split]
    patches, labels = [], []
    element_shape = tuple(int(v) for v in shape[1:])
    for record in _iter_records(tf, os.path.join(record_dir, fname)):
        example = tf.train.Example()
        example.ParseFromString(record)
        labels.append(int(example.features.feature["label"].int64_list.value[0]))
        flat = np.asarray(example.features.feature["image"].float_list.value,
                          dtype=np.float32)
        patches.append(flat.reshape(element_shape))
    if not patches:
        return (np.zeros((0, *element_shape), np.float32), np.zeros((0,), np.int32))
    return np.stack(patches), np.asarray(labels, dtype=np.int32)


def read_reference_tfrecords(record_dir: str):
    """-> dict split -> (patches, labels) for all three splits."""
    shapes = read_metadata(record_dir)
    return {split: read_split(record_dir, split, shapes[split])
            for split in ("training", "test", "validation")}
