"""TF-free WRITE side of the reference's .tfrecord dataset format.

The reference prepares datasets as four files — training/test/validation
``.tfrecord`` of ``tf.train.Example`` records (int64 ``label`` + packed
float ``image``), plus an uncompressed ``metadata.tfrecord`` carrying the
three per-split shapes — via TF's own writer
(`utilities/tfrecord_writer.py:45-81`), with an optional GZIP variant for
the splits (`:46-49`, whole-file gzip stream per TFRecordOptions).

``utils/tb_events.py`` already decodes the TFRecord framing + protobuf wire
format for event files; this module is the same two layers written in the
forward direction, so a rebuild-prepared dataset can feed the reference's
own ``TFRecordImporter`` (`importer/TFRecordImporter.py:23-47`:
``tf_record_iterator`` for metadata, ``parse_single_example`` with
FixedLenFeature for the splits) with no tensorflow dependency here.

Wire layout (tensorflow/core/example/feature.proto, proto3):

- ``Example``  { ``Features features = 1`` }
- ``Features`` { ``map<string, Feature> feature = 1`` } — each map entry is
  a length-delimited submessage: key (field 1, string), value (field 2).
- ``Feature``  oneof: ``bytes_list=1`` | ``float_list=2`` | ``int64_list=3``
- ``FloatList.value = 1 [packed]`` (LE float32), ``Int64List.value = 1
  [packed]`` (varint) — packed, matching TF's own serialization.

Framing (tensorflow/core/lib/io/record_writer.cc): ``uint64 length |
uint32 masked_crc32c(length) | data | uint32 masked_crc32c(data)``.
"""

from __future__ import annotations

import gzip
import struct
from typing import Dict, Iterable, Sequence

from hypelcnn_tpu.utils.tb_events import masked_crc32c

# ------------------------------------------------------ protobuf encoders ----


def _varint(value: int) -> bytes:
    """Unsigned LEB128.  Negative int64s ride as 10-byte two's complement
    (proto scalar varint rule); labels/shapes here are non-negative."""
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _tag(field_number: int, wire_type: int) -> bytes:
    return _varint((field_number << 3) | wire_type)


def _len_delimited(field_number: int, payload: bytes) -> bytes:
    return _tag(field_number, 2) + _varint(len(payload)) + payload


def encode_int64_list_feature(values: Sequence[int]) -> bytes:
    """``Feature{int64_list: Int64List{value: [..] packed}}``."""
    packed = b"".join(_varint(int(v)) for v in values)
    int64_list = _len_delimited(1, packed) if values else b""
    return _len_delimited(3, int64_list)


def encode_float_list_feature(values) -> bytes:
    """``Feature{float_list: FloatList{value: [..] packed LE f32}}``."""
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(values, dtype="<f4").reshape(-1))
    packed = arr.tobytes()
    float_list = _len_delimited(1, packed) if arr.size else b""
    return _len_delimited(2, float_list)


def encode_bytes_list_feature(values: Iterable[bytes]) -> bytes:
    bytes_list = b"".join(_len_delimited(1, v) for v in values)
    return _len_delimited(1, bytes_list)


def encode_example(features: Dict[str, bytes]) -> bytes:
    """``Example{features: Features{feature: {name: <encoded Feature>}}}``.

    ``features`` maps name -> an already-encoded Feature message (from the
    ``encode_*_feature`` helpers).  Map entries are emitted in insertion
    order; proto map semantics make the order irrelevant to any parser.
    """
    entries = b"".join(
        _len_delimited(1, _len_delimited(1, name.encode("utf-8")) +
                       _len_delimited(2, feature))
        for name, feature in features.items())
    return _len_delimited(1, entries)


# ------------------------------------------------------- TFRecord framing ----


def write_tfrecord(path: str, records: Iterable[bytes],
                   gzip_compress: bool = False) -> None:
    """Write framed records; GZIP = whole-file gzip stream, matching
    ``TFRecordOptions(GZIP)`` (`utilities/tfrecord_writer.py:46-49`)."""
    opener = gzip.open if gzip_compress else open
    with opener(path, "wb") as f:
        for data in records:
            header = struct.pack("<Q", len(data))
            f.write(header)
            f.write(struct.pack("<I", masked_crc32c(header)))
            f.write(data)
            f.write(struct.pack("<I", masked_crc32c(data)))


# ------------------------------------------------- reference dataset files ----


def example_for_patch(patch, label: int) -> bytes:
    """One split record: the reference's exact two-feature Example
    (`utilities/tfrecord_writer.py:60-63`)."""
    return encode_example({
        "label": encode_int64_list_feature([int(label)]),
        "image": encode_float_list_feature(patch),
    })


def metadata_example(training_shape: Sequence[int], testing_shape: Sequence[int],
                     validation_shape: Sequence[int]) -> bytes:
    """The metadata record's three shape features
    (`utilities/tfrecord_writer.py:74-77`)."""
    return encode_example({
        "training_data_shape": encode_int64_list_feature(list(training_shape)),
        "testing_data_shape": encode_int64_list_feature(list(testing_shape)),
        "validation_data_shape": encode_int64_list_feature(list(validation_shape)),
    })


def write_reference_dataset(output_dir: str, splits, compressed: bool = False,
                            log_every: int = 1000) -> None:
    """Emit the reference's four-file set into ``output_dir``.

    ``splits``: dict with keys training/test/validation ->
    (patches [N,k,k,C] float32, labels [N]).  ``metadata.tfrecord`` is
    always uncompressed — the reference writes it with a plain writer even
    under ``--compressed`` (`utilities/tfrecord_writer.py:72`).
    """
    import os

    import numpy as np

    names = {"training": "training.tfrecord", "test": "test.tfrecord",
             "validation": "validation.tfrecord"}
    os.makedirs(output_dir, exist_ok=True)
    write_tfrecord(
        os.path.join(output_dir, "metadata.tfrecord"),
        [metadata_example(np.shape(splits["training"][0]),
                          np.shape(splits["test"][0]),
                          np.shape(splits["validation"][0]))])
    for split, fname in names.items():
        patches, labels = splits[split]

        def records(patches=patches, labels=labels, split=split):
            n = len(patches)
            for i in range(n):
                if log_every and not i % log_every:
                    print(f"{split}: {i}/{n}")
                yield example_for_patch(patches[i], labels[i])

        write_tfrecord(os.path.join(output_dir, fname), records(),
                       gzip_compress=compressed)
