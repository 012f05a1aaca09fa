"""Write-side tfrecord interop tests (VERDICT r4 item 7).

Fast tier: the TF-free encoder's framing + wire format verified against the
repo's own independent read side (tb_events' crc32c framing reader and
protobuf field walker).  Heavy tier: the full two-sided round-trip — rebuild
writes, the REFERENCE's TFRecordImporter parse path reads back bit-exact —
via scripts/tfrecord_roundtrip.py under the tf shims.
"""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_framing_crc_and_wire_format_roundtrip(tmp_path):
    from hypelcnn_tpu.utils.tb_events import _iter_fields, iter_tfrecord_frames
    from hypelcnn_tpu.utils.tfrecord_write import (
        example_for_patch, write_tfrecord)

    rng = np.random.default_rng(0)
    patches = rng.standard_normal((3, 2, 2, 4)).astype(np.float32)
    labels = [5, 0, 2]
    path = str(tmp_path / "t.tfrecord")
    write_tfrecord(path, [example_for_patch(p, l)
                          for p, l in zip(patches, labels)])

    frames = list(iter_tfrecord_frames(path, verify_crc=True))  # crc gate
    assert len(frames) == 3
    for frame, patch, label in zip(frames, patches, labels):
        # Example{1: Features{1: map entries}}
        (fnum, wt, features), = list(_iter_fields(frame))
        assert (fnum, wt) == (1, 2)
        decoded = {}
        for fn, _, entry in _iter_fields(features):
            assert fn == 1
            fields = list(_iter_fields(entry))
            key = dict((n, v) for n, _, v in fields)[1].decode()
            feature = dict((n, v) for n, _, v in fields)[2]
            decoded[key] = feature
        # label: Feature{3: Int64List{1: packed varint}}
        (n3, _, int64_list), = list(_iter_fields(decoded["label"]))
        assert n3 == 3
        (_, _, packed), = list(_iter_fields(int64_list))
        assert packed and packed[0] == label  # single small varint
        # image: Feature{2: FloatList{1: packed LE f32}}
        (n2, _, float_list), = list(_iter_fields(decoded["image"]))
        assert n2 == 2
        (_, _, floats), = list(_iter_fields(float_list))
        got = np.frombuffer(floats, "<f4").reshape(patch.shape)
        np.testing.assert_array_equal(got.view(np.uint32),
                                      patch.view(np.uint32))


def test_gzip_variant_is_gzip_stream(tmp_path):
    import gzip

    from hypelcnn_tpu.utils.tb_events import masked_crc32c
    from hypelcnn_tpu.utils.tfrecord_write import (
        example_for_patch, write_tfrecord)

    rec = example_for_patch(np.ones((1, 1, 2), np.float32), 1)
    path = str(tmp_path / "c.tfrecord")
    write_tfrecord(path, [rec], gzip_compress=True)
    with open(path, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # gzip magic: whole-file stream
    with gzip.open(path, "rb") as f:
        raw = f.read()
    (length,) = struct.unpack("<Q", raw[:8])
    assert length == len(rec)
    assert struct.unpack("<I", raw[8:12])[0] == masked_crc32c(raw[:8])
    assert raw[12:12 + length] == rec


def test_varint_int64_negative_and_boundaries():
    from hypelcnn_tpu.utils.tfrecord_write import _varint

    # proto scalar varint: negatives ride as 10-byte two's complement
    assert _varint(0) == b"\x00"
    assert _varint(127) == b"\x7f"
    assert _varint(128) == b"\x80\x01"
    assert len(_varint(-1)) == 10
    assert _varint(-1) == b"\xff" * 9 + b"\x01"


@pytest.mark.heavy
def test_reference_parser_reads_rebuild_records_bit_exact():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tfrecord_roundtrip.py"),
         "--n", "5", "--k", "2", "--bands", "3"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-1500:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True
    for variant in ("raw", "gzip"):
        v = rec["variants"][variant]
        assert v["patches_bit_exact"] and v["metadata_shapes_ok"] \
            and v["labels_one_hot_ok"]
