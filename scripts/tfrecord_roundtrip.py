"""Write-side tfrecord interop round-trip (VERDICT r4 item 7).

The rebuild writes the reference's four-file ``.tfrecord`` dataset with the
TF-free encoder (`hypelcnn_tpu/utils/tfrecord_write.py`); the REFERENCE's
own ``TFRecordImporter`` parse path reads it back:

- metadata: ``tf.compat.v1.python_io.tf_record_iterator`` +
  ``tf.train.Example.ParseFromString`` (`importer/TFRecordImporter.py:23-29`)
- splits: ``tf.data.TFRecordDataset`` mapped through the reference's actual
  ``TFRecordImporter.extract_fn`` (FixedLenFeature parse + reshape + one_hot,
  `importer/TFRecordImporter.py:40-50`), GZIP variant included.

PASS = every float32 patch is BIT-exact (uint32 view equality) and every
label/one-hot matches.  Prints one JSON line; exit 0 on pass.
"""

import argparse
import json
import os
import sys

import numpy as np

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, SCRIPTS_DIR)
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=13, help="records per split")
    parser.add_argument("--k", type=int, default=3, help="patch edge")
    parser.add_argument("--bands", type=int, default=5)
    parser.add_argument("--classes", type=int, default=4)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()
    import tensorflow as tf

    from importer.TFRecordImporter import TFRecordImporter

    from hypelcnn_tpu.utils.tfrecord_write import write_reference_dataset

    rng = np.random.default_rng(42)
    shape = (args.k, args.k, args.bands)
    splits = {}
    for i, split in enumerate(("training", "test", "validation")):
        n = args.n + i  # distinct sizes so metadata shapes are discriminating
        # adversarial float32 content: denormals, negatives, exact zeros
        patches = rng.standard_normal((n, *shape)).astype(np.float32)
        patches[0].flat[0] = np.float32(1.401298464324817e-45)  # denormal
        patches[0].flat[1] = -0.0
        labels = rng.integers(0, args.classes, size=n).astype(np.int64)
        splits[split] = (patches, labels)

    report = {"variants": {}}
    ok_all = True
    for compressed in (False, True):
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            write_reference_dataset(tmp, splits, compressed=compressed,
                                    log_every=0)

            # --- metadata via the reference's exact loop (:23-29) ---
            shapes = {}
            for record in tf.compat.v1.python_io.tf_record_iterator(
                    os.path.join(tmp, "metadata.tfrecord")):
                example = tf.train.Example()
                example.ParseFromString(record)
                shapes["training"] = np.array(
                    example.features.feature["training_data_shape"].int64_list.value)
                shapes["test"] = np.array(
                    example.features.feature["testing_data_shape"].int64_list.value)
                shapes["validation"] = np.array(
                    example.features.feature["validation_data_shape"].int64_list.value)
            meta_ok = all(
                tuple(shapes[s]) == np.shape(splits[s][0]) for s in splits)

            # --- splits via the reference's extract_fn (:40-50) ---
            bit_exact, labels_ok, n_read = True, True, {}
            for split, fname in (("training", "training.tfrecord"),
                                 ("test", "test.tfrecord"),
                                 ("validation", "validation.tfrecord")):
                ds = tf.data.TFRecordDataset(
                    os.path.join(tmp, fname),
                    compression_type="GZIP" if compressed else "")
                ds = ds.map(lambda inp: TFRecordImporter.extract_fn(
                    inp, shape, args.classes, split))
                exp_patches, exp_labels = splits[split]
                count = 0
                for image, one_hot in ds:
                    img = image.numpy()
                    if img.dtype != np.float32 or not np.array_equal(
                            img.view(np.uint32),
                            exp_patches[count].view(np.uint32)):
                        bit_exact = False
                    oh = one_hot.numpy()
                    if oh.argmax() != exp_labels[count] or oh.sum() != 1:
                        labels_ok = False
                    count += 1
                n_read[split] = count
                if count != len(exp_patches):
                    labels_ok = False
            variant_ok = meta_ok and bit_exact and labels_ok
            ok_all = ok_all and variant_ok
            report["variants"]["gzip" if compressed else "raw"] = {
                "metadata_shapes_ok": bool(meta_ok),
                "patches_bit_exact": bool(bit_exact),
                "labels_one_hot_ok": bool(labels_ok),
                "records_read": n_read,
            }
    report["ok"] = bool(ok_all)
    report["parser"] = ("reference importer/TFRecordImporter.py extract_fn + "
                        "tf_record_iterator, tf " + tf.__version__)
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
