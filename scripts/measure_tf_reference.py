"""Measure the TF reference's training throughput on this image's CPU.

This is the honest baseline for ``bench.py``'s ``vs_baseline`` field: the
reference publishes no performance numbers (BASELINE.md), so we run the
reference's OWN hot loop and time it.  Everything on the measured path is
reference code imported from ``/root/reference``:

- data feed: ``GeneratorImporter.convert_data_to_tensor`` +
  ``common_nn_ops.training_nn_iterator`` (shuffle/repeat, augmentation maps,
  batch, prefetch) — importer/GeneratorImporter.py:66-77,
  common/common_nn_ops.py:191-203;
- model/optimizer graph: ``common_nn_ops.optimize_nn`` over
  ``nnmodel.HYPELCNNModel`` with the shipped
  ``modelconfigs/alg_param_hypelcnn.json`` (batch 48, filter_count 480);
- hot loop: ``session.run([train_step])`` —
  classify/monitored_session_runner.py:182-184.

The image lacks ``tf_slim``/``tifffile``/``tqdm``/``numba``/``optuna``; thin
shims (``scripts/tf_slim_shim.py``) provide the imported symbols with slim's
documented semantics.  The scene is a GRSS2013-scale synthetic
(349x1905, 144-band CASI + 1-band LiDAR, 15 classes) because the licensed
dataset is not in the image; throughput does not depend on pixel values.

Caveat recorded with the output: this measures the TF reference on CPU
(TF 2.21 compat.v1 graph mode, oneDNN on) because the image has no
CUDA-capable GPU and the reference's pinned TF<=2.12 GPU stack is not
installable here.  The reference's own documented setup is a single GPU.

Usage: python scripts/measure_tf_reference.py [--steps 200] [--batch-size 48]
Writes JSON to stdout and (with --out) a file.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types


def install_dependency_shims() -> None:
    import tf_slim_shim as shim  # same directory (sys.path[0] = scripts/)

    shim.install()
    sys.path.insert(0, "/root/reference")

    tifffile = types.ModuleType("tifffile")
    tifffile.imread = lambda *a, **k: None
    sys.modules["tifffile"] = tifffile
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda iterable=None, *a, **k: iterable
    sys.modules["tqdm"] = tqdm_mod
    numba_mod = types.ModuleType("numba")
    numba_mod.jit = lambda *a, **k: (lambda f: f)
    numba_mod.njit = numba_mod.jit
    sys.modules["numba"] = numba_mod


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--warmup", type=int, default=25)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="override the modelconfig batch size")
    parser.add_argument("--scene", default="349x1905x144",
                        help="HxWxBands of the synthetic scene")
    parser.add_argument("--train-targets", type=int, default=20000)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    install_dependency_shims()

    import numpy as np
    import tensorflow as tf

    tf.compat.v1.disable_v2_behavior()

    from common.common_nn_ops import (AugmentationInfo, BasicDataSet,
                                      optimize_nn, training_nn_iterator)
    from importer.GeneratorImporter import (GeneratorDataInfo,
                                            GeneratorImporter,
                                            GeneratorSpecialData)
    from nnmodel.HYPELCNNModel import HYPELCNNModel

    h, w, bands = (int(p) for p in args.scene.split("x"))
    class_count = 15
    neighborhood = 1

    with open("/root/reference/nnmodel/modelconfigs/alg_param_hypelcnn.json") as f:
        algorithm_params = json.load(f)
    if args.batch_size is not None:
        algorithm_params["batch_size"] = args.batch_size
    batch_size = algorithm_params["batch_size"]

    rng = np.random.RandomState(0)
    casi = rng.random_sample((h, w, bands)).astype(np.float32)
    lidar = rng.random_sample((h, w, 1)).astype(np.float32)
    data_set = BasicDataSet(shadow_creator_dict=None, casi=casi, lidar=lidar,
                            neighborhood=neighborhood, normalize=True)

    def random_targets(count):
        xs = rng.randint(0, w, size=count)
        ys = rng.randint(0, h, size=count)
        labels = rng.randint(0, class_count, size=count)
        return np.stack([xs, ys, labels], axis=1).astype(np.int64)

    def info(targets):
        shape = np.concatenate(([targets.shape[0]], data_set.get_data_shape()))
        return GeneratorDataInfo(
            data=GeneratorSpecialData(shape=shape, size=np.prod(shape)),
            targets=targets, loader=None, dataset=data_set)

    importer = GeneratorImporter()
    test_tensor, train_tensor, _val = importer.convert_data_to_tensor(
        info(random_targets(1000)), info(random_targets(args.train_targets)),
        info(random_targets(1000)), range(0, class_count))

    augmentation_info = AugmentationInfo(
        shadow_struct=None, perform_shadow_augmentation=False,
        perform_rotation_augmentation=True, perform_spectral_augmentation=False,
        perform_reflection_augmentation=True, augmentation_random_threshold=0.5)

    device_id = "/cpu:0"
    train_iter = training_nn_iterator(train_tensor.dataset, augmentation_info,
                                      batch_size, num_epochs=None,
                                      device=device_id, prefetch_size=1000)
    images, labels = train_iter.get_next()

    model = HYPELCNNModel()
    deep_nn_template = tf.compat.v1.make_template(
        "nn_core", model.create_tensor_graph, class_count=class_count)
    _y_conv, cross_entropy, _lr, train_step = optimize_nn(
        deep_nn_template, images, labels, device_id=device_id,
        name_prefix="training", algorithm_params=algorithm_params,
        loss_func=model.get_loss_func)

    with tf.compat.v1.Session() as sess:
        sess.run(tf.compat.v1.global_variables_initializer())
        sess.run(train_iter.initializer)
        for _ in range(args.warmup):
            sess.run([train_step])
        t0 = time.time()
        for _ in range(args.steps):
            sess.run([train_step])
        elapsed = time.time() - t0
        loss = float(sess.run(cross_entropy))

    result = {
        "metric": "tf_reference_train_patches_per_sec",
        "value": round(args.steps * batch_size / elapsed, 1),
        "unit": "patches/s",
        "steps": args.steps,
        "batch_size": batch_size,
        "seconds": round(elapsed, 2),
        "final_loss": round(loss, 4),
        "scene": args.scene,
        "device": "cpu (no CUDA GPU in image; TF2.21 compat.v1, oneDNN)",
        "provenance": "reference code from /root/reference run via scripts/measure_tf_reference.py",
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
