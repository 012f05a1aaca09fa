"""REFERENCE side of the full-episode accuracy-parity experiment.

Trains the reference's own stack end-to-end on a shared synthetic scene and
shared splits (written by ``scripts/episode_parity.py``), then evaluates the
test split and reports OA/AA/kappa.  Everything on the trained path is
reference code imported from ``/root/reference``:

- ``BasicDataSet`` pad/normalize (`common/common_nn_ops.py:54-78`),
- ``GeneratorImporter`` + ``training_nn_iterator`` with rotation/reflection
  augmentation maps (`common/common_nn_ops.py:188-201,376-440`),
- ``optimize_nn`` (Adam + staircase-decay LR + BN update deps,
  `common/common_nn_ops.py:208-240`) over ``nnmodel.HYPELCNNModel``,
- the ``sess.run([train_step])`` hot loop
  (`classify/monitored_session_runner.py:182-184`),
- inference through the same ``nn_core`` template with is_training=False
  (BN moving averages accumulated during training —
  `classify/infer_for_classification.py:117-118`).

Metrics use the SAME numpy kernel as the rebuild side
(``hypelcnn_tpu.utils.stat_extractor``, itself golden-tested against the
reference's script) so the comparison isolates the trained model.

Usage: python scripts/episode_parity_tf.py --data shared.npz --steps 2000
       --algorithm-params params.json --out tf_report.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, SCRIPTS_DIR)
sys.path.insert(0, os.path.dirname(SCRIPTS_DIR))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True, help="shared npz from episode_parity.py")
    parser.add_argument("--algorithm-params", required=True)
    parser.add_argument("--steps", type=int, required=True)
    parser.add_argument("--neighborhood", type=int, default=1)
    parser.add_argument("--spectral_augmentation", type=float, default=0.0,
                        help="max negative per-band delta (0 disables)")
    parser.add_argument("--model", default="HYPELCNNModel")
    parser.add_argument("--gan_ckpt", default=None,
                        help="tf.train.Saver checkpoint prefix of a trained "
                             "cycle_gan: enables frozen-GAN shadow "
                             "augmentation (reference classify chain, "
                             "monitored_session_runner.py:131-138)")
    parser.add_argument("--run_seed", type=int, default=1234,
                        help="graph-level seed (variance studies)")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()

    import tensorflow as tf

    tf.compat.v1.disable_v2_behavior()
    v1 = tf.compat.v1
    v1.set_random_seed(args.run_seed)  # reference set_run_seed (default 1234)

    import importlib

    from common.common_nn_ops import (AugmentationInfo, BasicDataSet,
                                      optimize_nn, training_nn_iterator)
    from importer.GeneratorImporter import (GeneratorDataInfo,
                                            GeneratorImporter,
                                            GeneratorSpecialData)
    RefModel = getattr(importlib.import_module(f"nnmodel.{args.model}"),
                       args.model)

    shared = np.load(args.data)
    casi, lidar = shared["casi"], shared["lidar"]
    train_targets = shared["train_targets"].astype(np.int64)
    test_targets = shared["test_targets"].astype(np.int64)
    validation_targets = shared["validation_targets"].astype(np.int64)
    class_count = int(shared["class_count"])

    with open(args.algorithm_params) as fid:
        algorithm_params = json.load(fid)
    batch_size = algorithm_params["batch_size"]

    data_set = BasicDataSet(shadow_creator_dict=None, casi=casi, lidar=lidar,
                            neighborhood=args.neighborhood, normalize=True)

    def info(targets):
        shape = np.concatenate(([targets.shape[0]], data_set.get_data_shape()))
        return GeneratorDataInfo(
            data=GeneratorSpecialData(shape=shape, size=np.prod(shape)),
            targets=targets, loader=None, dataset=data_set)

    importer = GeneratorImporter()
    _test_t, train_tensor, _val_t = importer.convert_data_to_tensor(
        info(test_targets), info(train_targets), info(test_targets),
        range(0, class_count))

    augmentation_info = AugmentationInfo(
        shadow_struct=None, perform_shadow_augmentation=False,
        perform_rotation_augmentation=True,
        perform_spectral_augmentation=args.spectral_augmentation or False,
        perform_reflection_augmentation=True, augmentation_random_threshold=0.5)

    device_id = "/cpu:0"
    train_iter = training_nn_iterator(train_tensor.dataset, augmentation_info,
                                      batch_size, num_epochs=None,
                                      device=device_id, prefetch_size=1000)
    images, labels = train_iter.get_next()

    gan_restorer = None
    if args.gan_ckpt:
        # frozen-GAN shadow augmentation (reference classify chain,
        # `classify/monitored_session_runner.py:131-138` +
        # `gan/gan_utilities.py:30-43`): the trained generator translates the
        # HSI channels, LiDAR passes through, each example replaced with
        # probability 0.5.  The reference applies it per example inside
        # dataset.map; the generator is per-pixel, so batched application
        # after the iterator with a per-example bernoulli mask is the same
        # math — valid ONLY while spectral augmentation is off (shadow
        # commutes with rotation/reflection but not with the additive
        # spectral delta that the reference orders after it).
        assert not args.spectral_augmentation, \
            "--gan_ckpt requires --spectral_augmentation 0 (op ordering)"
        from functools import partial as _partial

        import tfgan_shim
        tfgan_shim.install()
        import types as _types
        if not hasattr(tf, "estimator"):
            est = _types.ModuleType("tensorflow.estimator")
            est.SessionRunHook = v1.train.SessionRunHook
            tf.estimator = est
        from gan.shadow_data_models import shadowdata_generator_model
        from gan.wrappers.cycle_gan_wrapper import CycleGANInferenceWrapper
        infer_wrapper = CycleGANInferenceWrapper(shadow_generator_fn=_partial(
            shadowdata_generator_model, create_only_encoder=False,
            is_training=False))
        shadowed_hsi = infer_wrapper.construct_inference_graph(
            images[:, :, :, :-1], is_shadow_graph=True,
            clip_invalid_values=False)
        shadowed = tf.concat([shadowed_hsi, images[:, :, :, -1:]], axis=3)
        u = v1.random_uniform([tf.shape(images)[0], 1, 1, 1], 0, 1.0)
        mask = tf.cast(u < 0.5, tf.float32)
        images = mask * shadowed + (1.0 - mask) * images
        gan_restorer = infer_wrapper.create_generator_restorer()

    model = RefModel()
    deep_nn_template = v1.make_template(
        "nn_core", model.create_tensor_graph, class_count=class_count)
    _y_conv, cross_entropy, _lr, train_step = optimize_nn(
        deep_nn_template, images, labels, device_id=device_id,
        name_prefix="training", algorithm_params=algorithm_params,
        loss_func=model.get_loss_func)

    # inference branch through the SAME template: BN moving averages, no
    # dropout (reference infer_for_classification.py:117-118)
    k = 2 * args.neighborhood + 1
    bands_total = data_set.get_data_shape()[2]
    EVAL_BATCH = 256  # static batch: the slim shim's batch_norm needs it
    x_ph = v1.placeholder(tf.float32, (EVAL_BATCH, k, k, bands_total),
                          name="eval_x")
    from common.common_nn_ops import ModelInputParams
    eval_out = deep_nn_template(
        ModelInputParams(x=x_ph, y=None, device_id=device_id,
                         is_training=False),
        algorithm_params=algorithm_params)
    predict = tf.argmax(eval_out.y_conv, axis=1)

    with v1.Session() as sess:
        sess.run(v1.global_variables_initializer())
        if gan_restorer is not None:
            # restore the frozen generator OVER its fresh init (the reference
            # overrides the ready op and restores via the generator restorer,
            # monitored_session_runner.py:131-138)
            gan_restorer.restore(sess, args.gan_ckpt)
        sess.run(train_iter.initializer)
        t0 = time.time()
        log_every = max(1, args.steps // 10)
        for step in range(args.steps):
            sess.run([train_step])
            if (step + 1) % log_every == 0:
                loss = float(sess.run(cross_entropy))
                print(f"tf step {step + 1}: loss={loss:.4f} "
                      f"({(step + 1) * batch_size / (time.time() - t0):.0f} patches/s)",
                      flush=True)
        train_seconds = time.time() - t0

        # drain eval splits (host gather like the reference generator)
        def drain(targets):
            confusion = np.zeros((class_count, class_count), dtype=np.int64)
            for start in range(0, targets.shape[0], EVAL_BATCH):
                chunk = targets[start:start + EVAL_BATCH]
                patches = np.stack([
                    data_set.get_data_point(int(t[0]), int(t[1]))
                    for t in chunk]).astype(np.float32)
                if patches.shape[0] < EVAL_BATCH:  # pad the ragged tail
                    pad = EVAL_BATCH - patches.shape[0]
                    patches = np.concatenate(
                        [patches, np.zeros((pad, *patches.shape[1:]),
                                           np.float32)])
                preds = sess.run(predict, feed_dict={x_ph: patches})
                for t, p in zip(chunk, preds[:len(chunk)]):
                    confusion[int(t[2]), int(p)] += 1
            return confusion

        test_confusion = drain(test_targets)
        validation_confusion = drain(validation_targets)

    from hypelcnn_tpu.utils.stat_extractor import extract_accuracy_metrics

    def metrics_of(confusion):
        oa, class_acc, kappa, _ = extract_accuracy_metrics(confusion)
        return (round(float(oa), 5), round(float(np.mean(class_acc)), 5),
                round(float(kappa), 5))

    test_oa, test_aa, test_kappa = metrics_of(test_confusion)
    val_oa, val_aa, val_kappa = metrics_of(validation_confusion)

    report = {
        "framework": "tf_reference",
        "run_seed": args.run_seed,
        "steps": args.steps,
        "batch_size": batch_size,
        "train_seconds": round(train_seconds, 1),
        "test_oa": test_oa, "test_aa": test_aa, "test_kappa": test_kappa,
        "validation_oa": val_oa, "validation_aa": val_aa,
        "validation_kappa": val_kappa,
        "confusion": validation_confusion.tolist(),
    }
    with open(args.out, "w") as fid:
        json.dump(report, fid, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "confusion"}))


if __name__ == "__main__":
    main()
