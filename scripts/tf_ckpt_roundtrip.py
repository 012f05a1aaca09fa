"""Round-trip test harness for utils/tf_checkpoint_import.py.

Builds REFERENCE graphs (code imported from /root/reference, tf_slim shim)
under the reference's own training variable scopes, randomizes weights, runs
a few real Adam steps (so the checkpoint contains optimizer slot variables
the importer must ignore), saves a genuine ``model.ckpt-N`` with
``tf.compat.v1.train.Saver``, imports it into the rebuild's flax templates,
and compares outputs:

1. GAN generators (cycle_gan layout ``Model/ModelX2Y|Y2X/Generator``,
   `gan/wrappers/cycle_gan_wrapper.py:18-19,127-129`): TF generator output
   vs ``trainer.translate`` after ``import_gan_generator_params`` — both
   shadow (x2y) and deshadow (y2x) directions.
2. Classifier (``nn_core`` scope, `classify/monitored_session_runner.py:164-168`):
   TF logits vs the flax module after ``import_classifier_variables`` —
   in BOTH the branch-conv and the fused-level (``fuse_level_convs``)
   layouts, proving fused checkpoints migrate too.

Usage: python scripts/tf_ckpt_roundtrip.py [--json]
Exit 0 iff every scale-normalized delta < 1e-4.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, SCRIPTS_DIR)
sys.path.insert(0, REPO)

import numpy as np

TOLERANCE = 1e-4


def _save_tf_graph(build, feeds, fetches_fn, ckpt_prefix, rng, train_steps=2):
    """Build a TF graph, randomize vars, run a few Adam steps on an MSE
    objective over ``fetches_fn`` outputs, save, return fetched outputs."""
    import tensorflow as tf

    v1 = tf.compat.v1
    graph = v1.Graph()
    with graph.as_default():
        placeholders = {name: v1.placeholder(tf.float32, arr.shape, name=name)
                        for name, arr in feeds.items()}
        outputs = build(placeholders)
        assign_ops = []
        for var in v1.global_variables():
            shape = tuple(var.get_shape().as_list())
            if "moving_variance" in var.name:
                val = rng.uniform(0.5, 2.0, shape).astype(np.float32)
            else:
                val = rng.normal(0.0, 0.2, shape).astype(np.float32)
            assign_ops.append(var.assign(val))
        # a real optimizer so the checkpoint carries Adam slots + beta powers
        loss = sum(tf.reduce_mean(tf.square(out)) for out in outputs.values())
        opt = v1.train.AdamOptimizer(1e-3).minimize(loss)
        saver = v1.train.Saver(max_to_keep=1)
        feed_dict = {placeholders[k]: v for k, v in feeds.items()}
        with v1.Session(graph=graph) as sess:
            sess.run(v1.global_variables_initializer())
            sess.run(assign_ops)  # overwrite model vars with the random draw
            for _ in range(train_steps):
                sess.run(opt, feed_dict=feed_dict)
            result = sess.run(fetches_fn(outputs), feed_dict=feed_dict)
            saver.save(sess, ckpt_prefix)
    return result


def gan_roundtrip(tmp, bands=10, batch=6):
    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()
    import gan.shadow_data_models as ref
    import tensorflow as tf

    v1 = tf.compat.v1
    v1.disable_v2_behavior()
    v1.disable_eager_execution()

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (batch, 1, 1, bands)).astype(np.float32)
    y = rng.uniform(0, 1, (batch, 1, 1, bands)).astype(np.float32)

    def build(ph):
        # the CycleGAN training scopes (cycle_gan_wrapper.py:127-129)
        outs = {}
        with v1.variable_scope("Model"):
            with v1.variable_scope("ModelX2Y"):
                with v1.variable_scope("Generator"):
                    outs["x2y"] = ref.shadowdata_generator_model(
                        ph["x"], False, False)
            with v1.variable_scope("ModelY2X"):
                with v1.variable_scope("Generator"):
                    outs["y2x"] = ref.shadowdata_generator_model(
                        ph["y"], False, False)
        return outs

    ckpt_prefix = os.path.join(tmp, "gan", "model.ckpt-5000")
    os.makedirs(os.path.dirname(ckpt_prefix), exist_ok=True)
    tf_out = _save_tf_graph(build, {"x": x, "y": y},
                            lambda outs: [outs["x2y"], outs["y2x"]],
                            ckpt_prefix, rng)
    tf_x2y, tf_y2x = tf_out

    # ---- import into the rebuild ----
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict
    from hypelcnn_tpu.utils.tf_checkpoint_import import (
        import_gan_generator_params, is_tf_checkpoint)

    assert is_tf_checkpoint(ckpt_prefix), "saved ckpt not detected"
    trainer = get_trainer_dict({}, bands, max_steps=100)["cycle_gan"]
    template = trainer.init_state(jax.random.key(0)).params
    params = jax.tree_util.tree_map(
        jnp.asarray, import_gan_generator_params("cycle_gan", template,
                                                 ckpt_prefix))
    ours_x2y = np.asarray(trainer.translate(params, jnp.asarray(x), True))
    ours_y2x = np.asarray(trainer.translate(params, jnp.asarray(y), False))

    checks = []
    for name, ref_out, our_out in (("gan_translate_shadow", tf_x2y, ours_x2y),
                                   ("gan_translate_deshadow", tf_y2x, ours_y2x)):
        ref_out = ref_out.reshape(our_out.shape)
        delta = float(np.max(np.abs(ref_out - our_out)))
        scale = max(float(np.abs(ref_out).mean()), 1e-6)
        checks.append({"check": name, "max_abs_delta": delta,
                       "scale_normalized_delta": delta / scale,
                       "ok": bool(delta / scale < TOLERANCE)})
    return checks


def classifier_roundtrip(tmp, bands=8, classes=5, batch=4, filter_count=32):
    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()
    import importlib

    import tensorflow as tf

    v1 = tf.compat.v1
    v1.disable_v2_behavior()
    v1.disable_eager_execution()

    RefModel = importlib.import_module("nnmodel.HYPELCNNModel").HYPELCNNModel
    from common.common_nn_ops import ModelInputParams

    algorithm_params = {
        "filter_count": filter_count, "lrelu_alpha": 0.18, "bn_decay": 0.95,
        "drop_out_ratio": 0.3, "l2regularizer_scale": 1e-5,
        "spectral_hierarchy_level": 2, "spatial_hierarchy_level": 2,
        "degradation_coeff": 3, "use_residual": True, "batch_size": batch,
    }
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (batch, 3, 3, bands)).astype(np.float32)

    def build(ph):
        # the monitored-session template scope (make_template("nn_core"))
        with v1.variable_scope("nn_core"):
            out = RefModel().create_tensor_graph(
                ModelInputParams(x=ph["x"], y=None, device_id="/cpu:0",
                                 is_training=False),
                classes, algorithm_params)
        return {"logits": out.y_conv}

    ckpt_prefix = os.path.join(tmp, "classifier", "model.ckpt-2000")
    os.makedirs(os.path.dirname(ckpt_prefix), exist_ok=True)
    (tf_logits,) = _save_tf_graph(build, {"x": x},
                                  lambda outs: [outs["logits"]],
                                  ckpt_prefix, rng)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from hypelcnn_tpu.core.registry import get_model_from_name
    from hypelcnn_tpu.utils.tf_checkpoint_import import import_classifier_variables

    checks = []
    for fused in (False, True):
        params = {**algorithm_params, "fuse_level_convs": fused}
        module = get_model_from_name("HYPELCNNModel").create_module(
            classes, params)
        template = module.init({"params": jax.random.key(0),
                                "dropout": jax.random.key(1)},
                               jnp.asarray(x), train=False)
        filled = jax.tree_util.tree_map(
            jnp.asarray, import_classifier_variables(template, ckpt_prefix))
        out = module.apply(filled, jnp.asarray(x), train=False)
        ours = np.asarray(out.y_conv)
        delta = float(np.max(np.abs(tf_logits - ours)))
        scale = max(float(np.abs(tf_logits).mean()), 1e-6)
        checks.append({"check": f"classifier_logits_fused={int(fused)}",
                       "max_abs_delta": delta,
                       "scale_normalized_delta": delta / scale,
                       "ok": bool(delta / scale < TOLERANCE)})
    return checks


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args(argv)

    with tempfile.TemporaryDirectory() as tmp:
        checks = gan_roundtrip(tmp) + classifier_roundtrip(tmp)
    ok = all(c["ok"] for c in checks)
    if args.json:
        print(json.dumps({"checks": checks, "ok": ok}))
    else:
        for c in checks:
            print(f"{c['check']}: normalized delta "
                  f"{c['scale_normalized_delta']:.3g} "
                  f"{'OK' if c['ok'] else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
