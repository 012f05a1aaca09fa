"""Weight-for-weight forward-pass parity vs the reference's OWN TF graph.

Builds the reference HYPELCNN graph (code imported from `/root/reference`,
tf_slim shim) and the rebuild's flax module with the SAME algorithm params,
randomizes every TF variable (conv/dense weights, BN beta + moving stats),
copies them value-for-value into the flax param/batch_stats pytrees via the
name mapping below, runs both on one input batch in inference mode, and
reports the logit difference.

This is the strongest accuracy-parity evidence available without the
licensed datasets: if the two stacks are numerically identical given equal
weights, training-accuracy parity reduces to optimizer/data parity (covered
by the optimizer tests and the splitter/augmentation parity tests).

Name mapping (flax -> TF):
  <scope>/Conv_0/kernel          -> <scope>/weights          (HWIO both)
  <scope>/Dense_0/kernel         -> <scope>/weights          ([in, out] both)
  <scope>/BatchNorm_0/bias       -> <scope>/BatchNorm/beta
  batch_stats <scope>/BatchNorm_0/{mean,var}
                                 -> <scope>/BatchNorm/{moving_mean,moving_variance}

Usage: python scripts/forward_parity.py [--bands 9] [--classes 5]
       [--filter_count 64] [--batch 8] [--json]
Exit code 0 iff max |logit delta| / mean|logit| < 1e-4 (f32 noise).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, SCRIPTS_DIR)
sys.path.insert(0, REPO)

import numpy as np


def build_reference_logits(model_name, x_batch, algorithm_params, class_count, rng):
    """Run the reference graph; returns (logits, {tf_var_name: value})."""
    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()
    import importlib

    import tensorflow as tf

    v1 = tf.compat.v1
    v1.disable_v2_behavior()  # reference code relies on Dimension.value
    v1.disable_eager_execution()

    RefModel = getattr(importlib.import_module(f"nnmodel.{model_name}"),
                       model_name)
    from common.common_nn_ops import ModelInputParams

    logits, values = _tf_session_values_and_output(
        lambda x: RefModel().create_tensor_graph(
            ModelInputParams(x=x, y=None, device_id="/cpu:0",
                             is_training=False),
            class_count, algorithm_params).y_conv,
        x_batch, rng)
    return logits, values


def flax_path_to_tf_name(path) -> str:
    parts = [getattr(k, "key", str(k)) for k in path]
    scope = parts[0]
    if len(parts) == 2:  # directly-named flax layer (e.g. the GAN convs)
        if parts[1] == "kernel":
            return f"{scope}/weights:0"
        if parts[1] == "bias":
            return f"{scope}/biases:0"
    if parts[1] in ("Conv_0", "Dense_0"):
        if parts[2] == "kernel":
            return f"{scope}/weights:0"
        if parts[2] == "bias":
            return f"{scope}/biases:0"
    if parts[1] == "BatchNorm_0":
        leaf = {"bias": "beta", "scale": "gamma",
                "mean": "moving_mean", "var": "moving_variance"}[parts[2]]
        return f"{scope}/BatchNorm/{leaf}:0"
    raise KeyError(f"no TF mapping for flax path {parts}")


def build_rebuild_logits(model_name, x_batch, algorithm_params, class_count,
                         tf_values):
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from hypelcnn_tpu.core.registry import get_model_from_name

    module = get_model_from_name(model_name).create_module(
        class_count, algorithm_params)
    variables = module.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            jnp.asarray(x_batch), train=False)

    used = set()

    def fill(path, leaf):
        name = flax_path_to_tf_name(path)
        used.add(name)
        val = tf_values[name]
        assert val.shape == leaf.shape, (name, val.shape, leaf.shape)
        return jnp.asarray(val)

    filled = {
        "params": jax.tree_util.tree_map_with_path(
            fill, variables["params"]),
    }
    if "batch_stats" in variables:
        filled["batch_stats"] = jax.tree_util.tree_map_with_path(
            fill, variables["batch_stats"])
    unused = set(tf_values) - used
    out = module.apply(filled, jnp.asarray(x_batch), train=False)
    return np.asarray(out.y_conv), unused


def _tf_session_values_and_output(build, x_batch, rng, preset=None):
    """Build a TF graph via ``build(x)``; assign ``preset`` values by name
    when given (else randomize — moving variances stay positive, they sit
    under an rsqrt in inference-mode BN), run the output."""
    import tensorflow as tf

    v1 = tf.compat.v1
    graph = v1.Graph()
    with graph.as_default():
        x = v1.placeholder(tf.float32, x_batch.shape, name="x")
        out = build(x)
        assign_ops, values = [], {}
        for var in v1.global_variables():
            shape = tuple(var.get_shape().as_list())
            if preset is not None:
                val = preset[var.name]
            elif "moving_variance" in var.name:
                val = rng.uniform(0.5, 2.0, shape).astype(np.float32)
            else:
                val = rng.normal(0.0, 0.2, shape).astype(np.float32)
            values[var.name] = val
            assign_ops.append(var.assign(val))
        with v1.Session(graph=graph) as sess:
            sess.run(assign_ops)
            result = sess.run(out, feed_dict={x: x_batch})
    return result, values


def gan_parity(band_size: int, batch: int, patch_count: int,
               embedded_feature_size: int, tolerance: float):
    """Forward parity for the GAN model stack (generator enc/full,
    discriminator, feature discriminator) vs reference
    `gan/shadow_data_models.py`."""
    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()
    import gan.shadow_data_models as ref
    import tensorflow as tf

    tf.compat.v1.disable_v2_behavior()
    tf.compat.v1.disable_eager_execution()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from hypelcnn_tpu.gan.models import (
        ShadowDiscriminator,
        ShadowFeatureDiscriminator,
        ShadowGenerator,
    )

    rng = np.random.default_rng(0)
    x_batch = rng.uniform(0, 1, (batch, 1, 1, band_size)).astype(np.float32)
    checks = []

    def run_flax(module, tf_values, name_map, **apply_kwargs):
        variables = module.init(jax.random.key(0), jnp.asarray(x_batch),
                                **apply_kwargs)
        used = set()

        def fill(path, leaf):
            tf_name = name_map(path)
            used.add(tf_name)
            val = tf_values[tf_name]
            assert val.shape == leaf.shape, (tf_name, val.shape, leaf.shape)
            return jnp.asarray(val)

        filled = {"params": jax.tree_util.tree_map_with_path(
            fill, variables["params"])}
        out = module.apply(filled, jnp.asarray(x_batch), **apply_kwargs)
        return np.asarray(out), set(tf_values) - used

    def record(name, ref_out, our_out, unmapped):
        ref_out = ref_out.reshape(our_out.shape)
        max_abs = float(np.max(np.abs(ref_out - our_out)))
        scale = float(np.abs(ref_out).mean())
        normalized = max_abs / max(scale, 1e-6)
        checks.append({
            "check": name, "max_abs_delta": max_abs, "scale": scale,
            "scale_normalized_delta": normalized,
            "tf_variables_unmapped": sorted(unmapped),
            "ok": bool(normalized < tolerance and not unmapped)})

    # ---- generator: full path, then encoder with the same weights ----
    full_out, gen_values = _tf_session_values_and_output(
        lambda x: ref.shadowdata_generator_model(x, False, False), x_batch, rng)
    gen = ShadowGenerator(band_size=band_size)
    ours_full, full_unmapped = run_flax(gen, gen_values, flax_path_to_tf_name)
    record("generator_full", full_out, ours_full, full_unmapped)

    enc_out, _ = _tf_session_values_and_output(
        lambda x: ref.shadowdata_generator_model(x, True, False), x_batch,
        rng, preset=gen_values)  # inject the full graph's net1..net4 values
    ours_enc, _ = run_flax(gen, gen_values, flax_path_to_tf_name,
                           encoder_only=True)
    # net5..net7 are deliberately untouched by the encoder path
    record("generator_encoder", enc_out, ours_enc, set())

    # ---- discriminator (3 dense layers, unscoped slim names) ----
    disc_out, disc_values = _tf_session_values_and_output(
        lambda x: ref.shadowdata_discriminator_model(x, x, False, 1e-5),
        x_batch, rng)
    disc_map = {"fc1": "fully_connected", "fc2": "fully_connected_1",
                "fc3": "fully_connected_2"}

    def disc_name(path):
        parts = [getattr(k, "key", str(k)) for k in path]
        leaf = {"kernel": "weights", "bias": "biases"}[parts[-1]]
        return f"{disc_map[parts[0]]}/{leaf}:0"

    disc = ShadowDiscriminator(band_size=band_size)
    ours_disc, unmapped = run_flax(disc, disc_values, disc_name)
    record("discriminator", disc_out, ours_disc, unmapped)

    # ---- feature discriminator (per-patch dense stacks + global l2) ----
    featd_out, featd_values = _tf_session_values_and_output(
        lambda x: ref.shadowdata_feature_discriminator_model(
            x, patch_count, embedded_feature_size, False, 1e-4),
        x_batch, rng)

    def featd_name(path):
        parts = [getattr(k, "key", str(k)) for k in path]
        # p{i}_fc{j} -> the (i*4 + j - 1)-th unscoped fully_connected
        patch_i, fc_j = parts[0].split("_fc")
        n = int(patch_i[1:]) * 4 + int(fc_j) - 1
        scope = "fully_connected" if n == 0 else f"fully_connected_{n}"
        leaf = {"kernel": "weights", "bias": "biases"}[parts[-1]]
        return f"{scope}/{leaf}:0"

    featd = ShadowFeatureDiscriminator(
        band_size=band_size, patch_count=patch_count,
        embedded_feature_size=embedded_feature_size)
    ours_featd, unmapped = run_flax(featd, featd_values, featd_name)
    record("feature_discriminator", featd_out, ours_featd, unmapped)

    return checks


def cap_parity(batch: int, bands: int, classes: int, tolerance: float):
    """CAP forward parity: the reference's per-capsule 1x1 convs + loopy
    routing (`nnmodel/CAPModel.py:30-120`) vs the rebuild's fused einsums.
    Exercises the preserved always-batch-stats BN quirk (reference BN never
    threads is_training; slim's default True normalizes with batch stats
    even at inference)."""
    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()
    import tensorflow as tf

    v1 = tf.compat.v1
    v1.disable_v2_behavior()
    v1.disable_eager_execution()

    from common.common_nn_ops import ModelInputParams
    from nnmodel.CAPModel import CAPModel as RefModel

    algorithm_params = {
        "iter_routing": 3, "conv_layer_kernel_size": 1,
        "primary_caps_kernel_size": 1, "feature_count": 16,
        "primary_capsule_count": 4, "digit_capsule_output_space": 8,
        "lrelu_alpha": 0.18, "enable_decoding": True, "batch_size": batch,
        "optimizer": "AdamOptimizer", "learning_rate": 1e-4,
        "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
    }
    k = 3  # neighborhood 1
    rng = np.random.default_rng(0)
    x_batch = rng.uniform(0, 1, (batch, k, k, bands)).astype(np.float32)

    ref_logits, values = _tf_session_values_and_output(
        lambda x: RefModel().create_tensor_graph(
            ModelInputParams(x=x, y=None, device_id="/cpu:0",
                             is_training=False),
            classes, algorithm_params).y_conv,
        x_batch, rng)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from hypelcnn_tpu.models import CAPModel

    module = CAPModel().create_module(classes, algorithm_params)
    variables = module.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            jnp.asarray(x_batch), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    used = set()

    def take(name):
        used.add(name)
        return values[name]

    for scope in ("Conv1_layer", "PrimaryCaps_layer"):
        params[scope]["Conv_0"]["kernel"] = take(f"{scope}/weights:0")
        params[scope]["BatchNorm_0"]["bias"] = take(f"{scope}/BatchNorm/beta:0")
        stats[scope]["BatchNorm_0"]["mean"] = take(
            f"{scope}/BatchNorm/moving_mean:0")
        stats[scope]["BatchNorm_0"]["var"] = take(
            f"{scope}/BatchNorm/moving_variance:0")
    data_size = params["digitcaps_w"].shape[0]
    params["digitcaps_w"] = np.stack(
        [take(f"DigitCaps_layer/DigitCaps_layer_w_{i}/weights:0")[0, 0]
         for i in range(data_size)])
    params["digitcaps_b"] = np.stack(
        [take(f"DigitCaps_layer/DigitCaps_layer_w_{i}/biases:0")
         for i in range(data_size)])

    filled = jax.tree_util.tree_map(jnp.asarray,
                                    {"params": params, "batch_stats": stats})
    out = module.apply(filled, jnp.asarray(x_batch), train=False)
    our_logits = np.asarray(out.y_conv)

    max_abs = float(np.max(np.abs(ref_logits - our_logits)))
    scale = float(np.abs(ref_logits).mean())
    normalized = max_abs / max(scale, 1e-6)
    unused = set(values) - used
    return {"model": "CAPModel",
            "max_abs_logit_delta": max_abs, "logit_scale": scale,
            "scale_normalized_delta": normalized,
            "tf_variables_mapped": len(values) - len(unused),
            "tf_variables_unmapped": sorted(unused),
            "ok": bool(normalized < tolerance and not unused)}


MODEL_SETUPS = {
    # model -> (neighborhood, extra algorithm_params)
    "HYPELCNNModel": (1, {
        "lrelu_alpha": 0.18, "bn_decay": 0.95, "l2regularizer_scale": 1e-5,
        "spectral_hierarchy_level": 3, "spatial_hierarchy_level": 3,
        "degradation_coeff": 3, "use_residual": True}),
    "CONCNNModel": (2, {}),
    "DUALCNNModel": (2, {"lrelu_alpha": 0.18, "hs_lidar_diff": 1}),
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="HYPELCNNModel",
                        choices=sorted(MODEL_SETUPS) + ["CAPModel"])
    parser.add_argument("--bands", type=int, default=9,
                        help="total input bands incl. the LiDAR band")
    parser.add_argument("--classes", type=int, default=5)
    parser.add_argument("--filter_count", type=int, default=64)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--tolerance", type=float, default=1e-4,
                        help="bound on max|delta| / mean|logit|")
    parser.add_argument("--json", action="store_true")
    parser.add_argument("--gan", action="store_true",
                        help="check the GAN model stack instead of a "
                             "classification model")
    args = parser.parse_args(argv)

    if args.gan:
        checks = gan_parity(band_size=16, batch=args.batch, patch_count=4,
                            embedded_feature_size=2,
                            tolerance=args.tolerance)
        report = {"model": "gan_stack", "checks": checks,
                  "ok": all(c["ok"] for c in checks)}
        print(json.dumps(report, indent=None if args.json else 2))
        return 0 if report["ok"] else 1

    if args.model == "CAPModel":
        report = cap_parity(batch=args.batch, bands=args.bands,
                            classes=args.classes, tolerance=args.tolerance)
        print(json.dumps(report, indent=None if args.json else 2))
        return 0 if report["ok"] else 1

    neighborhood, extra = MODEL_SETUPS[args.model]
    algorithm_params = {
        "filter_count": args.filter_count,
        "drop_out_ratio": 0.5, "batch_size": args.batch,
        "optimizer": "AdamOptimizer", "learning_rate": 1e-4,
        "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 350,
        "compute_dtype": "float32", **extra,
    }
    k = 2 * neighborhood + 1
    rng = np.random.default_rng(0)
    x_batch = rng.uniform(0, 1, (args.batch, k, k, args.bands)).astype(np.float32)

    ref_logits, tf_values = build_reference_logits(
        args.model, x_batch, algorithm_params, args.classes, rng)
    our_logits, unused = build_rebuild_logits(
        args.model, x_batch, algorithm_params, args.classes, tf_values)

    max_abs = float(np.max(np.abs(ref_logits - our_logits)))
    scale = float(np.abs(ref_logits).mean())
    # scale-normalized criterion: f32 reduction-order noise grows with the
    # logit magnitude (LRN/deep products), while a real structural
    # divergence would be O(1) of the scale
    normalized = max_abs / max(scale, 1e-6)
    report = {
        "model": args.model,
        "max_abs_logit_delta": max_abs,
        "logit_scale": scale,
        "scale_normalized_delta": normalized,
        "tf_variables_mapped": len(tf_values) - len(unused),
        "tf_variables_unmapped": sorted(unused),
        "ok": bool(normalized < args.tolerance and not unused),
    }
    print(json.dumps(report, indent=None if args.json else 2))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
