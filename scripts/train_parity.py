"""Short-trajectory TRAINING parity vs the reference's own TF train loop.

Shares one random init between the reference graph (reference
`optimize_nn` + `create_train_op`, staircase Adam, BN update ops) and the
rebuild (flax module + `build_optimizer`), runs N optimizer steps on the
SAME deterministic batch sequence (dropout disabled via
``drop_out_ratio=0`` so both stacks are noise-free), and compares the loss
trajectories plus the final parameters.

Together with ``forward_parity.py`` (layer stacks numerically identical)
this closes the loop: equal weights + equal data -> equal losses and equal
updates, i.e. accuracy parity on real data reduces to feeding the same
splits (which `data/splitters.py` preserves).

Usage: python scripts/train_parity.py [--steps 25] [--json]
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

from forward_parity import flax_path_to_tf_name


def make_batches(rng, steps, batch, k, bands, classes):
    xs = rng.uniform(0, 1, (steps, batch, k, k, bands)).astype(np.float32)
    labels = rng.integers(0, classes, (steps, batch))
    ys = np.eye(classes, dtype=np.float32)[labels]
    return xs, ys


def run_reference(xs, ys, algorithm_params, class_count):
    from measure_tf_reference import install_dependency_shims

    install_dependency_shims()
    import tensorflow as tf

    v1 = tf.compat.v1
    v1.disable_v2_behavior()
    v1.disable_eager_execution()

    from common.common_nn_ops import optimize_nn
    from nnmodel.HYPELCNNModel import HYPELCNNModel as RefModel

    steps, batch = xs.shape[:2]
    graph = v1.Graph()
    with graph.as_default():
        v1.set_random_seed(1234)
        x_ph = v1.placeholder(tf.float32, xs.shape[1:], name="x")
        y_ph = v1.placeholder(tf.float32, ys.shape[1:], name="y")
        model = RefModel()
        template = lambda model_input_params, algorithm_params: \
            model.create_tensor_graph(model_input_params, class_count,
                                      algorithm_params)
        _, loss_t, _, train_step = optimize_nn(
            template, x_ph, y_ph, "/cpu:0", "parity", algorithm_params,
            model.get_loss_func)
        model_vars = [var for var in v1.global_variables()
                      if "Adam" not in var.name and "beta1_power" not in var.name
                      and "beta2_power" not in var.name
                      and "global_step" not in var.name]
        with v1.Session(graph=graph) as sess:
            sess.run(v1.global_variables_initializer())
            init_values = {var.name: val for var, val in
                           zip(model_vars, sess.run(model_vars))}
            losses = []
            for i in range(steps):
                loss_val, _ = sess.run([loss_t, train_step],
                                       feed_dict={x_ph: xs[i], y_ph: ys[i]})
                losses.append(float(loss_val))
            final_values = {var.name: val for var, val in
                            zip(model_vars, sess.run(model_vars))}
    return init_values, losses, final_values


def run_rebuild(xs, ys, algorithm_params, class_count, init_values):
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from hypelcnn_tpu.models import HYPELCNNModel
    from hypelcnn_tpu.train.optimizer import build_optimizer

    model = HYPELCNNModel()
    module = model.create_module(class_count, algorithm_params)
    variables = module.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            jnp.asarray(xs[0]), labels=jnp.asarray(ys[0]),
                            train=True)

    def fill(path, leaf):
        val = init_values[flax_path_to_tf_name(path)]
        assert val.shape == leaf.shape
        return jnp.asarray(val)

    params = jax.tree_util.tree_map_with_path(fill, variables["params"])
    batch_stats = jax.tree_util.tree_map_with_path(
        fill, variables["batch_stats"])
    tx, _ = build_optimizer(algorithm_params)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, updates = module.apply(
                {"params": p, "batch_stats": batch_stats}, x, labels=y,
                train=True, rngs={"dropout": jax.random.key(2)},
                mutable=["batch_stats"])
            return jnp.mean(model.loss(out, y)), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, upd), new_stats, new_opt, loss

    losses = []
    for i in range(xs.shape[0]):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(xs[i]),
            jnp.asarray(ys[i]))
        losses.append(float(loss))

    final = {}
    for tree in (params, batch_stats):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in leaves:
            final[flax_path_to_tf_name(path)] = np.asarray(leaf)
    return losses, final


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--bands", type=int, default=9)
    parser.add_argument("--classes", type=int, default=5)
    parser.add_argument("--filter_count", type=int, default=64)
    parser.add_argument("--loss_rel_tolerance", type=float, default=0.02)
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args(argv)

    algorithm_params = {
        "filter_count": args.filter_count, "lrelu_alpha": 0.18,
        "bn_decay": 0.95, "l2regularizer_scale": 1e-5,
        "spectral_hierarchy_level": 3, "spatial_hierarchy_level": 3,
        "degradation_coeff": 3, "use_residual": True,
        # dropout OFF both sides: reference keep_prob = 1 - 0 = 1, rebuild
        # rate = 0 (the preserved keep_prob-inversion quirk)
        "drop_out_ratio": 0.0, "batch_size": args.batch,
        "optimizer": "AdamOptimizer", "learning_rate": 1e-3,
        "learning_rate_decay_factor": 0.96, "learning_rate_decay_step": 10,
        "compute_dtype": "float32",
    }
    rng = np.random.default_rng(0)
    xs, ys = make_batches(rng, args.steps, args.batch, 3, args.bands,
                          args.classes)

    init_values, ref_losses, ref_final = run_reference(
        xs, ys, algorithm_params, args.classes)
    our_losses, our_final = run_rebuild(
        xs, ys, algorithm_params, args.classes, init_values)

    ref_l = np.asarray(ref_losses)
    our_l = np.asarray(our_losses)
    loss_rel = np.abs(ref_l - our_l) / np.maximum(np.abs(ref_l), 1e-6)

    param_abs = {name: float(np.abs(ref_val - our_final[name]).max())
                 for name, ref_val in ref_final.items()}
    worst_param = max(param_abs, key=param_abs.get)
    worst_rel = param_abs[worst_param] / max(
        float(np.abs(ref_final[worst_param]).mean()), 1e-8)

    report = {
        "steps": args.steps,
        "loss_first_ref": ref_losses[0], "loss_first_ours": our_losses[0],
        "loss_last_ref": ref_losses[-1], "loss_last_ours": our_losses[-1],
        "max_loss_rel_diff": float(loss_rel.max()),
        # params drift slightly: TF v1 Adam applies epsilon to the
        # UNcorrected sqrt(v) (folding the bias correction into lr_t) while
        # optax corrects v first — same math as eps->0, tiny-gradient
        # params (BN betas) feel the differing effective epsilon most.  The
        # loss-trajectory bound is the meaningful criterion.
        "max_param_abs_diff": param_abs[worst_param],
        "worst_param": worst_param,
        "worst_param_rel_to_mean": worst_rel,
        "ok": bool(loss_rel.max() < args.loss_rel_tolerance),
    }
    print(json.dumps(report, indent=None if args.json else 2))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
