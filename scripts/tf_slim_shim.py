"""Minimal, faithful tf_slim stand-in so the TF reference can run in this image.

The baseline measurement (`scripts/measure_tf_reference.py`) runs the
reference's OWN graph-building code (`/root/reference/common/common_nn_ops.py`,
`/root/reference/nnmodel/HYPELCNNModel.py`) under TF 2.21's compat.v1 mode.
The image lacks ``tf_slim``, so this module provides the handful of slim
symbols those files import, with slim's documented semantics:

- ``conv2d`` / ``fully_connected``: weight variable (+optional regularizer),
  no bias when ``normalizer_fn`` is set, then ``normalizer_fn`` then
  ``activation_fn`` — the layer composition slim documents and the reference
  relies on (conv -> batch_norm -> leaky_relu).
- ``batch_norm``: fused BN with ``momentum=decay``; update ops registered in
  ``GraphKeys.UPDATE_OPS`` exactly as slim does (the reference couples its
  train op to that collection, common_nn_ops.py:239-243).
- ``arg_scope``: per-function default-kwarg stack (slim's contextmanager).
- ``create_train_op``: gradient step wrapped in UPDATE_OPS control deps —
  the documented behavior of ``tf_slim.learning.create_train_op``.

This is measurement scaffolding, NOT part of the framework; nothing under
``hypelcnn_tpu/`` imports it.
"""

from __future__ import annotations

import contextlib
import threading

import tensorflow as tf

v1 = tf.compat.v1

_SCOPE_STACK = threading.local()


def _current_defaults(fn_name):
    stack = getattr(_SCOPE_STACK, "stack", None)
    merged = {}
    if stack:
        for frame in stack:
            merged.update(frame.get(fn_name, {}))
    return merged


@contextlib.contextmanager
def arg_scope(func_list, **kwargs):
    frame = {fn.__name__: dict(kwargs) for fn in func_list}
    stack = getattr(_SCOPE_STACK, "stack", None)
    if stack is None:
        stack = _SCOPE_STACK.stack = []
    stack.append(frame)
    try:
        yield
    finally:
        stack.pop()


# sentinel marking "caller did not pass this argument" — slim's precedence is
# explicit call arg > arg_scope value > signature default, and a plain
# defaults-dict merge cannot distinguish the first from the last (that merge
# bug silently dropped the reference's arg_scope batch_norm/lrelu/initializer
# settings and invalidated an earlier baseline measurement)
_UNSET = object()


def _resolve(fn_name, call_values, slim_defaults):
    """Resolve layer kwargs with slim's precedence.

    ``call_values`` maps name -> value as received (``_UNSET`` when the
    caller omitted it); ``slim_defaults`` maps name -> slim's documented
    signature default.
    """
    scope = _current_defaults(fn_name)
    out = {}
    for name, default in slim_defaults.items():
        value = call_values[name]
        if value is _UNSET:
            value = scope.get(name, default)
        out[name] = value
    return out


def l2_regularizer(scale):
    def reg(weights):
        return tf.multiply(tf.nn.l2_loss(weights), scale, name="l2_regularizer")

    return reg


def batch_norm(inputs, is_training=True, decay=0.999, epsilon=0.001,
               center=True, scale=False, **_unused):
    """slim.batch_norm semantics on raw TF ops (Keras 3 removed v1.layers).

    Moving-average updates are registered in GraphKeys.UPDATE_OPS, which the
    reference's train op depends on (common_nn_ops.py:239-243).
    """
    with v1.variable_scope("BatchNorm"):
        ch = int(inputs.get_shape()[-1])
        beta = (v1.get_variable("beta", [ch], initializer=v1.zeros_initializer())
                if center else tf.constant(0.0, shape=[ch]))
        gamma = (v1.get_variable("gamma", [ch], initializer=v1.ones_initializer())
                 if scale else tf.constant(1.0, shape=[ch]))
        moving_mean = v1.get_variable("moving_mean", [ch], trainable=False,
                                      initializer=v1.zeros_initializer())
        moving_var = v1.get_variable("moving_variance", [ch], trainable=False,
                                     initializer=v1.ones_initializer())
        rank = inputs.get_shape().ndims
        if is_training:
            if rank == 4:
                out, batch_mean, batch_var = v1.nn.fused_batch_norm(
                    inputs, gamma, beta, epsilon=epsilon, is_training=True)
            else:
                batch_mean, batch_var = tf.nn.moments(inputs, axes=[0])
                out = tf.nn.batch_normalization(inputs, batch_mean, batch_var,
                                                beta, gamma, epsilon)
                # slim routes 2-D inputs through fused_batch_norm (reshaped
                # to 4-D), whose returned batch_var carries BESSEL's
                # correction for the moving update — replicate that here so
                # the dense-layer moving variance matches real slim.  The
                # batch dim is dynamic (None) under tf.data batching, so
                # fall back to a runtime count in that case
                n_static = getattr(inputs.get_shape()[0], "value",
                                   inputs.get_shape()[0])
                if n_static is not None:
                    bessel = float(n_static) / max(float(n_static) - 1.0, 1.0)
                else:
                    n_dyn = tf.cast(tf.shape(inputs)[0], tf.float32)
                    bessel = n_dyn / tf.maximum(n_dyn - 1.0, 1.0)
                batch_var = batch_var * bessel
            one_minus = 1.0 - decay
            v1.add_to_collection(v1.GraphKeys.UPDATE_OPS, v1.assign_add(
                moving_mean, (batch_mean - moving_mean) * one_minus))
            v1.add_to_collection(v1.GraphKeys.UPDATE_OPS, v1.assign_add(
                moving_var, (batch_var - moving_var) * one_minus))
        else:
            if rank == 4:
                out, _, _ = v1.nn.fused_batch_norm(
                    inputs, gamma, beta, mean=moving_mean,
                    variance=moving_var, epsilon=epsilon, is_training=False)
            else:
                out = tf.nn.batch_normalization(inputs, moving_mean, moving_var,
                                                beta, gamma, epsilon)
        return out


def _pair(value):
    if isinstance(value, (list, tuple)):
        return int(value[0]), int(value[1])
    return int(value), int(value)


def conv2d(inputs, num_outputs, kernel_size, stride=1, padding="SAME",
           data_format=None, activation_fn=_UNSET, normalizer_fn=_UNSET,
           normalizer_params=_UNSET, weights_initializer=_UNSET,
           weights_regularizer=_UNSET, biases_initializer=None, scope=None,
           **kwargs):
    del kwargs
    params = _resolve(
        "conv2d",
        dict(activation_fn=activation_fn, normalizer_fn=normalizer_fn,
             normalizer_params=normalizer_params,
             weights_initializer=weights_initializer,
             weights_regularizer=weights_regularizer),
        dict(activation_fn=tf.nn.relu, normalizer_fn=None,
             normalizer_params=None, weights_initializer=None,
             weights_regularizer=None))
    activation_fn = params["activation_fn"]
    normalizer_fn = params["normalizer_fn"]
    normalizer_params = params["normalizer_params"] or {}
    weights_initializer = params["weights_initializer"] or v1.glorot_uniform_initializer()
    weights_regularizer = params["weights_regularizer"]

    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    with v1.variable_scope(scope, default_name="Conv"):
        in_ch = int(inputs.get_shape()[3])
        w = v1.get_variable("weights", [kh, kw, in_ch, int(num_outputs)],
                            initializer=weights_initializer,
                            regularizer=weights_regularizer)
        out = tf.nn.conv2d(inputs, w, strides=[1, sh, sw, 1], padding=padding)
        if normalizer_fn is not None:
            out = normalizer_fn(out, **normalizer_params)
        else:
            b_init = biases_initializer or v1.zeros_initializer()
            b = v1.get_variable("biases", [int(num_outputs)], initializer=b_init)
            out = tf.nn.bias_add(out, b)
        if activation_fn is not None:
            out = activation_fn(out)
        return out


def fully_connected(inputs, num_outputs, activation_fn=_UNSET,
                    normalizer_fn=_UNSET, normalizer_params=_UNSET,
                    weights_initializer=_UNSET, weights_regularizer=_UNSET,
                    biases_initializer=None, scope=None, **kwargs):
    del kwargs
    # NB: weights_regularizer=None is an explicit opt-out at several reference
    # call sites (HYPELCNNModel.py:121-141) and must override the arg_scope
    # default — exactly the explicit-beats-scope precedence _resolve encodes.
    params = _resolve(
        "fully_connected",
        dict(activation_fn=activation_fn, normalizer_fn=normalizer_fn,
             normalizer_params=normalizer_params,
             weights_initializer=weights_initializer,
             weights_regularizer=weights_regularizer),
        dict(activation_fn=tf.nn.relu, normalizer_fn=None,
             normalizer_params=None, weights_initializer=None,
             weights_regularizer=None))
    weights_regularizer = params["weights_regularizer"]
    activation_fn = params["activation_fn"]
    normalizer_fn = params["normalizer_fn"]
    normalizer_params = params["normalizer_params"] or {}
    weights_initializer = params["weights_initializer"] or v1.glorot_uniform_initializer()

    with v1.variable_scope(scope, default_name="fully_connected"):
        in_dim = int(inputs.get_shape()[-1])
        w = v1.get_variable("weights", [in_dim, int(num_outputs)],
                            initializer=weights_initializer,
                            regularizer=weights_regularizer)
        out = tf.matmul(inputs, w)
        if normalizer_fn is not None:
            out = normalizer_fn(out, **normalizer_params)
        else:
            b_init = biases_initializer or v1.zeros_initializer()
            b = v1.get_variable("biases", [int(num_outputs)], initializer=b_init)
            out = tf.nn.bias_add(out, b)
        if activation_fn is not None:
            out = activation_fn(out)
        return out


def flatten(inputs, scope=None):
    del scope
    shape = inputs.get_shape().as_list()
    dim = 1
    for d in shape[1:]:
        dim *= int(d)
    return tf.reshape(inputs, [-1, dim])


def dropout(inputs, keep_prob=0.5, is_training=True, scope=None):
    del scope
    if not is_training:
        return inputs
    return tf.nn.dropout(inputs, rate=1.0 - keep_prob)


def convolution1d(inputs, num_outputs, kernel_size, stride=1, padding="SAME",
                  data_format=None, activation_fn=_UNSET, normalizer_fn=_UNSET,
                  normalizer_params=_UNSET, weights_initializer=_UNSET,
                  weights_regularizer=_UNSET, biases_initializer=None,
                  scope=None, **kwargs):
    """slim.convolution1d over [B, W, C] (the GAN generator's spectral convs,
    reference gan/shadow_data_models.py:61-87)."""
    del kwargs
    params = _resolve(
        "convolution1d",
        dict(activation_fn=activation_fn, normalizer_fn=normalizer_fn,
             normalizer_params=normalizer_params,
             weights_initializer=weights_initializer,
             weights_regularizer=weights_regularizer),
        dict(activation_fn=tf.nn.relu, normalizer_fn=None,
             normalizer_params=None, weights_initializer=None,
             weights_regularizer=None))
    activation_fn = params["activation_fn"]
    normalizer_fn = params["normalizer_fn"]
    normalizer_params = params["normalizer_params"] or {}
    weights_initializer = params["weights_initializer"] or v1.glorot_uniform_initializer()
    weights_regularizer = params["weights_regularizer"]

    k = int(kernel_size[0] if isinstance(kernel_size, (list, tuple)) else kernel_size)
    with v1.variable_scope(scope, default_name="Conv"):
        in_ch = int(inputs.get_shape()[-1])
        w = v1.get_variable("weights", [k, in_ch, int(num_outputs)],
                            initializer=weights_initializer,
                            regularizer=weights_regularizer)
        out = tf.nn.conv1d(inputs, w, stride=int(stride), padding=padding)
        if normalizer_fn is not None:
            out = normalizer_fn(out, **normalizer_params)
        else:
            b_init = biases_initializer or v1.zeros_initializer()
            b = v1.get_variable("biases", [int(num_outputs)], initializer=b_init)
            out = tf.nn.bias_add(out, b)
        if activation_fn is not None:
            out = activation_fn(out)
        return out


def separable_conv2d(*args, **kwargs):  # pragma: no cover - GAN models only
    raise NotImplementedError("not needed for the classification baseline")


def conv2d_transpose(*args, **kwargs):  # pragma: no cover
    # importable (arg_scope lists it) but never called by the measured or
    # parity-checked reference paths
    raise NotImplementedError("not needed for the measured reference paths")


def get_variables_to_restore(include=None, exclude=None):
    variables = v1.global_variables()
    if include:
        variables = [v for v in variables
                     if any(v.name.startswith(p) for p in include)]
    if exclude:
        variables = [v for v in variables
                     if not any(v.name.startswith(p) for p in exclude)]
    return variables


def get_model_variables():
    return v1.get_collection(v1.GraphKeys.TRAINABLE_VARIABLES)


def get_trainable_variables(scope=None):
    """Optionally scope-filtered (a VariableScope or name prefix — the CUT
    wrapper passes scopes, `cut_wrapper.py:344-346`)."""
    variables = v1.get_collection(v1.GraphKeys.TRAINABLE_VARIABLES)
    if scope is None:
        return variables
    prefix = getattr(scope, "name", scope)
    return [v for v in variables if v.name.startswith(prefix + "/")
            or v.name.startswith(prefix + ":")]


_USE_GLOBAL_STEP = object()  # tf_slim's sentinel: None means NO increment


def create_train_op(total_loss, optimizer, global_step=_USE_GLOBAL_STEP,
                    variables_to_train=None, update_ops=None, **kwargs):
    """tf_slim.learning.create_train_op: minimize under UPDATE_OPS deps.

    ``global_step=None`` EXPLICITLY disables the step increment (real
    tf_slim uses a sentinel default the same way) — tfgan's cut_train_ops
    relies on this so the three sequential sub-updates don't each advance
    the LR-decay step (`cut_wrapper.py:533-583`)."""
    del kwargs
    if global_step is _USE_GLOBAL_STEP:
        global_step = v1.train.get_or_create_global_step()
    if update_ops is None:
        update_ops = v1.get_collection(v1.GraphKeys.UPDATE_OPS)
    with tf.control_dependencies(list(update_ops) or None):
        return optimizer.minimize(total_loss, global_step=global_step,
                                  var_list=variables_to_train)


def cohen_kappa(labels, predictions_idx, num_classes, name=None):
    """Streaming kappa lookalike (metrics are not on the measured hot loop)."""
    with v1.variable_scope(name, default_name="kappa"):
        var = v1.get_local_variable("kappa_value", shape=[],
                                    initializer=v1.zeros_initializer())
        return var.read_value(), var.assign(var)


def install():
    """Register this module as ``tf_slim`` (+submodules) in sys.modules."""
    import sys
    import types

    module = sys.modules[__name__]
    sys.modules["tf_slim"] = module
    learning = types.ModuleType("tf_slim.learning")
    learning.create_train_op = create_train_op
    sys.modules["tf_slim.learning"] = learning
    module.learning = learning
    metrics = types.ModuleType("tf_slim.metrics")
    metrics.cohen_kappa = cohen_kappa
    sys.modules["tf_slim.metrics"] = metrics
    module.metrics = metrics
