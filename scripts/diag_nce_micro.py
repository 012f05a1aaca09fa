"""Micro gradient-parity test of the NCE chain (throwaway diagnostic).

Compares TF vs JAX gradients of:
  1. global l2_normalize
  2. the full reference NCE: _calc_cross_feats + softmax CE + mean reduction
on identical fixed inputs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, P, E = 4, 6, 2
rng = np.random.default_rng(0)
q_in = rng.normal(0, 1, (B, P, E)).astype(np.float32)
k_in = rng.normal(0, 1, (B, P, E)).astype(np.float32)
c = rng.normal(0, 1, (B, P, E)).astype(np.float32)
tau = 0.07

# ---- TF ----
import tensorflow as tf

v1 = tf.compat.v1
v1.disable_v2_behavior()
v1.disable_eager_execution()

g = v1.Graph()
with g.as_default():
    q = v1.placeholder(tf.float32, (B, P, E))
    k = v1.placeholder(tf.float32, (B, P, E))

    # 1. global l2_normalize of q, probe loss sum(c * y)
    yq = tf.math.l2_normalize(q)
    probe = tf.reduce_sum(yq * tf.constant(c))
    g_norm = tf.gradients(probe, q)[0]

    # 2. full NCE (per-patch-group normalize: normalize each (B,E) slice
    #    globally, like the featD does per group before concat)
    groups_q = [tf.math.l2_normalize(q[:, i, :]) for i in range(P)]
    groups_k = [tf.math.l2_normalize(k[:, i, :]) for i in range(P)]
    qn = tf.stack(groups_q, axis=1)
    kn = tf.stack(groups_k, axis=1)
    logits = tf.matmul(qn, tf.transpose(kn, perm=[0, 2, 1])) / tau
    labels = tf.eye(tf.shape(logits)[1], tf.shape(logits)[2], batch_shape=[B])
    from tensorflow.python.layers.core import flatten
    fl_labels, fl_logits = flatten(labels), flatten(logits)
    loss_vec = tf.nn.softmax_cross_entropy_with_logits(labels=fl_labels,
                                                       logits=fl_logits)
    loss = v1.losses.compute_weighted_loss(
        loss_vec, 1.0,
        reduction=v1.losses.Reduction.SUM_OVER_BATCH_SIZE)
    g_q, g_k = tf.gradients(loss, [q, k])

    with v1.Session() as sess:
        tf_norm_grad, tf_loss, tf_gq, tf_gk = sess.run(
            [g_norm, loss, g_q, g_k], {q: q_in, k: k_in})

# ---- JAX ----
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def l2n(x):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(jnp.square(x)), 1e-12))


def probe_fn(qv):
    return jnp.sum(l2n(qv) * c)


jx_norm_grad = jax.grad(probe_fn)(jnp.asarray(q_in))

from hypelcnn_tpu.gan.losses import nce_loss


def nce_fn(qv, kv):
    qn = jnp.stack([l2n(qv[:, i, :]) for i in range(P)], axis=1)
    kn = jnp.stack([l2n(kv[:, i, :]) for i in range(P)], axis=1)
    return nce_loss(qn, kn, tau)


jx_loss = nce_fn(jnp.asarray(q_in), jnp.asarray(k_in))
jx_gq, jx_gk = jax.grad(nce_fn, argnums=(0, 1))(jnp.asarray(q_in),
                                                jnp.asarray(k_in))

print("l2_normalize grad  max|d|:", float(np.abs(tf_norm_grad - np.asarray(jx_norm_grad)).max()))
print("nce loss           tf=%.7f jax=%.7f" % (tf_loss, float(jx_loss)))
print("nce grad q         max|d|: %.3e (|g| %.3e)" % (
    float(np.abs(tf_gq - np.asarray(jx_gq)).max()), float(np.abs(tf_gq).max())))
print("nce grad k         max|d|: %.3e (|g| %.3e)" % (
    float(np.abs(tf_gk - np.asarray(jx_gk)).max()), float(np.abs(tf_gk).max())))
