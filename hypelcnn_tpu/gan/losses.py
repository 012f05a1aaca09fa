"""GAN loss functions.

Replaces the tensorflow-gan tuple-loss machinery the reference leans on:
- least-squares (LSGAN) generator/discriminator losses — the default for
  CycleGAN (tfgan `cyclegan_loss`) and explicit for CUT
  (`gan/wrappers/cut_wrapper.py:629-630`),
- wasserstein losses — the tfgan `gan_loss` default used by the vanilla
  GANWrapper (`gan/wrappers/gan_wrapper.py:49-57`),
- cycle-consistency + identity L1 terms
  (`gan/wrappers/cycle_gan_wrapper.py:189-255,323-333`),
- the CUT patchwise-NCE contrastive losses: cross-feature logits / tau with
  identity-matrix labels, flattened softmax CE
  (`gan/wrappers/cut_wrapper.py:359-420`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---- adversarial pairs ----

def least_squares_generator_loss(disc_gen_outputs: jax.Array,
                                 real_label: float = 1.0) -> jax.Array:
    return 0.5 * jnp.mean(jnp.square(disc_gen_outputs - real_label))


def least_squares_discriminator_loss(disc_real_outputs: jax.Array,
                                     disc_gen_outputs: jax.Array,
                                     real_label: float = 1.0,
                                     fake_label: float = 0.0) -> jax.Array:
    loss_real = jnp.mean(jnp.square(disc_real_outputs - real_label))
    loss_gen = jnp.mean(jnp.square(disc_gen_outputs - fake_label))
    return 0.5 * (loss_real + loss_gen)


def wasserstein_generator_loss(disc_gen_outputs: jax.Array) -> jax.Array:
    return -jnp.mean(disc_gen_outputs)


def wasserstein_discriminator_loss(disc_real_outputs: jax.Array,
                                   disc_gen_outputs: jax.Array) -> jax.Array:
    return jnp.mean(disc_gen_outputs) - jnp.mean(disc_real_outputs)


# ---- auxiliary reconstruction terms ----

def cycle_consistency_loss(x: jax.Array, reconstructed_x: jax.Array,
                           y: jax.Array, reconstructed_y: jax.Array) -> jax.Array:
    """tfgan cycle_consistency_loss: mean |G(F(x)) - x| + mean |F(G(y)) - y|."""
    return jnp.mean(jnp.abs(reconstructed_x - x)) + jnp.mean(jnp.abs(reconstructed_y - y))


def identity_loss(inputs: jax.Array, identity_mapped: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(identity_mapped - inputs))


# ---- CUT contrastive (NCE) losses ----

@jax.custom_vjp
def _tf_softmax_ce(flat_logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-row softmax cross-entropy with TF's FUSED-OP gradient.

    TF's ``SoftmaxCrossEntropyWithLogits`` registers backward
    ``upstream * (softmax(logits) - labels)`` — the true gradient only when
    each label row sums to 1.  The reference feeds FLATTENED identity labels
    (each row sums to P, `gan/wrappers/cut_wrapper.py:371-383`), so the
    gradient the reference actually trains with is NOT the gradient of the
    displayed loss (that would be ``P*softmax - labels``).  Autodiffing the
    value expression diverged the matched-init CUT trajectory at O(1) in the
    first step (measured, scripts/diag_nce_micro.py); this custom_vjp
    reproduces the fused op's backward exactly.
    """
    log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
    return -(labels * log_probs).sum(axis=-1)


def _tf_softmax_ce_fwd(flat_logits, labels):
    return _tf_softmax_ce(flat_logits, labels), (flat_logits, labels)


def _tf_softmax_ce_bwd(res, g):
    flat_logits, labels = res
    softmax = jax.nn.softmax(flat_logits, axis=-1)
    grad_logits = g[..., None] * (softmax - labels)
    # TF v2 also backprops -log_softmax into labels, but every reference call
    # site passes a constant identity matrix, so a zero cotangent is exact.
    return grad_logits, jnp.zeros_like(labels)


_tf_softmax_ce.defvjp(_tf_softmax_ce_fwd, _tf_softmax_ce_bwd)


def nce_loss(query_feats: jax.Array, key_feats: jax.Array, tau: float) -> jax.Array:
    """Patchwise NCE (reference `_calc_cross_feats` +
    `_contrastive_gen_data_x_loss_impl`, `gan/wrappers/cut_wrapper.py:359-393`).

    ``query_feats``/``key_feats``: [B, P, E] patch embeddings.  Logits are the
    [P, P] cross-similarities / tau; labels the identity matrix, both
    flattened to length P*P as in the reference (softmax over ALL P*P
    entries, labels summing to P — quirk preserved); reduced by mean over
    the batch.  Backward matches TF's fused op, see `_tf_softmax_ce`.
    """
    logits = jnp.einsum("bpe,bqe->bpq", query_feats, key_feats,
                        preferred_element_type=jnp.float32) / tau
    batch, p, q = logits.shape
    labels = jnp.broadcast_to(
        jnp.eye(p, q, dtype=jnp.float32).reshape(1, p * q), (batch, p * q))
    flat_logits = logits.reshape(batch, p * q)
    per_example = _tf_softmax_ce(flat_logits, labels)
    return jnp.mean(per_example)


def l2_regularization(params, scale: float, exclude: tuple = ()) -> jax.Array:
    """Sum of 0.5*scale*||w||^2 over kernel params (tf-slim l2_regularizer
    semantics: ``scale * 0.5 * l2norm(w)^2``).

    ``exclude`` skips kernels whose module name matches — the reference's
    discriminator declares its final layer with ``weights_regularizer=None``
    (`gan/shadow_data_models.py:117-121`), so callers pass
    ``exclude=("fc3",)`` for it.
    """
    def keep(path):
        if not path or getattr(path[-1], "key", "") != "kernel":
            return False
        return not any(getattr(part, "key", "") in exclude for part in path)

    leaves = [p for path, p in jax.tree_util.tree_leaves_with_path(params)
              if keep(path)]
    if not leaves:
        return jnp.zeros(())
    return scale * 0.5 * sum(jnp.sum(jnp.square(w)) for w in leaves)
