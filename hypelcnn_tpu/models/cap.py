"""CAP — capsule network with dynamic routing.

Parity with reference `nnmodel/CAPModel.py:30-193`:

- conv stem + PrimaryCaps conv (both VALID, batch-normalized, ReLU),
- per-spatial-capsule linear maps to digit-capsule prediction vectors
  (the reference builds one 1x1 conv per input capsule,
  `nnmodel/CAPModel.py:71-84`; here that is a single batched einsum over a
  ``[data_size, in_caps_dim, out]`` weight — identical math, one MXU matmul),
- dynamic routing with softmax coupling over the digit axis, the reference's
  *mean*-normed squash (`:104-106`), and batch-summed agreement updates
  (`:108-115`) — coupling logits are shared across the batch as in the
  reference,
- class scores = capsule L2 norms; optional masked-capsule FC decoder.

Quirks preserved: ``primary_capsule_output_space`` is read from the
``digit_capsule_output_space`` key (`nnmodel/CAPModel.py:38`), and the active
loss is softmax CE + reconstruction — the margin loss exists but is unused
(`:152-188`); it is provided here as :func:`margin_loss` for completeness.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypelcnn_tpu.core.registry import register_model
from hypelcnn_tpu.models.base import (
    ModelOutput,
    NNModel,
    reconstruction_loss,
    softmax_cross_entropy,
)
from hypelcnn_tpu.models.layers import SlimConv, SlimDense
from hypelcnn_tpu.ops.nn import leaky_relu, squash

DEFAULT_PARAMS: Dict[str, Any] = {
    # matches nnmodel/modelconfigs/alg_param_capn.json
    "iter_routing": 3,
    "conv_layer_kernel_size": 1,
    "primary_caps_kernel_size": 1,
    "feature_count": 256,
    "primary_capsule_count": 32,
    "primary_capsule_output_space": 8,
    "digit_capsule_output_space": 16,
    "batch_size": 16,
    "optimizer": "AdamOptimizer",
    "learning_rate": 1e-4,
    "learning_rate_decay_factor": 0.96,
    "learning_rate_decay_step": 350,
    "lrelu_alpha": 0.18,
    "enable_decoding": True,
    "compute_dtype": "float32",
}


class CAPModule(nn.Module):
    class_count: int
    params_dict: Dict[str, Any]

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array | None = None,
                 train: bool = False) -> ModelOutput:
        p = self.params_dict
        # reference quirk (`nnmodel/CAPModel.py:38`): primary caps dim taken
        # from the digit key
        pco = p["digit_capsule_output_space"]
        dco = p["digit_capsule_output_space"]
        dcc = self.class_count
        iter_routing = p["iter_routing"]

        # reference quirk PRESERVED: CAP's conv2d calls pass normalizer_fn=
        # batch_norm with NO is_training (`nnmodel/CAPModel.py:53-65`), and
        # slim.batch_norm's is_training literally defaults to True — so CAP
        # normalizes with BATCH statistics even at inference/eval time
        net = SlimConv(p["feature_count"], p["conv_layer_kernel_size"], name="Conv1_layer",
                       padding="VALID", use_batch_norm=True, bn_momentum=0.999,
                       always_batch_stats=True)(x, train=train)
        net = SlimConv(p["primary_capsule_count"] * pco, p["primary_caps_kernel_size"],
                       name="PrimaryCaps_layer", padding="VALID",
                       use_batch_norm=True, bn_momentum=0.999,
                       always_batch_stats=True)(net, train=train)

        data_size = (net.shape[1] * net.shape[2] * net.shape[3]) // pco
        u = net.reshape(net.shape[0], data_size, pco)

        # per-input-capsule transform (one fused einsum vs. data_size 1x1
        # convs).  Init parity: the reference draws each capsule's [1,1,pco,
        # dcc*dco] conv weight independently with xavier over fan_in=pco
        # (`CAPModel.py:73-78`), so the capsule axis is a BATCH axis for the
        # initializer — plain xavier on the 3D shape would fold data_size
        # into the receptive field and shrink init std by ~sqrt(data_size).
        per_capsule_xavier = nn.initializers.xavier_uniform(
            in_axis=-2, out_axis=-1, batch_axis=0)
        w = self.param("digitcaps_w", per_capsule_xavier,
                       (data_size, pco, dcc * dco))
        b_lin = self.param("digitcaps_b", nn.initializers.zeros, (data_size, dcc * dco))
        u_hat = jnp.einsum("bdp,dpq->bdq", u, w,
                           preferred_element_type=jnp.float32) + b_lin
        u_hat = u_hat.reshape(-1, data_size, dcc, dco)

        # dynamic routing (reference `:86-120`); coupling logits shared over batch
        b_ij = jnp.zeros((data_size, dcc), dtype=jnp.float32)
        v = None
        for _ in range(iter_routing):
            c_ij = jax.nn.softmax(b_ij, axis=1)
            s = jnp.einsum("bdjc,dj->bjc", u_hat, c_ij, preferred_element_type=jnp.float32)
            v = squash(s, axis=-1)
            b_ij = b_ij + jnp.einsum("bdjc,bjc->dj", u_hat, v,
                                     preferred_element_type=jnp.float32)

        y_conv = jnp.linalg.norm(v, axis=2)

        decoder_out = None
        if train and p["enable_decoding"] and labels is not None:
            y_float = labels.astype(jnp.float32)
            masked_v = jnp.einsum("bjc,bj->bc", v, y_float)
            act = lambda t: leaky_relu(t, p["lrelu_alpha"])
            g = SlimDense(512, name="decoder_fc1", activation=act)(masked_v, train=train)
            g = SlimDense(1024, name="decoder_fc2", activation=act)(g, train=train)
            size = x.shape[1] * x.shape[2] * x.shape[3]
            decoder_out = SlimDense(size, name="decoder_fc3",
                                    activation=nn.sigmoid)(g, train=train)

        return ModelOutput(y_conv=y_conv, image_output=decoder_out,
                           image_original=x, histograms={})


def margin_loss(logits: jax.Array, labels_onehot: jax.Array,
                x_output=None, x_original=None) -> jax.Array:
    """Capsule margin loss (implemented-but-unused in the reference,
    `nnmodel/CAPModel.py:152-175`)."""
    labels_f = labels_onehot.astype(jnp.float32)
    m_plus, m_minus, lambda_val = 0.9, 0.1, 0.5
    max_l = jnp.square(jnp.maximum(0.0, m_plus - logits))
    max_r = jnp.square(jnp.maximum(0.0, logits - m_minus))
    l_c = labels_f * max_l + lambda_val * (1.0 - labels_f) * max_r
    loss = jnp.mean(jnp.sum(l_c, axis=1))
    if x_output is not None:
        origin = x_original.reshape(x_original.shape[0], -1)
        loss = loss + 0.0005 * jnp.mean(jnp.square(x_output - origin))
    return loss


@register_model("CAPModel")
class CAPModel(NNModel):
    def default_params(self) -> Dict[str, Any]:
        return dict(DEFAULT_PARAMS)

    def create_module(self, class_count: int, algorithm_params: Dict[str, Any]):
        params = {**DEFAULT_PARAMS, **algorithm_params}
        return CAPModule(class_count=class_count, params_dict=params)

    def loss(self, output: ModelOutput, labels_onehot: jax.Array) -> jax.Array:
        ce = softmax_cross_entropy(output.y_conv, labels_onehot)
        if output.image_output is None:
            return ce
        return ce + reconstruction_loss(output)
