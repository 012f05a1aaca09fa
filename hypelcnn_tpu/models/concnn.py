"""CONCNN — context CNN with an inception-style front end.

Parity with reference `nnmodel/CONCNNModel.py:23-68`: parallel 1x1/3x3/5x5
convolutions concatenated then local-response-normalized, residual 1x1
stacks, a dropout conv stage, and a linear FC head; ReLU activations and
xavier init (tf-slim defaults — the reference's arg_scope sets nothing);
softmax CE loss.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypelcnn_tpu.core.registry import register_model
from hypelcnn_tpu.models.base import ModelOutput, NNModel, softmax_cross_entropy
from hypelcnn_tpu.models.layers import SlimConv, SlimDense
from hypelcnn_tpu.ops.nn import local_response_normalization

DEFAULT_PARAMS: Dict[str, Any] = {
    # matches nnmodel/modelconfigs/alg_param_concnn.json
    "batch_size": 10,
    "drop_out_ratio": 0.5,
    "learning_rate": 0.001,
    "learning_rate_decay_factor": 0.01,
    "learning_rate_decay_step": 33333,
    "filter_count": 128,
    "optimizer": ["MomentumOptimizer", 0.9],
    "compute_dtype": "float32",
}


class CONCNNModule(nn.Module):
    class_count: int
    params_dict: Dict[str, Any]

    def _conv(self, features: int, kernel: int, name: str) -> SlimConv:
        return SlimConv(features, kernel, name=name,
                        dtype=jnp.dtype(self.params_dict.get("compute_dtype", "float32")))

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array | None = None,
                 train: bool = False) -> ModelOutput:
        p = self.params_dict
        f0 = p["filter_count"]

        net0_1x1 = self._conv(f0, 1, "conv0_1x1")(x, train=train)
        net0_3x3 = self._conv(f0, 3, "conv0_3x3")(x, train=train)
        net0_5x5 = self._conv(f0, 5, "conv0_5x5")(x, train=train)
        net0 = jnp.concatenate([net0_1x1, net0_3x3, net0_5x5], axis=-1)
        net0 = local_response_normalization(net0)

        f1 = f0 * 3
        net11 = self._conv(f1, 1, "conv11")(net0, train=train)
        net11 = local_response_normalization(net11)
        net12 = self._conv(f1, 1, "conv12")(net11, train=train)
        net13 = self._conv(f1, 1, "conv13")(net12, train=train)
        net13 = net13 + net11

        net21 = self._conv(f1, 1, "conv21")(net13, train=train)
        net22 = self._conv(f1, 1, "conv22")(net21, train=train)
        net22 = net22 + net13

        # reference quirk PRESERVED (`CONCNNModel.py:53-58`): drop_out_ratio
        # is passed POSITIONALLY as slim dropout's keep_prob, so the kept
        # fraction equals drop_out_ratio and the flax rate is its inverse
        # (indistinguishable only at the 0.5 default; diverges for every
        # other tuned value)
        drop_rate = 1.0 - p["drop_out_ratio"]
        net31 = self._conv(f1, 1, "conv31")(net22, train=train)
        net31 = nn.Dropout(rate=drop_rate, deterministic=not train)(net31)
        net32 = self._conv(f1, 1, "conv32")(net31, train=train)
        net32 = nn.Dropout(rate=drop_rate, deterministic=not train)(net32)
        net33 = self._conv(f1, 1, "conv33")(net32, train=train)

        flat = net33.reshape(net33.shape[0], -1)
        logits = SlimDense(self.class_count, name="fc", activation=None)(flat, train=train)
        logits = logits.astype(jnp.float32)
        return ModelOutput(y_conv=logits, image_output=None, image_original=None, histograms={})


@register_model("CONCNNModel")
class CONCNNModel(NNModel):
    def default_params(self) -> Dict[str, Any]:
        return dict(DEFAULT_PARAMS)

    def create_module(self, class_count: int, algorithm_params: Dict[str, Any]):
        params = {**DEFAULT_PARAMS, **algorithm_params}
        return CONCNNModule(class_count=class_count, params_dict=params)

    def loss(self, output: ModelOutput, labels_onehot: jax.Array) -> jax.Array:
        return softmax_cross_entropy(output.y_conv, labels_onehot)
