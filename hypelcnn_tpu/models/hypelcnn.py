"""HYPELCNN — the flagship spectral/spatial multi-scale CNN.

Architecture parity with reference `nnmodel/HYPELCNNModel.py:34-183`:

- spectral encoder/decoder stacks of 1x1 convolutions with filter doubling /
  halving and per-layer residual adds through the channel shape-matcher,
- hierarchical spatial blocks: parallel odd k x k SAME convolutions
  concatenated, a 1x1 connector conv, residual adds,
- a log-scaled fully-connected pyramid with dropout,
- a batch-normalized (no activation) logit head,
- training-only image-reconstruction decoder heads driven from the logits,
- loss = softmax cross-entropy + MSE reconstruction when the decoder exists
  (`nnmodel/HYPELCNNModel.py:101-112`).

TPU notes: 1x1 convolutions over [B, k, k, C] patches are batched matmuls on
the MXU; all kernels are static shapes so XLA fuses batch-norm + leaky-relu
chains into the convs.  ``compute_dtype: "bfloat16"`` in algorithm_params
switches the matmul dtype while keeping parameters and loss in float32.

Known reference quirks preserved: the declared l2 regularizer is never added
to the optimized loss (tf-slim ``create_train_op`` receives only the cross
entropy — reference `common/common_nn_ops.py:232`), and dropout *rate* equals
``drop_out_ratio`` because the reference passes ``keep_prob=1-drop_out_ratio``
(`nnmodel/HYPELCNNModel.py:123-124`).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypelcnn_tpu.core.registry import register_model
from hypelcnn_tpu.models.base import ModelOutput, NNModel, reconstruction_loss, softmax_cross_entropy
from hypelcnn_tpu.models.layers import SlimConv, SlimDense, he_truncated
from hypelcnn_tpu.ops.nn import leaky_relu, scale_in_to_out

DEFAULT_PARAMS: Dict[str, Any] = {
    # matches nnmodel/modelconfigs/alg_param_hypelcnn.json
    "batch_size": 48,
    "drop_out_ratio": 0.70,
    "filter_count": 480,
    "learning_rate": 3e-4,
    "learning_rate_decay_factor": 0.96,
    "learning_rate_decay_step": 350,
    "lrelu_alpha": 0.18,
    "optimizer": "AdamOptimizer",
    "bn_decay": 0.95,
    "l2regularizer_scale": 1e-5,
    "spectral_hierarchy_level": 3,
    "spatial_hierarchy_level": 3,
    "degradation_coeff": 3,
    "use_residual": True,
    "compute_dtype": "float32",
}


class HYPELCNNModule(nn.Module):
    class_count: int
    params_dict: Dict[str, Any]

    def _conv(self, features: int, kernel: int, name: str) -> SlimConv:
        p = self.params_dict
        return SlimConv(features, kernel, name=name,
                        activation=lambda v: leaky_relu(v, p["lrelu_alpha"]),
                        use_batch_norm=True, bn_momentum=p["bn_decay"],
                        kernel_init=he_truncated,
                        dtype=jnp.dtype(p.get("compute_dtype", "float32")))

    def _dense(self, features: int, name: str, activation="lrelu") -> SlimDense:
        p = self.params_dict
        act = {"lrelu": lambda v: leaky_relu(v, p["lrelu_alpha"]),
               "sigmoid": nn.sigmoid, None: None}[activation]
        return SlimDense(features, name=name, activation=act,
                         use_batch_norm=True, bn_momentum=p["bn_decay"],
                         kernel_init=he_truncated,
                         dtype=jnp.dtype(p.get("compute_dtype", "float32")))

    def _spectral_stack(self, x: jax.Array, encoding: bool, train: bool) -> jax.Array:
        # reference nnmodel/HYPELCNNModel.py:146-164
        p = self.params_dict
        count = p["spectral_hierarchy_level"]
        filters = p["filter_count"]
        use_residual = p["use_residual"]
        for i in range(count):
            if encoding:
                feat = filters // (2 ** ((count - 1) - i))
                name = f"conv_enc_{i}"
            else:
                feat = filters // (2 ** i)
                name = f"conv_dec_{i}"
            nxt = self._conv(feat, 1, name)(x, train=train)
            if use_residual:
                nxt = nxt + scale_in_to_out(x, nxt, axis=-1)
            x = nxt
        return x

    def _spatial_blocks(self, x: jax.Array, train: bool) -> jax.Array:
        # reference nnmodel/HYPELCNNModel.py:127-143,166-183
        p = self.params_dict
        use_residual = p["use_residual"]
        level_filters = x.shape[-1] // 2
        from hypelcnn_tpu.models.layers import FusedMultiScaleLevel, multi_scale_level
        for index in range(p["spatial_hierarchy_level"]):
            feat = level_filters // (2 ** index)
            if feat == 0:
                raise ValueError(
                    f"filter_count={p['filter_count']} too small for "
                    f"spatial_hierarchy_level={p['spatial_hierarchy_level']} "
                    f"(level {index} would have 0 filters)")
            if p.get("fuse_level_convs", False):
                # one zero-padded k_max conv == the whole parallel-branch
                # level (see FusedMultiScaleLevel); numerically identical,
                # fewer layout copies on TPU
                nxt = FusedMultiScaleLevel(
                    feat, name=f"connector_{index}_fused",
                    activation=lambda v: leaky_relu(v, p["lrelu_alpha"]),
                    use_batch_norm=True, bn_momentum=p["bn_decay"],
                    kernel_init=he_truncated,
                    dtype=jnp.dtype(p.get("compute_dtype", "float32")))(
                        x, train=train)
            else:
                nxt = multi_scale_level(
                    x, feat,
                    lambda f, k, name, _i=index: self._conv(f, k, f"connector_{_i}_{name}"),
                    train=train)
            if use_residual:
                nxt = nxt + scale_in_to_out(x, nxt, axis=-1)
            nxt_conv = self._conv(nxt.shape[-1], 1, f"connector_conv_{index}")(nxt, train=train)
            if use_residual:
                nxt_conv = nxt_conv + nxt
            x = nxt_conv
        return x

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array | None = None,
                 train: bool = False) -> ModelOutput:
        p = self.params_dict
        # cast once at entry: the raw float32 patches would otherwise promote
        # every residual add (`x + scale_in_to_out(...)`) back to float32,
        # dragging f32 activation traffic through the whole network (profiled
        # at ~2x the step's HBM bytes under compute_dtype=bfloat16)
        net0 = x.astype(jnp.dtype(p.get("compute_dtype", "float32")))
        use_residual = p["use_residual"]

        net1 = self._spectral_stack(net0, encoding=True, train=train)
        if use_residual:
            net1 = net1 + scale_in_to_out(net0, net1, axis=-1)

        net2 = self._spectral_stack(net1, encoding=False, train=train)
        if use_residual:
            net2 = net2 + scale_in_to_out(net1, net2, axis=-1)

        net3 = self._spatial_blocks(net2, train=train)
        if use_residual:
            net3 = net3 + scale_in_to_out(net2, net3, axis=-1)

        net4 = net3.reshape(net3.shape[0], -1)

        # FC pyramid (reference :114-125)
        degradation = p["degradation_coeff"]
        flatten_size = net4.shape[1]
        fc_stage_count = math.floor(math.log(flatten_size / self.class_count, degradation))
        element_size = flatten_size
        net5 = net4
        for stage in range(fc_stage_count - 1):
            element_size = element_size // degradation
            net5 = self._dense(element_size, f"fc_{stage}")(net5, train=train)
            net5 = nn.Dropout(rate=p["drop_out_ratio"], deterministic=not train)(net5)

        net6 = self._dense(self.class_count, "fc_final", activation=None)(net5, train=train)
        net6 = net6.astype(jnp.float32)

        image_gen = None
        if train:
            g = self._dense(self.class_count * 3, "image_gen_net_1")(net6, train=train)
            g = self._dense(self.class_count * 9, "image_gen_net_2")(g, train=train)
            g = self._dense(self.class_count * 27, "image_gen_net_3")(g, train=train)
            image_size = net0.shape[1] * net0.shape[2] * net0.shape[3]
            image_gen = self._dense(image_size, "image_gen_net_4",
                                    activation="sigmoid")(g, train=train)
            image_gen = image_gen.astype(jnp.float32)

        return ModelOutput(
            y_conv=net6, image_output=image_gen, image_original=net0,
            histograms={"spectral_expansion": net1, "spectral_reduction": net2,
                        "spatial": net3, "classification": net5})


@register_model("HYPELCNNModel")
class HYPELCNNModel(NNModel):
    def default_params(self) -> Dict[str, Any]:
        return dict(DEFAULT_PARAMS)

    def create_module(self, class_count: int, algorithm_params: Dict[str, Any]):
        params = {**DEFAULT_PARAMS, **algorithm_params}
        return HYPELCNNModule(class_count=class_count, params_dict=params)

    def loss(self, output: ModelOutput, labels_onehot: jax.Array) -> jax.Array:
        ce = softmax_cross_entropy(output.y_conv, labels_onehot)
        if output.image_output is None:
            return ce
        return ce + reconstruction_loss(output)
