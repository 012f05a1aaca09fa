"""DUALCNN — two-branch HSI/LiDAR fusion CNN.

Parity with reference `nnmodel/DUALCNNModel.py:9-104`: input channels split
into HSI (all but last) and LiDAR (last); the HSI patch is cropped by
``hs_lidar_diff`` on each spatial side when the patch is larger than 1x1; an
8-level multi-scale HSI branch and a 3-level LiDAR branch (filters 2/4/8)
are flattened, concatenated and fed to a 4-stage FC head with dropout.
No batch norm (the reference's is commented out); leaky-relu activations;
xavier init (tf-slim default); softmax CE loss.

Quirk preserved: the reference passes ``drop_out_ratio`` as tf-slim's
*keep_prob* (`nnmodel/DUALCNNModel.py:49-53`), so the drop rate here is
``1 - drop_out_ratio``.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypelcnn_tpu.core.registry import register_model
from hypelcnn_tpu.models.base import ModelOutput, NNModel, softmax_cross_entropy
from hypelcnn_tpu.models.layers import SlimConv, SlimDense
from hypelcnn_tpu.ops.nn import leaky_relu

DEFAULT_PARAMS: Dict[str, Any] = {
    # matches nnmodel/modelconfigs/alg_param_dualcnn.json
    "batch_size": 48,
    "drop_out_ratio": 0.70,
    "learning_rate": 3e-4,
    "learning_rate_decay_factor": 0.96,
    "learning_rate_decay_step": 350,
    "lrelu_alpha": 0.18,
    "filter_count": 480,
    "optimizer": "AdamOptimizer",
    "hs_lidar_diff": 1,
    "l2regularizer_scale": 1e-5,
    "compute_dtype": "float32",
}


class DUALCNNModule(nn.Module):
    class_count: int
    params_dict: Dict[str, Any]

    def _conv(self, features: int, kernel: int, name: str) -> SlimConv:
        p = self.params_dict
        return SlimConv(features, kernel, name=name,
                        activation=lambda v: leaky_relu(v, p["lrelu_alpha"]),
                        dtype=jnp.dtype(p.get("compute_dtype", "float32")))

    def _level(self, x: jax.Array, features: int, name: str, train: bool) -> jax.Array:
        from hypelcnn_tpu.models.layers import FusedMultiScaleLevel, multi_scale_level
        p = self.params_dict
        if p.get("fuse_level_convs", False):
            from hypelcnn_tpu.models.layers import xavier
            return FusedMultiScaleLevel(
                features, name=f"{name}_fused",
                activation=lambda v: leaky_relu(v, p["lrelu_alpha"]),
                use_batch_norm=False, kernel_init=xavier,
                dtype=jnp.dtype(p.get("compute_dtype", "float32")))(
                    x, train=train)
        return multi_scale_level(
            x, features,
            lambda f, k, conv_name, _n=name: self._conv(f, k, f"{_n}_{conv_name}"),
            train=train)

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array | None = None,
                 train: bool = False) -> ModelOutput:
        p = self.params_dict
        hsi, lidar = x[..., :-1], x[..., -1:]

        diff = p["hs_lidar_diff"]
        if (hsi.shape[1] > 1 or hsi.shape[2] > 1) and diff > 0:
            hsi = hsi[:, diff:-diff, diff:-diff, :]

        # HSI branch: 8 levels (reference :57-85)
        fc = p["filter_count"]
        net = hsi
        for i, feat in enumerate([fc // 4, fc // 2, fc, fc // 2, fc // 4, fc // 8,
                                  fc // 16, fc // 32], start=1):
            net = self._level(net, feat, f"level{i}", train)
            net = self._conv(net.shape[-1], 1, f"connector_conv{i}")(net, train=train)
        hs_net = net

        # LiDAR branch: 3 levels (reference :35-43)
        net = lidar
        for i, feat in enumerate([2, 4, 8], start=1):
            net = self._level(net, feat, f"lidar_level{i}", train)
            net = self._conv(net.shape[-1], 1, f"lidar_connector_conv{i}")(net, train=train)
        lidar_net = net

        merged = jnp.concatenate(
            [hs_net.reshape(hs_net.shape[0], -1), lidar_net.reshape(lidar_net.shape[0], -1)],
            axis=1)

        # FC head (reference :45-55); drop rate = 1 - drop_out_ratio (keep_prob quirk)
        drop_rate = 1.0 - p["drop_out_ratio"]
        act = lambda v: leaky_relu(v, p["lrelu_alpha"])
        net = merged
        for i, feat in enumerate([self.class_count * 9, self.class_count * 6,
                                  self.class_count * 3], start=1):
            net = SlimDense(feat, name=f"fc{i}", activation=act)(net, train=train)
            net = nn.Dropout(rate=drop_rate, deterministic=not train)(net)
        logits = SlimDense(self.class_count, name="fc4", activation=None)(net, train=train)
        logits = logits.astype(jnp.float32)

        return ModelOutput(y_conv=logits, image_output=None, image_original=None, histograms={})


@register_model("DUALCNNModel")
class DUALCNNModel(NNModel):
    def default_params(self) -> Dict[str, Any]:
        return dict(DEFAULT_PARAMS)

    def create_module(self, class_count: int, algorithm_params: Dict[str, Any]):
        params = {**DEFAULT_PARAMS, **algorithm_params}
        return DUALCNNModule(class_count=class_count, params_dict=params)

    def loss(self, output: ModelOutput, labels_onehot: jax.Array) -> jax.Array:
        return softmax_cross_entropy(output.y_conv, labels_onehot)
