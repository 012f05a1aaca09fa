"""Model-plugin protocol.

Replaces the reference's ``NNModel`` ABC + TF template machinery
(`nnmodel/NNModel.py:4-12`, ``ModelInputParams``/``ModelOutputTensors``
`common/common_nn_ops.py:117-136`) with a functional contract:

- :meth:`NNModel.create_module` returns a flax module whose ``__call__``
  takes ``(x, labels, train)`` and returns a :class:`ModelOutput`;
- :meth:`NNModel.loss` maps (output, one-hot labels) to a per-example loss
  vector, like the reference's ``get_loss_func``.

One module instance serves the train / test / validation branches (the
reference needed ``tf.make_template`` for that; in flax, params are an
explicit pytree so sharing is trivial).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, NamedTuple, Optional

import jax


class ModelOutput(NamedTuple):
    y_conv: jax.Array                       # logits [B, classes]
    image_output: Optional[jax.Array]       # reconstruction head (train only)
    image_original: Optional[jax.Array]     # flattened original input
    histograms: Dict[str, jax.Array]        # activation-analysis taps


class NNModel(ABC):
    """A model family plugin (HYPELCNN / DUALCNN / CONCNN / CAP)."""

    @abstractmethod
    def create_module(self, class_count: int, algorithm_params: Dict[str, Any]):
        ...

    @abstractmethod
    def loss(self, output: ModelOutput, labels_onehot: jax.Array) -> jax.Array:
        """Per-example loss vector [B] (mean-reduced by the trainer)."""
        ...

    def default_params(self) -> Dict[str, Any]:
        return {}


def softmax_cross_entropy(logits: jax.Array, labels_onehot: jax.Array) -> jax.Array:
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -(labels_onehot * log_probs).sum(axis=-1)


def reconstruction_loss(output: ModelOutput) -> jax.Array:
    """Scalar MSE between the reconstruction head and the flattened input
    (reference `nnmodel/HYPELCNNModel.py:101-112`)."""
    import jax.numpy as jnp
    original = output.image_original.reshape(output.image_original.shape[0], -1)
    return jnp.mean(jnp.square(output.image_output - original))
