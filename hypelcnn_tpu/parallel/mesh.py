"""Device mesh and sharding layout for the framework.

The reference has no real parallelism: a single device is selected via a
``--device`` flag (`classify/train_for_classification.py:51-55`) and the only
device movement is `prefetch_to_device` (`common/common_nn_ops.py:200`);
multi-worker support is vestigial flags (`gan/gan_train_for_shadow.py:70-78`).

The rebuild makes scaling first-class with a single mesh abstraction:

- axis ``"data"``: batch (data-parallel) sharding for training and the
  full-scene inference sweep (this domain's "context parallelism" — the
  scene pixel axis is sharded across chips and results gathered over ICI);
- axis ``"model"``: optional tensor-parallel axis for wide conv blocks
  (HYPELCNN filter_count 480-1200); degenerate (size 1) by default since
  the models are small.

Gradient/metric reductions ride XLA collectives (``psum``) inserted by the
compiler from sharding annotations — no hand-written communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallel`` must divide the device count; the data axis gets the
    rest.  With one device this yields a 1x1 mesh, making every sharding
    annotation a no-op — single-chip and multi-chip run the same code.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"model_parallel={model_parallel} does not divide device count {n}")
    dev_array = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard a scene's leading spatial (row) dimension over the data axis.

    Used to keep a large scene resident in HBM across chips for full-scene
    inference (reference's pixel-at-a-time loop,
    `common/common_nn_ops.py:313-327`, becomes an on-device sharded sweep).
    """
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree onto the mesh, sharded along axis 0."""
    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(_put, tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_params_for_tp(params, mesh: Mesh, min_width: int = 64):
    """Tensor-parallel placement: shard wide kernels' output-channel dim over
    the ``model`` axis.

    The model families' width knob is ``filter_count`` (HYPELCNN sweeps
    480-1200); sharding those kernels' last dim splits each 1x1-conv matmul
    column-wise across chips, with XLA inserting the activation collectives.
    Kernels narrower than ``min_width`` (or not divisible by the axis size)
    stay replicated.  Returns the params pytree placed accordingly — a
    no-op layout on a 1-wide model axis.
    """
    tp = mesh.shape[MODEL_AXIS]

    def place(path, x):
        is_kernel = path and getattr(path[-1], "key", "") == "kernel"
        if tp > 1 and is_kernel and x.ndim >= 2 and x.shape[-1] >= min_width \
                and x.shape[-1] % tp == 0:
            spec = P(*([None] * (x.ndim - 1)), MODEL_AXIS)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
