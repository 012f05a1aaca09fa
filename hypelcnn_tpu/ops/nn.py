"""Small neural-net ops shared across model families."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array, alpha: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=alpha)


def scale_in_to_out(input_data: jax.Array, output_data: jax.Array, axis: int = -1) -> jax.Array:
    """Match ``input_data``'s channel count to ``output_data``'s so a residual
    add is shape-legal.

    Semantics follow the reference's shape-matcher
    (`common/common_nn_ops.py:546-564`): when the output channel count is an
    integer multiple of the input's, channels are repeated; otherwise the
    nearest input channel is gathered for each output position.  All index
    math is static (shapes are known at trace time) so XLA sees a plain
    gather/repeat.
    """
    in_ch = input_data.shape[axis]
    out_ch = output_data.shape[axis]
    if in_ch == out_ch:
        return input_data
    if out_ch % in_ch == 0:
        return jnp.repeat(input_data, out_ch // in_ch, axis=axis)
    scale_ratio = in_ch / out_ch
    idx = [min(round(i * scale_ratio), in_ch - 1) for i in range(out_ch)]
    return jnp.take(input_data, jnp.array(idx), axis=axis)


def local_response_normalization(x: jax.Array, depth_radius: int = 5, bias: float = 1.0,
                                 alpha: float = 1.0, beta: float = 0.5) -> jax.Array:
    """LRN over the channel (last) axis, TF-default semantics.

    Used by the CONCNN context model (reference `nnmodel/CONCNNModel.py:37,41`).
    Implemented as a channel-axis windowed sum of squares via a cumulative-sum
    trick: static shapes, fuses into neighboring elementwise ops.
    """
    sq = jnp.square(x)
    # windowed sum over channels: pad then cumsum difference
    pad = [(0, 0)] * (x.ndim - 1) + [(depth_radius + 1, depth_radius)]
    cs = jnp.cumsum(jnp.pad(sq, pad), axis=-1)
    win = 2 * depth_radius + 1
    window_sums = jax.lax.slice_in_dim(cs, win, cs.shape[-1], axis=-1) - \
        jax.lax.slice_in_dim(cs, 0, cs.shape[-1] - win, axis=-1)
    return x / jnp.power(bias + alpha * window_sums, beta)


def squash(s: jax.Array, axis: int = -1, eps: float = 1e-9) -> jax.Array:
    """Capsule squash nonlinearity (reference `nnmodel/CAPModel.py:104-106`).

    NOTE the reference uses reduce_MEAN of squares (not sum) for the norm
    term — preserved here for numerical parity.
    """
    norm_sq = jnp.mean(jnp.square(s), axis=axis, keepdims=True)
    return norm_sq * s / ((1.0 + norm_sq) * jnp.sqrt(norm_sq + eps))
