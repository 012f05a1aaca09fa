"""Training state pytree: explicit replacement for TF1 graph variables.

Everything the reference's selective ``Saver`` tracked — nn_core variables,
global step, optimizer slots (`classify/monitored_session_runner.py:164-168`)
— is one explicit pytree here.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), dtype=jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params))


def variables_of(state: TrainState) -> Dict[str, Any]:
    """flax variable dict for module.apply."""
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v
