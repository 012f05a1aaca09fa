"""Optimizer + LR schedule construction from ``algorithm_params``.

Reproduces the reference's training optimizer semantics
(`common/common_nn_ops.py:208-240`): staircase exponential LR decay and a
choice of Adam or Momentum keyed by the same JSON values
(``"AdamOptimizer"`` or ``["MomentumOptimizer", momentum]``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import optax


def build_schedule(algorithm_params: Dict[str, Any]) -> optax.Schedule:
    return optax.exponential_decay(
        init_value=algorithm_params["learning_rate"],
        transition_steps=algorithm_params["learning_rate_decay_step"],
        decay_rate=algorithm_params["learning_rate_decay_factor"],
        staircase=True,
    )


def build_optimizer(algorithm_params: Dict[str, Any]
                    ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = build_schedule(algorithm_params)
    spec = algorithm_params.get("optimizer", "AdamOptimizer")
    if isinstance(spec, (tuple, list)):
        if spec[0] != "MomentumOptimizer":
            raise ValueError(f"unknown optimizer spec {spec!r}")
        tx = optax.sgd(schedule, momentum=float(spec[1]))
    elif spec == "AdamOptimizer":
        # TF AdamOptimizer defaults: b1=0.9, b2=0.999, eps=1e-8
        tx = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    else:
        raise ValueError(f"unknown optimizer spec {spec!r}")
    return tx, schedule
