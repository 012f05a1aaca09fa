"""RNG discipline for the framework.

The reference mixes three RNG sources: a graph-level TF seed 1234
(`classify/monitored_session_runner.py:11-13`), unseeded numpy RNG in
samplers/splitters, and `random_state=0` for the test split
(`common/common_nn_ops.py:539`).  The rebuild centralizes on JAX's splittable
keys: one root key per run, folded per purpose and per step, so every jitted
function receives an explicit key and device-side randomness is reproducible
and shard-friendly (fold in `jax.lax.axis_index` for per-device streams).
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np

DEFAULT_SEED = 1234  # reference: classify/monitored_session_runner.py:11-13


def set_run_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    """Return the run's root PRNG key and seed numpy for host-side sampling."""
    np.random.seed(seed)
    return jax.random.key(seed)


def _purpose_to_int(purpose: str) -> int:
    return int.from_bytes(hashlib.blake2s(purpose.encode(), digest_size=4).digest(), "little")


class RngPool:
    """Deterministic per-purpose key derivation.

    ``pool.key("augment", step)`` always yields the same key for the same
    (seed, purpose, step) triple regardless of call order — unlike sequential
    splitting, this keeps randomness stable when pipeline stages are added
    or removed.
    """

    def __init__(self, seed: int = DEFAULT_SEED):
        self._root = jax.random.key(seed)
        self.seed = seed

    def key(self, purpose: str, step: int = 0) -> jax.Array:
        k = jax.random.fold_in(self._root, _purpose_to_int(purpose))
        return jax.random.fold_in(k, step)

    def numpy_rng(self, purpose: str) -> np.random.Generator:
        return np.random.default_rng(np.uint32(self.seed) ^ np.uint32(_purpose_to_int(purpose)))
