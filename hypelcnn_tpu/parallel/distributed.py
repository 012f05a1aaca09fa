"""Multi-host (DCN) runtime support.

The reference's multi-worker support is vestigial TF1 parameter-server
flags that are never exercised (`gan/gan_train_for_shadow.py:70-78`,
SURVEY.md §2.8).  The rebuild makes multi-host first-class the JAX way:

- :func:`initialize_distributed` wires ``jax.distributed`` over DCN when
  the standard environment (coordinator address, process id/count) is
  present — single-process runs are untouched;
- the global mesh then spans all hosts' devices (data axis over DCN x ICI);
- :func:`is_chief` mirrors the reference's ``is_chief = task == 0``
  (`gan/gan_train_for_shadow.py:300`) for chief-only checkpoint/summary
  writing.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when multi-host env is present.

    Returns True when running multi-host.  Arguments default to the standard
    environment variables (JAX also auto-detects on Cloud TPU pods).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def _env_int(name: str) -> Optional[int]:
    value = os.environ.get(name)
    return int(value) if value is not None else None


def is_chief() -> bool:
    """Whether this process should perform checkpoint/summary I/O."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> int:
    """Per-process batch share for host-side data feeding."""
    count = jax.process_count()
    if global_batch % count != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"process count {count}")
    return global_batch // count
