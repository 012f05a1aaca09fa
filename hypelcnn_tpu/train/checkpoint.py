"""Orbax checkpointing of train-state pytrees.

Replaces the reference's selective ``tf.train.Saver`` over the ``nn_core`` /
``global_step`` / ``training_optimizer`` scopes with ``max_to_keep=20``
(`classify/monitored_session_runner.py:164-168`) and
``MonitoredTrainingSession`` auto-resume (`:173-180`).  A checkpoint here is
the whole :class:`~hypelcnn_tpu.train.state.TrainState` pytree; "restore a
frozen GAN generator" is just loading a second params pytree
(cf. the reference's ready-op override dance, `:131-138`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

MAX_TO_KEEP = 20  # reference classify/monitored_session_runner.py:167


def _manager(log_dir: str, max_to_keep: int = MAX_TO_KEEP) -> ocp.CheckpointManager:
    path = os.path.abspath(os.path.join(log_dir, "checkpoints"))
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint(log_dir: str, state, max_to_keep: int = MAX_TO_KEEP) -> None:
    mgr = _manager(log_dir, max_to_keep)
    step = int(state.step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(log_dir: str, template) -> Optional[object]:
    """Restore the latest checkpoint, or None when none exists (auto-resume)."""
    path = os.path.abspath(os.path.join(log_dir, "checkpoints"))
    if not os.path.isdir(path):
        return None
    mgr = ocp.CheckpointManager(path)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored


def save_params_pytree(path: str, params) -> None:
    """Standalone params save (e.g. a trained GAN generator for reuse as a
    frozen augmenter — reference `loader/GRSS2013DataLoader.py:29-33`).

    ``force=True``: log dirs are deterministic functions of the flags, so a
    re-run with identical flags targets the same path — tf.train.Saver
    overwrote, and orbax must too or the second run dies at its first
    checkpoint (after a full training cadence)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()
    ckpt.close()


def restore_params_pytree(path: str, template):
    ckpt = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    restored = ckpt.restore(os.path.abspath(path), abstract)
    ckpt.close()
    return restored
