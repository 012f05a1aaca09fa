"""Streaming classification metrics as device-side accumulators.

The reference builds TF metric variables with update/reset ops and drains an
iterator to OutOfRange to read OA, mean-per-class accuracy, Cohen's kappa
and an accumulated confusion matrix (`common/common_nn_ops.py:243-310`).

The rebuild keeps ONE accumulator — the confusion matrix — updated by a
jitted scatter-add inside the eval step; every other metric is a pure
function of it, computed once at drain time.  Under a sharded eval the
per-device partial confusions are combined with a ``psum`` (the metric math
is reduction-friendly by construction).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MetricsResult(NamedTuple):
    overall_accuracy: float
    mean_per_class_accuracy: float
    kappa: float
    confusion: np.ndarray
    class_recall: np.ndarray
    class_precision: np.ndarray


def confusion_update(confusion: jax.Array, labels: jax.Array, predictions: jax.Array,
                     mask: jax.Array | None = None) -> jax.Array:
    """Accumulate a batch into a [C, C] confusion matrix (rows = truth).

    ``mask`` zeroes out padding rows so eval batches can be shape-static.
    """
    num_classes = confusion.shape[0]
    weights = jnp.ones_like(labels, dtype=confusion.dtype) if mask is None \
        else mask.astype(confusion.dtype)
    flat_idx = labels * num_classes + predictions
    batch_conf = jnp.zeros((num_classes * num_classes,), dtype=confusion.dtype
                           ).at[flat_idx].add(weights)
    return confusion + batch_conf.reshape(num_classes, num_classes)


def compute_metrics(confusion: np.ndarray) -> MetricsResult:
    """OA / AA / Cohen's kappa / per-class recall+precision from a confusion
    matrix — the same definitions the reference reads from its TF metric ops
    (`common/common_nn_ops.py:243-310`) and recomputes offline
    (`utilities/stat_extractor.py:24-62`)."""
    confusion = np.asarray(confusion, dtype=np.float64)
    total = confusion.sum()
    if total == 0:
        z = np.zeros(confusion.shape[0])
        return MetricsResult(0.0, 0.0, 0.0, confusion.astype(np.int64), z, z)
    diag = np.diag(confusion)
    overall = float(diag.sum() / total)

    row_sums = confusion.sum(axis=1)
    col_sums = confusion.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        recall = np.where(row_sums > 0, diag / row_sums, 0.0)
        precision = np.where(col_sums > 0, diag / col_sums, 0.0)
    # tf.metrics.mean_per_class_accuracy semantics (the reference's AA,
    # `common/common_nn_ops.py:252-253`): the mean runs over ALL classes,
    # absent classes contributing 0 — unlike sklearn's balanced accuracy,
    # which averages only present classes
    mean_per_class = float(recall.mean())

    expected = float((row_sums * col_sums).sum() / (total * total))
    kappa = float((overall - expected) / (1.0 - expected)) if expected < 1.0 else 0.0

    return MetricsResult(overall, mean_per_class, kappa,
                         confusion.astype(np.int64), recall, precision)


def calculate_class_accuracies_using_confusion(confusion: np.ndarray, class_range
                                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-compatible helper (`common/common_nn_ops.py:280-292`)."""
    res = compute_metrics(confusion)
    idx = np.asarray(list(class_range))
    return res.class_recall[idx], res.class_precision[idx]
