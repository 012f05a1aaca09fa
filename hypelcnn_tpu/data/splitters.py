"""Target extraction and train/val/test splitting.

Same semantics as the reference splitters (`common/common_nn_ops.py:486-543`):
- targets read from a ground-truth image as (x, y, class) rows,
- stratified ratio split for train/validation,
- per-class fixed-count split with a 90% overflow fallback,
- test split carved from the training set with fixed ``random_state=0`` so
  the test set is stable across runs.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np
from sklearn.model_selection import StratifiedShuffleSplit


def read_targets_from_image(targets: np.ndarray, class_range: Iterable[int]) -> np.ndarray:
    """GT image -> ``[N, 3]`` rows of (x, y, class_id).

    Reference `common/common_nn_ops.py:486-494`.
    """
    result = np.array([], dtype=int).reshape(0, 3)
    for target_index in class_range:
        ys, xs = np.where(targets == target_index)
        locs = np.stack([xs.astype(int), ys.astype(int)], axis=1)
        cls = np.full((len(locs), 1), target_index)
        result = np.vstack([result, np.hstack([locs, cls])])
    return result


def shuffle_training_data_using_ratio(result: np.ndarray, train_data_ratio: float
                                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Stratified (train, validation) ratio split (reference `:497-504`)."""
    shuffler = StratifiedShuffleSplit(n_splits=1, train_size=train_data_ratio)
    train_set = validation_set = None
    for train_index, test_index in shuffler.split(result[:, 0:1], result[:, 2]):
        validation_set = result[test_index]
        train_set = result[train_index]
    return train_set, validation_set


def shuffle_training_data_using_size(class_range: Iterable[int], result: np.ndarray,
                                     train_data_size: int,
                                     validation_size: Optional[int]
                                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class fixed-count split; classes with fewer samples than the quota
    contribute 90% of what they have (reference `:507-532`)."""
    sample_ids = result[:, 2]
    train_set = np.empty([0, result.shape[1]], dtype=int)
    validation_set = np.empty([0, result.shape[1]], dtype=int)
    for sample_class in class_range:
        ids_for_class = np.where(sample_ids == sample_class)[0]
        count = ids_for_class.shape[0]
        if count == 0:
            continue
        if count < train_data_size:
            train_index = np.random.choice(count, (count * 9) // 10, replace=False)
        else:
            train_index = np.random.choice(count, train_data_size, replace=False)
        mask = np.ones(count, dtype=bool)
        mask[train_index] = False
        validation_index = np.nonzero(mask)[0]
        if validation_size is not None:
            # reference quirk PRESERVED (`common_nn_ops.py:524-526`): the
            # clamp REASSIGNS validation_size, so one small class permanently
            # shrinks the per-class quota for every LATER class in iteration
            # order — a local `min` would "fix" the composition silently
            validation_size = min(validation_size, validation_index.shape[0])
            validation_index = validation_index[
                np.random.choice(validation_index.shape[0], validation_size,
                                 replace=False)]
        train_set = np.vstack([train_set, result[ids_for_class[train_index], :]])
        validation_set = np.vstack([validation_set, result[ids_for_class[validation_index], :]])
    return train_set, validation_set


def shuffle_test_data_using_ratio(train_set: np.ndarray, test_data_ratio: float
                                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Carve a stable test set out of training (random_state=0, reference `:535-543`)."""
    test_set = np.empty([0, train_set.shape[1]])
    if test_data_ratio > 0:
        shuffler = StratifiedShuffleSplit(n_splits=1, test_size=test_data_ratio, random_state=0)
        for train_index, test_index in shuffler.split(train_set[:, 0:1], train_set[:, 2]):
            test_set = train_set[test_index]
            train_set = train_set[train_index]
    return test_set, train_set
