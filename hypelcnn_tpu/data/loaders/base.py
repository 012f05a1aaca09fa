"""Dataset loader protocol.

Mirrors the reference `loader/DataLoader.py:20-47` surface (``load_data``,
``load_samples``, ``load_shadow_map``, ``get_class_count``,
``get_model_base_dir``, ``get_samples_color_list``, ``get_band_measurements``)
with one deliberate inversion: the reference's loaders *construct* GAN shadow
augmenters inside ``load_data`` (an upward layer dependency,
`loader/GRSS2013DataLoader.py:26-34`).  Here loaders only *declare* their
shadow-generator checkpoints via :meth:`get_shadow_checkpoints`, and the GAN
layer injects augmenters (see :mod:`hypelcnn_tpu.gan.shadow_ops`).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from enum import Enum
from typing import Dict, Optional, Tuple

import numpy as np


@dataclass
class SampleSet:
    """Train/validation/test target arrays of (x, y, class) rows
    (reference `loader/DataLoader.py:5-10`)."""
    training_targets: np.ndarray
    test_targets: np.ndarray
    validation_targets: np.ndarray


class LoadingMode(Enum):
    ORIGINAL = ""
    SHADOWED = "shadowed"
    DESHADOWED = "deshadowed"
    MIXED = "mixed"


class DataLoader(ABC):
    @abstractmethod
    def load_data(self, neighborhood: int, normalize: bool):
        ...

    @abstractmethod
    def load_samples(self, train_data_ratio: float, test_data_ratio: float) -> SampleSet:
        ...

    @abstractmethod
    def load_shadow_map(self, neighborhood: int, data_set) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        ...

    @abstractmethod
    def get_class_count(self) -> range:
        ...

    @abstractmethod
    def get_model_base_dir(self) -> str:
        ...

    @abstractmethod
    def get_samples_color_list(self) -> np.ndarray:
        ...

    @abstractmethod
    def get_band_measurements(self) -> np.ndarray:
        ...

    def get_shadow_checkpoints(self) -> Dict[str, str]:
        """name -> checkpoint path (relative to model base dir) for pretrained
        shadow generators; empty when the dataset has none."""
        return {}


def calculate_shadow_ratio(casi: np.ndarray, shadow_map: np.ndarray,
                           shadow_map_inverse: np.ndarray) -> np.ndarray:
    """Per-band mean(lit) / mean(shadow) ratio (reference
    `common/common_nn_ops.py:473-483`)."""
    shadow_mask = shadow_map != 0
    lit_mask = shadow_map_inverse != 0
    flat = casi.reshape(-1, casi.shape[2])
    sh = flat[shadow_mask.reshape(-1)]
    lit = flat[lit_mask.reshape(-1)]
    ratio = lit.mean(axis=0) / sh.mean(axis=0)
    return np.asarray(ratio, dtype=np.float32)


def load_shadow_map_common(data_set, neighborhood: int, shadow_file_name: str):
    """Load + pad a shadow map and compute the band ratio against the scene
    (reference `common/common_nn_ops.py:567-571`)."""
    from hypelcnn_tpu.utils.tiff_io import imread
    shadow_map = np.pad(imread(shadow_file_name), neighborhood, mode="symmetric")
    shadow_ratio = None
    if data_set is not None:
        shadow_ratio = calculate_shadow_ratio(
            data_set.casi, shadow_map, np.logical_not(shadow_map).astype(int))
    return shadow_map, shadow_ratio
