"""Short training runs for every model family (loss decreases, finite)."""

import numpy as np
import pytest

from hypelcnn_tpu.core.registry import get_importer_from_name, get_model_from_name
from hypelcnn_tpu.train.trainer import ClassificationTrainer

CASES = {
    "HYPELCNNModel": {"filter_count": 32, "batch_size": 8},
    "DUALCNNModel": {"filter_count": 32, "batch_size": 8, "hs_lidar_diff": 1},
    "CONCNNModel": {"filter_count": 8, "batch_size": 8},
    "CAPModel": {"feature_count": 16, "primary_capsule_count": 4, "batch_size": 8},
}


@pytest.mark.parametrize("model_name", list(CASES))
def test_short_training_run(model_name):
    np.random.seed(0)
    importer = get_importer_from_name("GeneratorImporter")
    data = importer.read_data_set(
        "SyntheticDataLoader", "synthetic://?h=40&w=48&bands=10&classes=4&seed=5",
        train_ratio=0.5, test_ratio=0.1, neighborhood=2)
    model = get_model_from_name(model_name)
    params = {**model.default_params(), **CASES[model_name]}
    trainer = ClassificationTrainer(
        model=model, class_count=data.class_count, algorithm_params=params,
        scene=data.scene, sample_set=data.sample_set,
        sources=data.sources, data_shape=data.data_shape, test_cadence=10 ** 9)
    result = trainer.fit(num_steps=12, batch_size=params["batch_size"], log_every=12)
    assert np.isfinite(result.loss), f"{model_name} loss not finite"
    assert result.test_accuracy >= 0.0
