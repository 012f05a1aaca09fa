"""Classic-ML baselines: RandomForest / SVM on flattened patches.

Parity with reference `classify/classic_ml_trainer.py:20-161`: same flags
(``--hyperparamopt``, ``--fullscene``, ``--split_count``), same estimator
configuration, same CSV/txt/json metric dumps.  The full-scene path is
implemented working (the reference calls a nonexistent
``GeneratorImporter.create_all_scene_target_array`` at `:87` — latent bug);
here the scene sweep batches pixels through the fitted estimator.
"""

from __future__ import annotations

import argparse
import os
import time
from math import sqrt

import numpy as np
from sklearn.ensemble import RandomForestClassifier
from sklearn.metrics import (
    accuracy_score,
    balanced_accuracy_score,
    cohen_kappa_score,
    confusion_matrix,
)
from sklearn.model_selection import GridSearchCV, StratifiedShuffleSplit
from sklearn.svm import SVC

from hypelcnn_tpu.core.config import (
    add_parse_cmds_for_loaders,
    add_parse_cmds_for_loggers,
    add_parse_cmds_for_trainers,
    type_ensure_strtobool,
)
from hypelcnn_tpu.core.registry import get_loader_from_name
from hypelcnn_tpu.infer.scene_inference import create_colored_image
from hypelcnn_tpu.utils.tiff_io import imwrite


def add_parse_cmds_for_app(parser) -> None:
    parser.add_argument("--hyperparamopt", nargs="?", const=True, type=type_ensure_strtobool,
                        default=False, help="If true, performs hyper parameter optimization.")
    parser.add_argument("--fullscene", nargs="?", const=True, type=type_ensure_strtobool,
                        default=False, help="If true, performs full scene classification.")
    parser.add_argument("--split_count", nargs="?", type=int, default=1, help="Split count")


def flatten_data(data: np.ndarray) -> np.ndarray:
    return data.reshape(data.shape[0], -1)


def _gather_split(scene, targets: np.ndarray):
    from hypelcnn_tpu.data.importers import _gather_all_host
    data = _gather_all_host(scene, targets)
    return flatten_data(data), targets[:, 2].astype(int)


def print_output(algorithm_params, average_accuracy, conf_matrix, kappa,
                 overall_accuracy, index, name, base_log_path) -> None:
    print("OA:%5.5f" % overall_accuracy)
    print("AA:%5.5f" % average_accuracy)
    print("KAPPA:%5.5f" % kappa)
    print("Confusion Matrix:")
    print(conf_matrix)
    file_id = f"{name}_run{index}"
    os.makedirs(base_log_path, exist_ok=True)
    np.savetxt(os.path.join(base_log_path, f"confusion_matrix_{file_id}.csv"),
               conf_matrix, fmt="%d", delimiter=",")
    with open(os.path.join(base_log_path, f"metrics_{file_id}.txt"), "w") as fid:
        print("OA,AA,KAPPA", file=fid)
        print("%.6f,%.6f,%.6f" % (overall_accuracy, average_accuracy, kappa), file=fid)
    with open(os.path.join(base_log_path, f"params_{file_id}.json"), "w") as fid:
        print(algorithm_params, file=fid)


def perform_hyperparamopt(flattened_training_data, labels) -> None:
    c_range = np.logspace(-2, 10, 13)
    gamma_range = np.logspace(-9, 3, 13)
    param_grid = dict(gamma=gamma_range, C=c_range)
    cv = StratifiedShuffleSplit(n_splits=2, test_size=0.1, random_state=42)
    grid = GridSearchCV(SVC(), param_grid=param_grid, cv=cv, n_jobs=16, verbose=1)
    grid.fit(flattened_training_data, labels)
    print("The best parameters are %s with a score of %0.2f"
          % (grid.best_params_, grid.best_score_))


def perform_full_scene_classification(data_path, loader_name, neighborhood, estimator,
                                      batch_size, output_path=".") -> None:
    loader = get_loader_from_name(loader_name, data_path)
    data_set = loader.load_data(neighborhood, False)
    scene_shape = data_set.get_scene_shape()
    h, w = scene_shape
    prediction = np.empty([h * w], dtype=np.uint8)
    shape = data_set.get_data_shape()
    idx = 0
    batch = np.empty([batch_size, *shape], dtype=np.float32)
    fill = 0
    for row in range(h):
        for col in range(w):
            batch[fill] = data_set.get_data_point(col, row)
            fill += 1
            idx += 1
            if fill == batch_size or idx == h * w:
                prediction[idx - fill:idx] = estimator.predict(flatten_data(batch[:fill]))
                fill = 0
    scene_as_image = prediction.reshape(scene_shape)
    imwrite(os.path.join(output_path, "result_raw.tif"), scene_as_image)
    imwrite(os.path.join(output_path, "result_colorized.tif"),
            create_colored_image(scene_as_image, loader.get_samples_color_list()))


def main(argv=None) -> None:
    from hypelcnn_tpu.core.platform import honor_platform_request
    honor_platform_request()  # JAX_PLATFORMS env, authoritatively
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loaders(parser)
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_app(parser)
    add_parse_cmds_for_trainers(parser)
    flags, _ = parser.parse_known_args(argv)

    for run_index in range(flags.split_count):
        print("Starting episode#%d" % run_index)
        loader = get_loader_from_name(flags.loader_name, flags.path)
        scene = loader.load_data(flags.neighborhood, False)
        sample_set = loader.load_samples(0.1, 0)

        train_x, train_y = _gather_split(scene, sample_set.training_targets)
        val_x, val_y = _gather_split(scene, sample_set.validation_targets)

        start_time = time.time()
        estimator = RandomForestClassifier(n_estimators=50, n_jobs=8,
                                           max_features=int(2 * sqrt(144)), verbose=False)
        estimator.fit(train_x, train_y)
        print("Completed training(%.3f sec)" % (time.time() - start_time))
        predicted = estimator.predict(val_x)

        overall_accuracy = accuracy_score(val_y, predicted)
        average_accuracy = balanced_accuracy_score(val_y, predicted)
        kappa = cohen_kappa_score(val_y, predicted)
        conf_matrix = confusion_matrix(val_y, predicted)
        print_output(estimator.get_params(), average_accuracy, conf_matrix, kappa,
                     overall_accuracy, run_index, flags.loader_name, flags.base_log_path)

        if flags.hyperparamopt:
            perform_hyperparamopt(train_x, train_y)
        if flags.fullscene:
            perform_full_scene_classification(flags.path, flags.loader_name,
                                              flags.neighborhood, estimator,
                                              flags.batch_size, flags.output_path)


if __name__ == "__main__":
    main()
