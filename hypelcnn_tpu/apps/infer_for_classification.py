"""Classification inference CLI.

Flag/behavior parity with reference `classify/infer_for_classification.py`:
``--domain`` all / sample / gt, checkpoint restored from ``--base_log_path``,
writes ``result_raw.tif`` + ``result_colorized.tif`` to ``--output_path``.

The full-scene path replaces the reference's ~665k-pixel host feed loop
(`common/common_nn_ops.py:313-327`) with the on-device sharded sweep in
:mod:`hypelcnn_tpu.infer.scene_inference`.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from hypelcnn_tpu.core.config import (
    add_parse_cmds_for_importers,
    add_parse_cmds_for_loaders,
    add_parse_cmds_for_loggers,
    add_parse_cmds_for_models,
    add_parse_cmds_for_trainers,
)
from hypelcnn_tpu.core.registry import get_loader_from_name, get_model_from_name
from hypelcnn_tpu.infer.scene_inference import (
    create_colored_image,
    create_target_image_via_samples,
    predict_full_scene,
    predict_targets,
)
from hypelcnn_tpu.utils.tiff_io import imwrite


def add_parse_cmds_for_app(parser) -> None:
    parser.add_argument("--domain", nargs="?", type=str, default="all",
                        help="Conversion domain for inferencing. It can be all(all scene "
                             "inference), sample(sample based inference) or gt(ground truth)")


def gt_process(flags):
    """Rasterize the ground-truth sample set (reference `:76-83`)."""
    loader = get_loader_from_name(flags.loader_name, flags.path)
    sample_set = loader.load_samples(0.1, 0)
    data_set = loader.load_data(0, False)
    scene_as_image = create_target_image_via_samples(sample_set, data_set.get_scene_shape())
    return scene_as_image, loader.get_samples_color_list()


def _restore_variables(flags, module, trainer):
    """Restore nn_core params from the training log dir's latest checkpoint."""
    state = trainer.restore_checkpoint()
    if state is None:
        raise IOError(f"No checkpoint found under {flags.base_log_path}/checkpoints")
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return variables


def prediction_process(flags):
    loader = get_loader_from_name(flags.loader_name, flags.path)
    scene = loader.load_data(flags.neighborhood, True)
    sample_set = loader.load_samples(0.1, 0)
    class_count = loader.get_class_count().stop
    color_list = loader.get_samples_color_list()

    if flags.algorithm_param_path is not None:
        with open(flags.algorithm_param_path, "r", encoding="utf-8") as fid:
            algorithm_params = json.load(fid)
    else:
        algorithm_params = {}

    nn_model = get_model_from_name(flags.model_name)
    algorithm_params = {**nn_model.default_params(), **algorithm_params,
                        "batch_size": flags.batch_size}

    from hypelcnn_tpu.train.trainer import ClassificationTrainer
    trainer = ClassificationTrainer(model=nn_model, class_count=class_count,
                                    algorithm_params=algorithm_params,
                                    scene=scene, sample_set=sample_set,
                                    log_dir=flags.base_log_path)
    variables = _restore_variables(flags, trainer.module, trainer)

    scene_shape = scene.get_scene_shape()
    if flags.domain == "all":
        scene_as_image = predict_full_scene(trainer.module, variables, scene)
    else:  # sample
        targets = np.vstack([sample_set.test_targets.astype(np.int32),
                             sample_set.training_targets.astype(np.int32),
                             sample_set.validation_targets.astype(np.int32)])
        scene_as_image = np.full(scene_shape, 255, dtype=np.uint8)
        preds = predict_targets(trainer.module, variables, scene, targets)
        scene_as_image[targets[:, 1], targets[:, 0]] = preds
    return scene_as_image, color_list


def main(argv=None) -> None:
    from hypelcnn_tpu.core.platform import honor_platform_request
    honor_platform_request()  # JAX_PLATFORMS env, authoritatively
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loaders(parser)
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_trainers(parser)
    add_parse_cmds_for_models(parser)
    add_parse_cmds_for_importers(parser)
    add_parse_cmds_for_app(parser)
    flags, _ = parser.parse_known_args(argv)

    start_time = time.time()
    if flags.domain in ("all", "sample"):
        scene_as_image, color_list = prediction_process(flags)
    elif flags.domain == "gt":
        scene_as_image, color_list = gt_process(flags)
    else:
        raise ValueError(f"Domain flags does not support value:{flags.domain}")

    os.makedirs(flags.output_path, exist_ok=True)
    imwrite(os.path.join(flags.output_path, "result_raw.tif"), scene_as_image)
    imwrite(os.path.join(flags.output_path, "result_colorized.tif"),
            create_colored_image(scene_as_image, color_list))
    print(f"Done evaluation({time.time() - start_time:.3f} sec)")


if __name__ == "__main__":
    main()
