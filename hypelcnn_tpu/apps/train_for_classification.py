"""Classification training CLI.

Flag-surface parity with the reference
(`classify/train_for_classification.py:126-230`): same flag groups, same app
flags (validation toggle, four augmentation flags, checkpoint/validation
cadence, hyperparameter-search mode), same log-dir suffix codec.  The
``--device`` flag is accepted for compatibility but JAX device selection is
automatic (TPU when present).

Run:
  python -m hypelcnn_tpu.apps.train_for_classification \
      --loader_name=GRSS2013DataLoader --model_name=HYPELCNNModel \
      --path=/data --algorithm_param_path=configs/alg_param_hypelcnn.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

from hypelcnn_tpu.core.config import (
    add_parse_cmds_for_importers,
    add_parse_cmds_for_loaders,
    add_parse_cmds_for_loggers,
    add_parse_cmds_for_models,
    add_parse_cmds_for_opt,
    add_parse_cmds_for_trainers,
    type_ensure_strtobool,
)
from hypelcnn_tpu.core.registry import get_importer_from_name, get_model_from_name
from hypelcnn_tpu.core.rng import set_run_seed
from hypelcnn_tpu.data.augmentation import AugmentationInfo
from hypelcnn_tpu.train.trainer import ClassificationTrainer, TrainingResult
from hypelcnn_tpu.utils.text import path_leaf, replace_abbrs


def add_parse_cmds_for_app(parser) -> None:
    parser.add_argument("--perform_validation", nargs="?", const=True, type=type_ensure_strtobool,
                        default=False,
                        help="If true, performs validation after training phase.")
    parser.add_argument("--augment_data_with_rotation", nargs="?", const=True,
                        type=type_ensure_strtobool, default=False,
                        help="If true, input data is augmented with synthetic rotational(90 degrees) input.")
    parser.add_argument("--augment_data_with_spectral", nargs="?", const=True, type=float,
                        default=None,
                        help="If given, input data is augmented with spectral ratio.")
    parser.add_argument("--augment_data_with_shadow", nargs="?", const=True, type=str,
                        default=None,
                        help="Given a method name, input data is augmented with shadow data(cycle_gan or simple")
    parser.add_argument("--augment_data_with_reflection", nargs="?", const=True,
                        type=type_ensure_strtobool, default=False,
                        help="If true, input data is augmented with synthetic reflection input.")
    parser.add_argument("--augmentation_random_threshold", nargs="?", type=float, default=0.5,
                        help="Augmentation randomization threshold.")
    parser.add_argument("--device", nargs="?", type=str, default="tpu",
                        help="Accepted for compatibility; JAX selects the backend.")
    parser.add_argument("--save_checkpoint_steps", nargs="?", type=int, default=2000,
                        help="Save frequency of the checkpoint")
    parser.add_argument("--validation_steps", nargs="?", type=int, default=40000,
                        help="Validation frequency")
    parser.add_argument("--all_data_shuffle_ratio", nargs="?", type=float, default=None,
                        help="If given as a valid ratio, validation and training data is "
                             "shuffled and redistributed")
    parser.add_argument("--log_model_params", nargs="?", const=True, type=type_ensure_strtobool,
                        default=False,
                        help="If added, logs model histograms.")


def get_log_suffix(flags) -> str:
    """Log-dir naming codec (reference `classify/train_for_classification.py:162-183`)."""
    abbreviations = {"model": "mdl", "dataloader": "ldr", "alg_param_": "p"}
    if flags.train_ratio > 1.0:
        trn_ratio_str = f"{int(flags.train_ratio):d}"
    else:
        trn_ratio_str = f"{flags.train_ratio:.2f}".replace(".", "")
    patch_size = flags.neighborhood * 2 + 1
    suffix = (f"{flags.loader_name.lower():s}_{flags.model_name.lower():s}_trn{trn_ratio_str:s}_"
              f"{os.path.splitext(path_leaf(flags.algorithm_param_path))[0].lower()}_"
              f"{patch_size:d}x{patch_size:d}")
    if flags.augment_data_with_shadow is not None:
        suffix += (f"_{flags.augment_data_with_shadow}"
                   + f"_aug{flags.augmentation_random_threshold:.2f}".replace(".", ""))
    if flags.augment_data_with_spectral is not None:
        suffix += f"_spectral{flags.augment_data_with_spectral:.3f}".replace(".", "")
    return replace_abbrs(suffix, abbreviations)


def perform_an_episode(flags, algorithm_params, model, base_log_path) -> TrainingResult:
    """One training episode (reference `classify/train_for_classification.py:20-123`)."""
    print("Args:", json.dumps(vars(flags), indent=3))
    set_run_seed()

    data_importer = get_importer_from_name(flags.importer_name)
    data = data_importer.read_data_set(flags.loader_name, flags.path,
                                       flags.train_ratio, flags.test_ratio,
                                       flags.neighborhood)

    shadow_struct = None
    if flags.augment_data_with_shadow is not None:
        if data.scene is None:
            raise ValueError(
                "--augment_data_with_shadow requires a scene-backed importer "
                "(the record pipeline carries no scene to synthesize from)")
        from hypelcnn_tpu.gan.shadow_ops import build_shadow_creators
        shadow_dict = build_shadow_creators(data.loader, data.scene, flags.neighborhood)
        if flags.augment_data_with_shadow not in shadow_dict:
            # fail loudly like the reference's dict[...] KeyError — a silent
            # None would run 50k steps without the requested augmentation
            raise KeyError(
                f"unknown shadow method {flags.augment_data_with_shadow!r}; "
                f"available: {sorted(shadow_dict)}")
        shadow_struct = shadow_dict[flags.augment_data_with_shadow]

    augmentation_info = AugmentationInfo(
        shadow_struct=shadow_struct,
        perform_shadow_augmentation=flags.augment_data_with_shadow is not None,
        perform_rotation_augmentation=flags.augment_data_with_rotation,
        perform_reflection_augmentation=flags.augment_data_with_reflection,
        perform_spectral_augmentation=flags.augment_data_with_spectral or 0.0,
        augmentation_random_threshold=flags.augmentation_random_threshold)

    batch_size = algorithm_params["batch_size"]
    n_train = data.sample_set.training_targets.shape[0]
    required_steps = flags.step if flags.epoch is None else (n_train * flags.epoch) // batch_size
    print(f"Steps: {required_steps:d}, Algorithm Params: {algorithm_params}")

    trainer = ClassificationTrainer(
        model=model, class_count=data.class_count, algorithm_params=algorithm_params,
        scene=data.scene, sample_set=data.sample_set,
        augmentation_info=augmentation_info,
        log_dir=base_log_path,
        save_checkpoint_steps=flags.save_checkpoint_steps,
        validation_cadence=flags.validation_steps if flags.perform_validation else None,
        sources=data.sources, data_shape=data.data_shape,
        log_model_params=bool(flags.log_model_params))

    start = time.time()
    result = trainer.fit(required_steps, batch_size,
                         progress_callback=lambda s, l: print(f"step {s}: loss={l:.4f}"))
    print(f"Done training for {time.time() - start:.3f} sec")

    if flags.perform_validation:
        print(f"Validation accuracy={result.validation_accuracy:g}, "
              f"Testing accuracy={result.test_accuracy:g}, loss={result.loss:.2f}")
    else:
        print(f"Testing accuracy={result.test_accuracy:g}, loss={result.loss:.2f}")
    return result


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
    add_parse_cmds_for_opt(parser)
    flags, _ = parser.parse_known_args(argv)

    nn_model = get_model_from_name(flags.model_name)

    if flags.flag_config_file_opt:
        # hyperparameter-search mode (reference `:201-218`)
        from hypelcnn_tpu.tune.search import create_study, objective
        with open(flags.flag_config_file_opt, "r", encoding="utf-8") as fid:
            params_from_json_opt = json.load(fid)
        print("Running in hyper parameter optimization mode")

        def run_session(params, base_log_path):
            return [1 - perform_an_episode(flags, params, nn_model, base_log_path).validation_accuracy]

        objective_func = functools.partial(
            objective, params=dict(vars(flags)), params_from_json_opt=params_from_json_opt,
            opt_run_count=flags.opt_run_count, func_to_run=run_session,
            base_log_path=flags.base_log_path)
        study = create_study("classification_opt", direction="minimize",
                             storage=f"sqlite:///classification_opt.db")
        study.optimize(objective_func, n_trials=flags.opt_trial_count)
    else:
        print("Running on training mode")
        from hypelcnn_tpu.core.config import load_algorithm_params
        # model defaults overlaid with the modelconfig JSON (a partial JSON
        # therefore works; the reference required a complete file)
        algorithm_params = load_algorithm_params(nn_model.default_params(),
                                                 flags.algorithm_param_path)
        if not algorithm_params:
            raise IOError("Algorithm parameter file is not given")
        algorithm_params["batch_size"] = flags.batch_size
        perform_an_episode(flags, algorithm_params, nn_model,
                           os.path.join(flags.base_log_path, get_log_suffix(flags)))


if __name__ == "__main__":
    main()
