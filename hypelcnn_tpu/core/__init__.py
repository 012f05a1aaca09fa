from hypelcnn_tpu.core.config import (
    add_parse_cmds_for_importers,
    add_parse_cmds_for_json_loader,
    add_parse_cmds_for_loaders,
    add_parse_cmds_for_loggers,
    add_parse_cmds_for_models,
    add_parse_cmds_for_opt,
    add_parse_cmds_for_trainers,
    load_algorithm_params,
    merge_flag_config_json,
    type_ensure_strtobool,
)
from hypelcnn_tpu.core.registry import (
    get_importer_from_name,
    get_loader_from_name,
    get_model_from_name,
    register_importer,
    register_loader,
    register_model,
)
from hypelcnn_tpu.core.rng import RngPool, set_run_seed

__all__ = [
    "add_parse_cmds_for_importers",
    "add_parse_cmds_for_json_loader",
    "add_parse_cmds_for_loaders",
    "add_parse_cmds_for_loggers",
    "add_parse_cmds_for_models",
    "add_parse_cmds_for_opt",
    "add_parse_cmds_for_trainers",
    "load_algorithm_params",
    "merge_flag_config_json",
    "type_ensure_strtobool",
    "get_importer_from_name",
    "get_loader_from_name",
    "get_model_from_name",
    "register_importer",
    "register_loader",
    "register_model",
    "RngPool",
    "set_run_seed",
]
