"""Plot per-layer activation histograms for synthetic constant inputs.

Parity with reference `utilities/nn_layer_activation_graph.py:18-199`: a
controlled importer feeds constant-valued patches (one constant level per
row) through a trained or freshly-initialized model, and the activation taps
the model exposes (``ModelOutput.histograms``, the rebuild of the
reference's ``histogram_tensors``) are plotted as histograms per level.

CLI: loader/model flags + ``--level_count`` and optional ``--base_log_path``
checkpoint to restore.
"""

from __future__ import annotations

import argparse
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from hypelcnn_tpu.core.config import (
    add_parse_cmds_for_loaders,
    add_parse_cmds_for_loggers,
    add_parse_cmds_for_models,
)
from hypelcnn_tpu.core.registry import get_model_from_name


def controlled_patches(data_shape, level_count: int) -> np.ndarray:
    """Constant patches at ``level_count`` evenly spaced levels in [0, 1]
    (the reference's ControlledDataImporter role)."""
    levels = np.linspace(0.0, 1.0, level_count, dtype=np.float32)
    return np.stack([np.full(data_shape, lv, dtype=np.float32) for lv in levels])


def plot_activation_histograms(model_name: str, class_count: int, data_shape,
                               level_count: int, output_path: str,
                               algorithm_params=None, variables=None) -> dict:
    import jax

    nn_model = get_model_from_name(model_name)
    params = {**nn_model.default_params(), **(algorithm_params or {})}
    module = nn_model.create_module(class_count, params)
    x = controlled_patches(data_shape, level_count)

    if variables is None:
        variables = jax.jit(lambda r: module.init(r, x, train=False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)})
        variables = {k: v for k, v in variables.items() if k in ("params", "batch_stats")}

    out = module.apply(variables, x, train=False)
    histograms = {name: np.asarray(t) for name, t in out.histograms.items()}

    os.makedirs(output_path, exist_ok=True)
    for name, tensor in histograms.items():
        fig, axes = plt.subplots(1, level_count, figsize=(4 * level_count, 3),
                                 squeeze=False)
        for li in range(level_count):
            axes[0][li].hist(tensor[li].reshape(-1), bins=50)
            axes[0][li].set_title(f"{name} @lvl{li}")
        fig.tight_layout()
        fig.savefig(os.path.join(output_path, f"activation_{name}.png"))
        plt.close(fig)
    return histograms


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_loaders(parser)
    add_parse_cmds_for_models(parser)
    parser.add_argument("--level_count", nargs="?", type=int, default=4,
                        help="Number of constant input levels to probe")
    parser.add_argument("--class_count", nargs="?", type=int, default=15)
    parser.add_argument("--bands", nargs="?", type=int, default=145)
    flags, _ = parser.parse_known_args(argv)

    k = flags.neighborhood * 2 + 1
    from hypelcnn_tpu.core.config import load_algorithm_params
    nn_model = get_model_from_name(flags.model_name)
    algorithm_params = load_algorithm_params(nn_model.default_params(),
                                             flags.algorithm_param_path)

    # restore the trained checkpoint when --base_log_path points at a run
    # (reference restores the nn_core scope, `utilities/
    # nn_layer_activation_graph.py:135-143`); otherwise histograms come
    # from a fresh random init
    variables = None
    base = getattr(flags, "base_log_path", None)
    if base and os.path.isdir(os.path.join(base, "checkpoints")):
        import jax

        from hypelcnn_tpu.train.checkpoint import restore_checkpoint
        from hypelcnn_tpu.train.optimizer import build_optimizer
        from hypelcnn_tpu.train.state import TrainState
        module = nn_model.create_module(flags.class_count, algorithm_params)
        x = controlled_patches((k, k, flags.bands), flags.level_count)
        # init like the trainer does (train=True with labels) so the
        # template carries the same param structure the checkpoint was
        # saved with (reconstruction/decoder heads exist only in train mode)
        import jax.numpy as jnp
        dummy_labels = jax.nn.one_hot(
            jnp.zeros((x.shape[0],), jnp.int32), flags.class_count)
        init_vars = jax.jit(
            lambda r: module.init(r, x, labels=dummy_labels, train=True))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)})
        tx, _ = build_optimizer(algorithm_params)
        template = TrainState.create(init_vars["params"],
                                     init_vars.get("batch_stats", {}), tx)
        restored = restore_checkpoint(base, template)
        if restored is None:
            raise FileNotFoundError(
                f"--base_log_path={base} has a checkpoints/ dir but no "
                f"restorable checkpoint")
        variables = {"params": restored.params}
        if restored.batch_stats:
            variables["batch_stats"] = restored.batch_stats
        print(f"Restored checkpoint at step {int(restored.step)} from {base}")
    elif base:
        print(f"No checkpoints under {base}; histograms use random init")

    histograms = plot_activation_histograms(
        flags.model_name, flags.class_count, (k, k, flags.bands),
        flags.level_count, flags.output_path,
        algorithm_params=algorithm_params, variables=variables)
    print(f"Plotted {len(histograms)} activation histograms to {flags.output_path}")


if __name__ == "__main__":
    main()
