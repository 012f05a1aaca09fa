"""GAN shadow-synthesis training CLI.

Flag parity with reference `gan/gan_train_for_shadow.py:28-78` (the
vestigial TF parameter-server flags ``--master/--ps_tasks/--task`` are
accepted and ignored).  The training loop is a jitted ``lax.scan`` chunk
over the pair arrays resident in HBM; validation (band-ratio JS divergence
for both directions, best-point tracking, plots) runs between chunks on the
reference cadence and drives checkpointing, exactly like the reference's
ValidationHook + Saver (`gan/gan_train_for_shadow.py:236-305`).

The final generator params are written to ``<log_dir>/gan_params`` so the
classification trainer can restore them as a frozen shadow augmenter.
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import time
from types import SimpleNamespace
from typing import List

import numpy as np

from hypelcnn_tpu.core.config import (
    add_parse_cmds_for_json_loader,
    add_parse_cmds_for_loaders,
    add_parse_cmds_for_loggers,
    add_parse_cmds_for_opt,
    add_parse_cmds_for_trainers,
    merge_flag_config_json,
    type_ensure_strtobool,
)
from hypelcnn_tpu.core.registry import get_loader_from_name
from hypelcnn_tpu.core.rng import RngPool
from hypelcnn_tpu.gan.sampling import read_hsi_data
from hypelcnn_tpu.gan.validation import PeerValidator
from hypelcnn_tpu.gan.wrapper_registry import get_sampling_map, get_trainer_dict
from hypelcnn_tpu.utils.text import replace_abbrs


def add_parse_cmds_for_app(parser) -> None:
    parser.add_argument("--gan_type", nargs="?", type=str, default="cycle_gan",
                        help="Gan type to train, possible values; cycle_gan, gan_x2y, gan_y2x, "
                             "cut_x2y, cut_y2x, dcl_gan, dcl_cycle_gan")
    parser.add_argument("--use_identity_loss", nargs="?", type=type_ensure_strtobool,
                        default=True, help="Whether to use identity loss during training.")
    parser.add_argument("--identity_loss_weight", nargs="?", type=float, default=0.5,
                        help="The weight of identity loss.")
    parser.add_argument("--regularization_support_rate", nargs="?", type=float, default=0.0,
                        help="The regularization support rate, ranges from 0 to 1.")
    parser.add_argument("--cycle_consistency_loss_weight", nargs="?", type=float, default=10.0,
                        help="The weight of cycle consistency loss.")
    parser.add_argument("--nce_loss_weight", nargs="?", type=float, default=10.0,
                        help="The weight of NCE loss.")
    parser.add_argument("--tau", nargs="?", type=float, default=0.07,
                        help="Tau value for the NCE loss.")
    parser.add_argument("--patches", nargs="?", type=int, default=6,
                        help="Patch count for feature discriminator (CUT/DCL GANs)")
    parser.add_argument("--embedded_feat_size", nargs="?", type=int, default=2,
                        help="Embedded feature size for feature discriminator (CUT/DCL GANs)")
    parser.add_argument("--validation_steps", nargs="?", type=int, default=1000,
                        help="Validation frequency")
    parser.add_argument("--validation_sample_count", nargs="?", type=int, default=300,
                        help="Validation sample count")
    parser.add_argument("--generator_lr", nargs="?", type=float, default=0.0002,
                        help="The generator learning rate.")
    parser.add_argument("--discriminator_lr", nargs="?", type=float, default=0.0001,
                        help="The discriminator learning rate.")
    parser.add_argument("--gen_discriminator_lr", nargs="?", type=float, default=0.0001,
                        help="The generator discriminator learning rate.")
    parser.add_argument("--discriminator_reg_scale", nargs="?", type=float, default=0.00001,
                        help="The discriminator regularization scale.")
    parser.add_argument("--gen_disc_reg_scale", nargs="?", type=float, default=0.0001,
                        help="The generator discriminator regularization scale.")
    parser.add_argument("--pairing_method", nargs="?", type=str, default="random",
                        help="Pairing method: random, target, dummy, neighbour")
    # vestigial TF parameter-server flags, accepted for CLI compatibility
    parser.add_argument("--master", nargs="?", type=str, default="")
    parser.add_argument("--ps_tasks", nargs="?", type=int, default=0)
    parser.add_argument("--task", nargs="?", type=int, default=0)


def get_log_suffix(flags) -> str:
    """Reference `gan/gan_train_for_shadow.py:185-197`."""
    abbreviations = {"dataloader": "ldr"}
    patch_size = flags.neighborhood * 2 + 1
    suffix = (f"{flags.loader_name.lower():s}_{flags.gan_type.lower():s}_"
              f"{patch_size:d}x{patch_size:d}_"
              f"regsup{flags.regularization_support_rate:.2f}_"
              f"batch{flags.batch_size:d}").replace(".", "")
    if flags.use_identity_loss is True:
        suffix = suffix + f"_idnty{flags.use_identity_loss:.2f}".replace(".", "")
    return replace_abbrs(suffix, abbreviations)


def run_session(params, base_log_path) -> List[float]:
    import jax
    import jax.numpy as jnp

    flags = SimpleNamespace(**params)
    print("Args:", json.dumps(vars(flags), indent=3))
    log_dir = f"{base_log_path}_{get_log_suffix(flags)}"
    os.makedirs(log_dir, exist_ok=True)

    neighborhood = 0
    rng = RngPool(1234)

    loader = get_loader_from_name(flags.loader_name, flags.path)
    data_set = loader.load_data(neighborhood, True)
    shadow_map, shadow_ratio = loader.load_shadow_map(neighborhood, data_set)

    normal, shadow = read_hsi_data(loader, data_set, shadow_map,
                                   flags.pairing_method, get_sampling_map())
    print(f"Pairs: normal={normal.shape} shadow={shadow.shape}")

    band_count = data_set.get_casi_band_count()
    trainer = get_trainer_dict(vars(flags), band_count, flags.step)[flags.gan_type]
    state = trainer.init_state(rng.key("gan-init"))

    from hypelcnn_tpu.train.checkpoint import (restore_checkpoint, save_checkpoint,
                                               save_params_pytree)

    # auto-resume from the latest FULL-state checkpoint (params + optimizer
    # slots + pool + step), the reference's MonitoredTrainingSession
    # (checkpoint_dir=log_dir) behavior (`gan/gan_train_for_shadow.py:128-139`);
    # one checkpoint per validated iteration is kept, Saver(max_to_keep=
    # step // validation_steps) parity (`:289`).
    keep = max(flags.step // max(flags.validation_steps, 1), 1)
    resume_step = 0
    restored = restore_checkpoint(log_dir, template=state)
    if restored is not None and int(restored.step) > 0:
        state = jax.device_put(restored)
        resume_step = min(int(restored.step), flags.step)
        print(f"Resuming GAN training from checkpoint at step {resume_step}")

    validator = PeerValidator(loader, data_set, shadow_map, shadow_ratio,
                              neighborhood, flags.validation_sample_count, log_dir)

    normal_dev = jnp.asarray(normal)
    shadow_dev = jnp.asarray(shadow)
    n_pairs = normal.shape[0]
    batch = flags.batch_size
    reg_rate = flags.regularization_support_rate
    ratio_dev = jnp.asarray(shadow_ratio)

    step_fn_built = trainer.build_train_step()

    # data-parallel over the device mesh: batch sharded on the data axis,
    # params replicated, XLA inserts the gradient all-reduce — the scaling
    # path the reference's GAN runtime (`gan/gan_train_for_shadow.py:80-144`,
    # single device) never had.  Constraint-based so the scan-chunked
    # program stays a single dispatch.
    mesh = None
    if len(jax.devices()) > 1 and batch % len(jax.devices()) == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hypelcnn_tpu.parallel.mesh import DATA_AXIS, create_mesh
        mesh = create_mesh()
        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        print(f"GAN training data-parallel over {len(jax.devices())} devices")

    def one_step(carry, inp):
        # pair arrays ride the scan carry: a closure would bake them into
        # the compiled program as multi-hundred-MB constants at real scale
        state, normal_d, shadow_d = carry
        idx, step_no = inp
        key = jax.random.fold_in(rng_base, step_no)
        k_reg1, k_reg2, k_step = jax.random.split(key, 3)
        x = jnp.take(normal_d, idx, axis=0)
        y = jnp.take(shadow_d, idx, axis=0)
        # regularization-support swap (reference load_op map fn,
        # gan/gan_train_for_shadow.py:171-182), per example
        if reg_rate > 0:
            u1 = jax.random.uniform(k_reg1, (batch, 1, 1, 1), minval=0.01, maxval=0.99)
            x = jnp.where(u1 < reg_rate, y * ratio_dev, x)
            u2 = jax.random.uniform(k_reg2, (batch, 1, 1, 1), minval=0.01, maxval=0.99)
            y = jnp.where(u2 < reg_rate, x / ratio_dev, y)
        if mesh is not None:
            x = jax.lax.with_sharding_constraint(x, batch_sharding)
            y = jax.lax.with_sharding_constraint(y, batch_sharding)
        new_state, metrics = step_fn_built(state, x, y, k_step)
        return (new_state, normal_d, shadow_d), metrics["generator_loss"]

    def chunk_fn(state, normal_d, shadow_d, idx_chunk, step_nos):
        (state, _, _), losses = jax.lax.scan(one_step, (state, normal_d, shadow_d),
                                             (idx_chunk, step_nos))
        return state, losses

    rng_base = rng.key("gan-train")
    chunk_jit = jax.jit(chunk_fn, donate_argnums=(0,))

    # epoch-shuffled joint pair indices (reference shuffle_and_repeat on the
    # zipped dataset keeps pairs aligned)
    total_steps = flags.step
    epochs = math.ceil(total_steps * batch / n_pairs)
    host_rng = rng.numpy_rng("gan-shuffle")
    perms = np.concatenate([host_rng.permutation(n_pairs) for _ in range(epochs)])
    idx_stream = jnp.asarray(perms[: total_steps * batch].astype(np.int32)
                             .reshape(total_steps, batch))

    cadence = min(flags.validation_steps, total_steps)
    t0 = time.time()
    # the epoch-shuffled index stream is a deterministic function of the
    # seeded rng pool, so resuming at step N and slicing from N continues the
    # exact stream an uninterrupted run would have consumed
    start = resume_step
    while start < total_steps:
        n = min(cadence, total_steps - start)
        idx_chunk = jax.lax.slice_in_dim(idx_stream, start, start + n, axis=0)
        step_nos = jnp.arange(start, start + n, dtype=jnp.uint32)
        state, gen_losses = chunk_jit(state, normal_dev, shadow_dev, idx_chunk, step_nos)
        start += n
        print(f"step {start}: generator_loss={float(gen_losses[-1]):.4f} "
              f"({start / (time.time() - t0):.1f} steps/s avg)")

        params_now = jax.device_get(state.params)
        validator.run(
            lambda s: trainer.translate(params_now, jnp.asarray(s), True),
            lambda s: trainer.translate(params_now, jnp.asarray(s), False),
            start, plot=True)
        # params-only snapshot for the frozen-augmenter / inference consumers
        # (gan_infer accepts a ckpt_params_N path) ...
        save_params_pytree(os.path.join(log_dir, f"ckpt_params_{start}"), params_now)
        # ... plus the full GANState so a killed run resumes with optimizer
        # moments and pool intact (reference Saver keeps the slot variables)
        save_checkpoint(log_dir, state, max_to_keep=keep)

    # final params for use as a frozen augmenter
    save_params_pytree(os.path.join(log_dir, "gan_params"), jax.device_get(state.params))

    best_upper = validator.get_best_upper_div()
    best_mean = validator.get_best_mean_div()
    return [max(best_upper) if best_upper else float("nan"),
            max(best_mean) if best_mean else float("nan")]


def main(argv=None) -> None:
    from hypelcnn_tpu.core.platform import honor_platform_request
    honor_platform_request()  # JAX_PLATFORMS env, authoritatively
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loaders(parser)
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_trainers(parser)
    add_parse_cmds_for_json_loader(parser)
    add_parse_cmds_for_app(parser)
    add_parse_cmds_for_opt(parser)
    flags, _ = parser.parse_known_args(argv)

    if flags.flag_config_file:
        flags = merge_flag_config_json(flags, flags.flag_config_file)

    if flags.flag_config_file_opt:
        from hypelcnn_tpu.tune.search import create_study, objective
        with open(flags.flag_config_file_opt, "r", encoding="utf-8") as fid:
            params_from_json_opt = json.load(fid)
        print("Running on hyper parameter optimization mode")
        objective_func = functools.partial(
            objective, params=dict(vars(flags)), params_from_json_opt=params_from_json_opt,
            opt_run_count=flags.opt_run_count, func_to_run=run_session,
            base_log_path=flags.base_log_path)
        study = create_study("gan_shadow_opt", direction="minimize",
                             storage="sqlite:///gan_shadow_opt.db")
        study.optimize(objective_func, n_trials=flags.opt_trial_count)
    else:
        print("Running on training mode")
        print("Output divergence values:",
              run_session(params=dict(vars(flags)), base_log_path=flags.base_log_path))


if __name__ == "__main__":
    main()
