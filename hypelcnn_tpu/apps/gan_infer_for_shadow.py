"""GAN inference-statistics CLI.

Parity with reference `gan/gan_infer_for_shadow.py:12-54`: restores a
trained generator and runs the band-ratio validation once (stats printout,
JS divergence, percentile plots).  ``--base_log_path`` points at an orbax
params checkpoint written by gan_train_for_shadow (``.../gan_params`` or a
``ckpt_params_N`` directory).
"""

from __future__ import annotations

import argparse

import numpy as np

from hypelcnn_tpu.core.config import add_parse_cmds_for_loaders, add_parse_cmds_for_loggers
from hypelcnn_tpu.core.registry import get_loader_from_name
from hypelcnn_tpu.gan.validation import PeerValidator
from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict


def add_parse_cmds_for_app(parser) -> None:
    parser.add_argument("--number_of_samples", nargs="?", type=int, default=6000,
                        help="Number of samples.")
    parser.add_argument("--gan_type", nargs="?", type=str, default="cycle_gan",
                        help="Gan type, possible values; cycle_gan, gan_x2y, gan_y2x, "
                             "cut_x2y, cut_y2x, dcl_gan, dcl_cycle_gan")


def restore_gan_params(trainer, checkpoint_path: str):
    import jax
    from hypelcnn_tpu.train.checkpoint import restore_params_pytree
    template = trainer.init_state(jax.random.key(0)).params
    return restore_params_pytree(checkpoint_path, template)


def main(argv=None) -> None:
    from hypelcnn_tpu.core.platform import honor_platform_request
    honor_platform_request()  # JAX_PLATFORMS env, authoritatively
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loaders(parser)
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_app(parser)
    flags, _ = parser.parse_known_args(argv)

    np.set_printoptions(precision=5, suppress=True)
    loader = get_loader_from_name(flags.loader_name, flags.path)
    data_set = loader.load_data(flags.neighborhood, True)
    shadow_map, shadow_ratio = loader.load_shadow_map(flags.neighborhood, data_set)

    trainer = get_trainer_dict({}, data_set.get_casi_band_count(), max_steps=1)[flags.gan_type]
    params = restore_gan_params(trainer, flags.base_log_path)

    validator = PeerValidator(loader, data_set, shadow_map, shadow_ratio,
                              flags.neighborhood, flags.number_of_samples,
                              flags.output_path)
    validator.run(
        lambda s: trainer.translate(params, jnp.asarray(s), True),
        lambda s: trainer.translate(params, jnp.asarray(s), False),
        iteration=0, plot=True)


if __name__ == "__main__":
    main()
