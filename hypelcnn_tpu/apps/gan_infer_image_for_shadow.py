"""Full-scene shadow/de-shadow translation CLI.

Parity with reference `gan/gan_infer_image_for_shadow.py:15-108`: translate
the whole scene through a trained generator — optionally only the pixels on
one side of the shadow map (``--convert_all`` to translate everything) —
un-normalize, write the HSI tif and an sRGB render.

The reference feeds one 1x1x1xbands pixel per session.run (`:72-85`);
here the scene's pixels are translated in on-device mega-batches and the
shadow-map filter is a vectorized select.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from hypelcnn_tpu.core.config import (
    add_parse_cmds_for_loaders,
    add_parse_cmds_for_loggers,
    type_ensure_strtobool,
)
from hypelcnn_tpu.core.registry import get_loader_from_name
from hypelcnn_tpu.gan.wrapper_registry import get_trainer_dict
from hypelcnn_tpu.utils.hsi_rgb import get_rgb_from_hsi
from hypelcnn_tpu.utils.tiff_io import imwrite


def add_parse_cmds_for_app(parser) -> None:
    parser.add_argument("--gan_type", nargs="?", type=str, default="cycle_gan",
                        help="Gan type, e.g. cycle_gan, gan_x2y, gan_y2x, cut_x2y, dcl_gan")
    parser.add_argument("--make_them_shadow", nargs="?", type=str, default="",
                        help="makes the scene shadowed(shadow), non shadowed(deshadow), "
                             "or empty(none)")
    parser.add_argument("--convert_all", nargs="?", type=type_ensure_strtobool, default=False,
                        help="Whether to convert filtered pixels(shadowed or not) or all.")


def main(argv=None) -> None:
    from hypelcnn_tpu.core.platform import honor_platform_request
    honor_platform_request()  # JAX_PLATFORMS env, authoritatively
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loaders(parser)
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_app(parser)
    flags, _ = parser.parse_known_args(argv)

    make_them_shadow = flags.make_them_shadow
    loader = get_loader_from_name(flags.loader_name, flags.path)
    data_set = loader.load_data(0, True)
    target_dtype = data_set.get_unnormalized_casi_dtype()
    shadow_map, _ = loader.load_shadow_map(0, data_set)

    scene_shape = data_set.get_scene_shape()
    band_size = data_set.get_casi_band_count()

    if make_them_shadow == "shadow":
        is_shadow, filter_sign = True, 0
    elif make_them_shadow == "deshadow":
        is_shadow, filter_sign = False, 1
    else:
        is_shadow, filter_sign = True, -1
        make_them_shadow = "none"

    h, w = scene_shape
    n = data_set.neighborhood  # 0 here (loader loaded unpadded); crop handles any n
    pixels = np.asarray(data_set.casi[n:n + h, n:n + w, :band_size], dtype=np.float32)

    if make_them_shadow == "none":
        converted = pixels
    else:
        trainer = get_trainer_dict({}, band_size, max_steps=1)[flags.gan_type]
        from hypelcnn_tpu.apps.gan_infer_for_shadow import restore_gan_params
        params = restore_gan_params(trainer, flags.base_log_path)

        # whole scene in ONE jitted dispatch (the reference's per-pixel
        # sess.run loop takes hours at this scale)
        converted = trainer.translate_scene(params, pixels, is_shadow)

        if not flags.convert_all:
            mask = (np.asarray(shadow_map)[:h, :w] == filter_sign)[:, :, None]
            converted = np.where(mask, converted, pixels)

    hsi_image = ((converted * data_set.casi_max) + data_set.casi_min).astype(target_dtype)

    convert_region_sfx = "" if not flags.convert_all else "_all"
    chkpnt_num_str = flags.base_log_path.rsplit("-", 1)[-1].rsplit("/", 1)[-1]
    hsi_path = os.path.join(flags.output_path,
                            f"shadow_image_{make_them_shadow}_{chkpnt_num_str}"
                            f"{convert_region_sfx}.tif")
    print(f"Saving output to {hsi_path}")
    imwrite(hsi_path, hsi_image)

    hsi_float = (hsi_image.astype(float) - data_set.casi_min) / data_set.casi_max
    rgb = (get_rgb_from_hsi(loader.get_band_measurements(), hsi_float) * 255).astype(np.uint8)
    rgb_path = os.path.join(flags.output_path,
                            f"shadow_image_rgb_{make_them_shadow}_{chkpnt_num_str}_"
                            f"{convert_region_sfx}.tif")
    print(f"Saving output RGB to {rgb_path}")
    imwrite(rgb_path, rgb)


if __name__ == "__main__":
    main()
