"""Plot shadow/lit band-ratio statistics for a pairing method.

Parity with reference `utilities/measure_targets_shadow_ratio.py:11-38`.
CLI: same loader/logger flags + ``--pairing_method``.
"""

from __future__ import annotations

import argparse

import numpy as np

from hypelcnn_tpu.core.config import add_parse_cmds_for_loaders, add_parse_cmds_for_loggers
from hypelcnn_tpu.core.registry import get_loader_from_name
from hypelcnn_tpu.gan.sampling import read_hsi_data
from hypelcnn_tpu.gan.validation import plot_overall_info
from hypelcnn_tpu.gan.wrapper_registry import get_sampling_map


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_loaders(parser)
    parser.add_argument("--pairing_method", nargs="?", type=str, default="random",
                        help="Pairing method: random, target, dummy, neighbour")
    flags, _ = parser.parse_known_args(argv)

    neighborhood = 0
    loader = get_loader_from_name(flags.loader_name, flags.path)
    data_set = loader.load_data(neighborhood, True)
    shadow_map, _ = loader.load_shadow_map(neighborhood, data_set)

    normal, shadow = read_hsi_data(loader, data_set, shadow_map,
                                   flags.pairing_method, get_sampling_map())
    normal = np.squeeze(normal)
    shadow = np.squeeze(shadow)

    # zero lit-side cells produce inf/nan rows that the finite filter drops;
    # silence the expected divide-by-zero warning rather than spam stderr
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = shadow / normal
    ratio = ratio[np.isfinite(ratio).all(axis=1)]
    mean_res = np.mean(ratio, axis=0)
    std_res = np.std(ratio, axis=0)
    plot_overall_info(loader.get_band_measurements(), mean_res,
                      mean_res - std_res, mean_res + std_res, 0,
                      f"{flags.loader_name.lower()}_{flags.pairing_method.lower()}",
                      flags.output_path)


if __name__ == "__main__":
    main()
