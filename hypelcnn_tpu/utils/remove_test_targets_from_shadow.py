"""Zero validation-target pixels out of a shadow map.

Parity with reference `utilities/remove_test_targets_from_shadow.py:10-37`
(the interactive plt.show calls become saved figures so the tool works
headless).
"""

from __future__ import annotations

import argparse
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from hypelcnn_tpu.core.config import add_parse_cmds_for_loaders, add_parse_cmds_for_loggers
from hypelcnn_tpu.core.registry import get_loader_from_name
from hypelcnn_tpu.utils.tiff_io import imwrite


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_loaders(parser)
    flags, _ = parser.parse_known_args(argv)

    loader = get_loader_from_name(flags.loader_name, flags.path)
    sample_set = loader.load_samples(0.1, 0.1)
    data_set = loader.load_data(0, True)
    shadow_map, _ = loader.load_shadow_map(0, data_set)
    shadow_map = np.array(shadow_map)

    plt.imshow(shadow_map * 255)
    plt.xticks([]), plt.yticks([])
    plt.savefig(os.path.join(flags.output_path, "shadow_map_before.png"))
    plt.clf()

    non_shadow_test_sample = 0
    for point in sample_set.validation_targets:
        if shadow_map[point[1], point[0]] == 1:
            shadow_map[point[1], point[0]] = 0
        else:
            non_shadow_test_sample += 1
    print(f"Non-shadow validation samples: {non_shadow_test_sample}")

    plt.imshow(shadow_map * 255)
    plt.xticks([]), plt.yticks([])
    plt.savefig(os.path.join(flags.output_path, "shadow_map_after.png"))
    plt.clf()

    imwrite(os.path.join(flags.output_path, "shadow_map.tif"), shadow_map)


if __name__ == "__main__":
    main()
