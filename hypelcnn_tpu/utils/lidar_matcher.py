"""GRSS2013 <-> GRSS2018 scene registration via template matching.

Parity with reference `utilities/lidar_matcher.py:11-85`: resample one band
of each scene to a common ground resolution, normalized cross-correlation
template match (OpenCV), report the matched rectangle in both raw and
scaled coordinates.  Figures are saved (headless) instead of shown.
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


def match_data(grss_2013_band, grss_2018_band, grss_2013_data_set, grss_2018_data_set,
               grss2013_scale, grss2018_scale, output_path="."):
    from cv2 import INTER_AREA, TM_CCORR_NORMED, matchTemplate, minMaxLoc, rectangle, resize

    band_2013 = grss_2013_data_set.casi[:, :, grss_2013_band]
    band_2013 = resize(band_2013, (band_2013.shape[1] * grss2013_scale,
                                   band_2013.shape[0] * grss2013_scale),
                       interpolation=INTER_AREA)

    band_2018 = np.squeeze(grss_2018_data_set.casi[:, :, grss_2018_band]).astype(np.float32)
    band_2018 = band_2018[0:-350, 0:-75]
    band_2018 = resize(band_2018, (int(band_2018.shape[1] * grss2018_scale),
                                   int(band_2018.shape[0] * grss2018_scale)),
                       interpolation=INTER_AREA)

    res = matchTemplate(band_2013.astype(np.float32), band_2018, TM_CCORR_NORMED)
    _, _, _, max_loc = minMaxLoc(res)
    w, h = band_2018.shape[::-1]
    top_left = max_loc
    bottom_right = (top_left[0] + w, top_left[1] + h)
    im_2013 = (band_2013 / np.max(band_2013) * 255).astype("uint8")
    rectangle(im_2013, top_left, bottom_right, 255, 4 * grss2013_scale)
    plt.imshow(im_2013)
    plt.title("Detected Point"), plt.xticks([]), plt.yticks([])
    plt.savefig(os.path.join(output_path, "lidar_match.png"))
    plt.clf()
    print("Top Left", top_left)
    print("Top Left(scaled) (%f, %f)" % (top_left[0] / grss2013_scale,
                                         top_left[1] / grss2013_scale))
    print("Bottom Right", bottom_right)
    print("Bottom Right(scaled) (%f, %f)" % (bottom_right[0] / grss2013_scale,
                                             bottom_right[1] / grss2013_scale))
    return top_left, bottom_right


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_loaders(parser)
    flags, _ = parser.parse_known_args(argv)

    lidar_grss2013_scale = 5
    lidar_grss2018_scale = lidar_grss2013_scale / 2.5

    grss_2013 = get_loader_from_name("GRSS2013DataLoader", flags.path).load_data(0, True)
    grss_2018 = get_loader_from_name("GRSS2018DataLoader", flags.path).load_data(0, True)
    match_data(8, 2, grss_2013, grss_2018, lidar_grss2013_scale, lidar_grss2018_scale,
               flags.output_path)


if __name__ == "__main__":
    main()
