"""Build a muulf shadow map from the building-shadow class, reassign shadow
contours to their dominant neighboring class, write shadow-corrected HSI/GT.

Parity with reference `utilities/reveal_shadow_targets.py:16-127`: same
building/building-shadow class ids, same contour-neighbor voting (excluding
shadow/building/invalid classes), same outputs
(``muulf_shadow_map.tif``, ``muulf_hsi_shadow_corrected.tif``,
``muulf_gt_shadow_corrected.tif``).  Figures saved headless.
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
from hypelcnn_tpu.data.loaders.base import calculate_shadow_ratio
from hypelcnn_tpu.infer.scene_inference import (
    INVALID_TARGET_VALUE,
    create_colored_image,
    create_target_image_via_samples,
)
from hypelcnn_tpu.utils.tiff_io import imwrite

BUILDING_CLASS = 7
BUILDING_SHADOW_CLASS = 6

# reference quirk PRESERVED (`utilities/reveal_shadow_targets.py:120`,
# neighborhood_pair_list): (1, 0) appears TWICE and (-1, 0) is missing, so
# the south neighbor votes double and the north neighbor never votes; the
# vote init at -1 (below) is likewise the reference's.  Do not "fix" —
# contour reassignment output would silently diverge.
_NEIGHBOR_DELTAS = [(0, 1), (0, -1), (1, 0), (1, 1), (1, -1), (1, 0), (-1, 1), (-1, -1)]


def get_shadow_map(target_image: np.ndarray) -> np.ndarray:
    return (target_image == BUILDING_SHADOW_CLASS).astype(np.uint8)


def create_shadow_corrected_image(casi_normalized, casi, shadow_map, output_path="."):
    ratio = calculate_shadow_ratio(casi, shadow_map,
                                   np.logical_not(shadow_map).astype(int))
    add_coef = np.repeat(np.expand_dims(shadow_map, 2), casi_normalized.shape[2],
                         axis=2) * (ratio - 1)
    final_casi = casi + (casi * add_coef)
    imwrite(os.path.join(output_path, "muulf_hsi_shadow_corrected.tif"),
            final_casi.astype(np.float32))


def _contour_neighbor_votes(contour, target_image):
    votes = {}
    for index in range(contour.shape[0]):
        x, y = contour[index][0][1], contour[index][0][0]
        for dx, dy in _NEIGHBOR_DELTAS:
            t = int(target_image[x + dx, y + dy])
            votes[t] = votes.get(t, -1) + 1
    return votes


def reassign_shadow_contours(shadow_map: np.ndarray, target_image: np.ndarray) -> np.ndarray:
    import cv2
    contours, _ = cv2.findContours(shadow_map, cv2.RETR_LIST, cv2.CHAIN_APPROX_NONE)
    for contour in contours:
        votes = _contour_neighbor_votes(contour, target_image)
        for excluded in (BUILDING_SHADOW_CLASS, INVALID_TARGET_VALUE, BUILDING_CLASS):
            votes.pop(excluded, None)
        if not votes:
            print("found contour with no proper neighbors")
            continue
        winner = max(votes, key=votes.get)
        mask_im = np.zeros(shadow_map.shape, dtype=np.uint8)
        mask = cv2.drawContours(mask_im, [contour], 0, 255, -1) == 255
        target_image[mask] = winner
        print(f"shadow converted to neighboring target {winner:d}")
    return target_image


def draw_targets(color_list, target_image, figure_name, output_path="."):
    plt.imshow(create_colored_image(target_image, color_list))
    plt.title(figure_name), plt.xticks([]), plt.yticks([])
    plt.savefig(os.path.join(output_path, figure_name.replace(" ", "_") + ".png"))
    plt.clf()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_parse_cmds_for_loggers(parser)
    add_parse_cmds_for_loaders(parser)
    flags, _ = parser.parse_known_args(argv)
    out = flags.output_path

    loader = get_loader_from_name(flags.loader_name, flags.path)
    sample_set = loader.load_samples(0.1, 0.1)
    data_set = loader.load_data(0, True)
    target_image = create_target_image_via_samples(sample_set, data_set.get_scene_shape())

    shadow_map = get_shadow_map(target_image)
    imwrite(os.path.join(out, "muulf_shadow_map.tif"), shadow_map)

    casi_unnormalized = loader.load_data(0, False).casi
    create_shadow_corrected_image(data_set.casi, casi_unnormalized, shadow_map, out)
    draw_targets(loader.get_samples_color_list(), target_image, "Targets", out)

    target_image = reassign_shadow_contours(shadow_map, target_image)
    draw_targets(loader.get_samples_color_list(), target_image,
                 "Targets after shadow correction", out)
    valid = target_image != INVALID_TARGET_VALUE
    target_image[valid] = target_image[valid] + 1  # back to 1-indexed GT
    imwrite(os.path.join(out, "muulf_gt_shadow_corrected.tif"), target_image)


if __name__ == "__main__":
    main()
