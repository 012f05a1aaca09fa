"""TIFF (and .npy) scene I/O without the tifffile dependency.

The reference reads every scene with ``tifffile.imread``
(e.g. `loader/GRSS2013DataLoader.py:19-25`).  This environment has no
tifffile, so the rebuild reads TIFFs through PIL (stacking multi-page files
into a band axis, the common band-sequential hyperspectral layout) and also
accepts ``.npy`` files transparently — the loaders only call
:func:`imread` / :func:`imwrite`.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

# hyperspectral scenes are big; PIL's decompression-bomb guard is not useful here
Image.MAX_IMAGE_PIXELS = None


def imread(path: str) -> np.ndarray:
    """Read an image/scene. Multi-page TIFFs stack pages along the last axis."""
    if path.endswith(".npy"):
        return np.load(path)
    with Image.open(path) as im:
        n_frames = getattr(im, "n_frames", 1)
        if n_frames == 1:
            return np.array(im)
        frames = []
        for i in range(n_frames):
            im.seek(i)
            frames.append(np.array(im))
        return np.stack(frames, axis=-1)


def imwrite(path: str, data: np.ndarray) -> None:
    """Write an image/scene; 3-D float arrays become multi-page TIFFs."""
    if path.endswith(".npy"):
        np.save(path, data)
        return
    # only a uint8 3/4-channel array is an RGB(A) image; a float/uint16
    # 3- or 4-band scene is a band stack and must go multi-page (the RGB
    # path would raise TypeError or silently drop the band-axis convention)
    is_rgb_image = (data.ndim == 3 and data.shape[2] in (3, 4)
                    and data.dtype == np.uint8)
    if data.ndim == 3 and not is_rgb_image:
        pages = [Image.fromarray(np.ascontiguousarray(data[:, :, i])) for i in range(data.shape[2])]
        pages[0].save(path, save_all=True, append_images=pages[1:])
    else:
        Image.fromarray(data).save(path)


def find_scene_file(base: str) -> str:
    """Resolve ``base`` to an existing file, trying .npy next to the named file.

    Lets users convert datasets to .npy once (faster load) while keeping the
    reference's canonical TIFF filenames in loader code.
    """
    if os.path.exists(base):
        return base
    root, _ = os.path.splitext(base)
    for cand in (root + ".npy", base + ".npy"):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(base)
