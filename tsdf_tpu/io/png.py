"""PNG I/O for depth (16-bit grey), greyscale and RGB images.

Host-side replacement for the reference's libpng wrappers
(ref: src/Utilities/PngUtilities.cpp:13-355, PngWrapper.cpp). Uses PIL on
the host — image I/O never touches the device path.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_png(path) -> np.ndarray:
    """Load a PNG. 16-bit greyscale comes back as u16 (H, W)
    (ref: load_png_from_file PngUtilities.cpp:13-90); RGB as u8 (H, W, 3)."""
    img = Image.open(path)
    if img.mode == "I;16":
        return np.asarray(img, dtype=np.uint16)
    if img.mode == "I":
        return np.asarray(img, dtype=np.int32).astype(np.uint16)
    arr = np.asarray(img)
    return arr


def save_png(path, array) -> None:
    """Save u8 grey / u8 RGB / u16 grey arrays
    (ref: save_png_to_file PngUtilities.hpp:18-20)."""
    array = np.asarray(array)
    if array.dtype == np.uint16:
        img = Image.fromarray(array)
    elif array.ndim == 2:
        img = Image.fromarray(array.astype(np.uint8), mode="L")
    else:
        img = Image.fromarray(array.astype(np.uint8), mode="RGB")
    img.save(path)
