"""Format converters — the reference's small CLI tools as functions.

ref: src/Tools/freenect2png.cpp (raw11 Kinect disparity -> mm depth PNG)
and src/Tools/pgm2png.cpp.
"""

from __future__ import annotations

import numpy as np

from .pgm import load_pgm
from .png import save_png


def freenect_raw11_to_mm(raw: np.ndarray) -> np.ndarray:
    """Kinect raw11 disparity -> u16 mm depth.

    depth_mm = 1000 / (raw * -0.0030711016 + 3.3309495161); raw >= 2047
    is invalid and maps to 0 (ref: freenect2png.cpp:1-55).
    """
    raw = np.asarray(raw, np.float32)
    depth = 1000.0 / (raw * -0.0030711016 + 3.3309495161)
    depth = np.where((raw >= 2047) | (depth <= 0), 0.0, depth)
    return np.clip(np.round(depth), 0, 65535).astype(np.uint16)


def freenect2png(pgm_path: str, png_path: str) -> None:
    """Freenect PGM (LSB raw11) -> mm depth PNG."""
    raw = load_pgm(pgm_path)
    if raw.dtype == np.uint16:
        raw = raw.byteswap()  # freenect-record writes LSB-first
    save_png(png_path, freenect_raw11_to_mm(raw))


def pgm2png(pgm_path: str, png_path: str) -> None:
    """Plain PGM -> PNG (ref: pgm2png.cpp)."""
    save_png(png_path, load_pgm(pgm_path))
