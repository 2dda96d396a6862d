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


def fl_2_uchar(in_path: str, out_path: str) -> tuple[float, float]:
    """Raw float volume -> raw u8 volume, min-max normalised to 0..255.

    File layout: header {3 x uint32 size, 3 x float physical_size} then
    size.x*size.y*size.z floats; output is the same count of raw u8
    bytes, no header (ref: src/Tools/fl_2_uchar.c:28-71). The reference
    computes ``scale = 255/(max-min)`` but then multiplies by a bare 255
    (fl_2_uchar.c:66-70), overflowing for any range wider than 1.0 — the
    intended normalisation is built here, not the bug.

    Returns (min, max) of the input, which the reference prints.
    """
    with open(in_path, "rb") as f:
        size = np.fromfile(f, np.uint32, 3)
        _psize = np.fromfile(f, np.float32, 3)
        n = int(size[0]) * int(size[1]) * int(size[2])
        data = np.fromfile(f, np.float32, n)
    if data.size != n:
        raise ValueError(
            f"{in_path}: expected {n} floats, found {data.size}"
        )
    lo, hi = float(data.min()), float(data.max())
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    out = np.clip((data - lo) * scale, 0.0, 255.0).astype(np.uint8)
    out.tofile(out_path)
    return lo, hi
