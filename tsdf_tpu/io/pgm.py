"""PGM (P5) reading/writing, including NYU's byte-swapped u16 variant.

ref: src/Utilities/PgmUtilities.cpp (P5 binary greyscale, most
significant byte first) and DepthMapUtilities.cpp:20-33
(read_nyu_depth_map: NYU PGM depth needs a byte swap).
"""

from __future__ import annotations

import numpy as np


def load_pgm(path: str) -> np.ndarray:
    """Load binary P5 PGM: (H, W) u8 or u16 (big-endian per spec)."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise ValueError(f"{path}: not a binary P5 PGM")
    # header: magic, width, height, maxval, separated by whitespace,
    # with '#' comments
    fields = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval < 256:
        arr = np.frombuffer(data, np.uint8, width * height, pos)
    else:
        arr = np.frombuffer(data, ">u2", width * height, pos).astype(
            np.uint16
        )
    return arr.reshape(height, width)


def save_pgm(path: str, image: np.ndarray) -> None:
    image = np.asarray(image)
    maxval = 255 if image.dtype == np.uint8 else 65535
    with open(path, "wb") as f:
        f.write(
            f"P5\n{image.shape[1]} {image.shape[0]}\n{maxval}\n".encode()
        )
        if image.dtype == np.uint8:
            f.write(image.tobytes())
        else:
            f.write(image.astype(">u2").tobytes())


def read_nyu_depth_map(path: str) -> np.ndarray:
    """NYU depth PGM: stored little-endian despite the P5 spec, so the
    spec-conformant read must be byte-swapped back
    (ref: DepthMapUtilities.cpp:20-33)."""
    depth = load_pgm(path)
    if depth.dtype == np.uint16:
        depth = depth.byteswap()
    return depth


def read_tum_depth_map(path: str) -> np.ndarray:
    """TUM depth PNG in 0.2mm units -> mm (divide by 5,
    ref: DepthMapUtilities.cpp:5-17)."""
    from .png import load_png

    return (load_png(path) // 5).astype(np.uint16)
