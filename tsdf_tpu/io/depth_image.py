"""Depth image container + basic ops.

Host-side twin of the reference ``DepthImage``
(ref: src/DataLoader/DepthImage.cpp:7-121, include/DepthImage.hpp:1-64):
u16 bitmap in mm loaded from 16-bit greyscale PNG, with scale/truncate/
min-max ops. Kept as numpy on the host; converted to jnp at the device
boundary.
"""

from __future__ import annotations

import numpy as np

from .png import load_png


class DepthImage:
    """u16 (H, W) depth in mm."""

    def __init__(self, data: np.ndarray):
        data = np.asarray(data)
        if data.ndim != 2:
            raise ValueError("depth image must be 2-D")
        self.data = data.astype(np.uint16)

    @classmethod
    def from_png(cls, path) -> "DepthImage":
        """ref: DepthImage::DepthImage(file) DepthImage.cpp:7-26."""
        return cls(load_png(path))

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]

    def scale_depth(self, factor: float) -> "DepthImage":
        """Multiply all depths (ref: DepthImage.cpp:61-69)."""
        return DepthImage(
            np.round(self.data.astype(np.float32) * factor).astype(np.uint16)
        )

    def truncate_depth_to(self, max_mm: int) -> "DepthImage":
        """Zero out depths beyond a cutoff (ref: DepthImage.cpp:75-84)."""
        out = self.data.copy()
        out[out > max_mm] = 0
        return DepthImage(out)

    def min_max(self) -> tuple[int, int]:
        """Min/max of the non-zero depths (ref: DepthImage.cpp:89-100)."""
        nz = self.data[self.data > 0]
        if nz.size == 0:
            return (0, 0)
        return (int(nz.min()), int(nz.max()))
