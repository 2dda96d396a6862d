"""Pallas TPU kernels for the hot ops.

The reference's CUDA kernels (SURVEY.md §2.9) become Mosaic kernels here.
XLA's generic gather/scatter is the enemy on TPU (measured ~0.11 G
lookups/s and pathological compile times for the per-voxel depth fetch);
these kernels restructure the memory access into the per-vreg
``dynamic_gather`` forms the VPU actually supports (lane-gather at width
128, sublane-gather at height 8).
"""

from .bilateral import bilateral_filter_pallas
from .integrate import (
    integrate_auto,
    integrate_pallas,
    integrate_color_pallas,
    integrate_pose,
    integrate_warped_pallas,
)

__all__ = [
    "bilateral_filter_pallas",
    "integrate_pallas",
    "integrate_auto",
    "integrate_color_pallas",
    "integrate_pose",
    "integrate_warped_pallas",
]
