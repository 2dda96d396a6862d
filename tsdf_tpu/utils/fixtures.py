"""Synthetic analytic scenes for testing.

Modeled on the reference test helpers (ref:
src/Tests/TestTSDF/TestHelpers.cpp:18-209) but with *asserted* properties
in mind: exact clamped signed distance fields and analytic depth maps so
tests can bound SDF error and check raycast hits against closed-form
intersections. NB the reference computes the sphere centre as
``(offset + physical_size) / 2`` (TestHelpers.cpp:27) — an apparent slip;
we use the intended volume centre ``offset + physical_size / 2``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..volume import TSDFVolume


def sphere_tsdf(vol: TSDFVolume, radius: float, centre=None) -> TSDFVolume:
    """Exact clamped signed distance to a sphere, weights=1.

    ref: create_sphere_in_TSDF TestHelpers.cpp:18-61.
    """
    if centre is None:
        centre = vol.offset + vol.physical_size / 2.0
    centre = jnp.asarray(centre, jnp.float32)
    centres = vol.voxel_centres()
    dist = jnp.linalg.norm(centres - centre, axis=-1) - radius
    trunc = vol.truncation_distance
    dist = jnp.clip(dist, -trunc, trunc)
    return vol.replace(tsdf=dist, weight=jnp.ones_like(vol.weight))


def wall_tsdf(vol: TSDFVolume, depth: float) -> TSDFVolume:
    """Clamped signed distance to the plane z = depth.

    ref: create_wall_in_TSDF TestHelpers.cpp:63-99.
    """
    centres = vol.voxel_centres()
    dist = depth - centres[..., 2]
    trunc = vol.truncation_distance
    dist = jnp.clip(dist, -trunc, trunc)
    return vol.replace(tsdf=dist, weight=jnp.ones_like(vol.weight))


def sphere_depth_map(
    width: int,
    height: int,
    radius: float,
    min_depth: float,
    max_depth: float,
) -> np.ndarray:
    """u16 (H, W) depth map of an orthographic sphere bump.

    ref: make_sphere_depth_map TestHelpers.cpp:145-183.
    """
    min_depth, max_depth = sorted((min_depth, max_depth))
    cx, cy = width / 2.0, height / 2.0
    ys, xs = np.mgrid[0:height, 0:width]
    dx2 = (cx - xs) ** 2
    dy2 = (cy - ys) ** 2
    r2 = radius * radius
    inside = dx2 + dy2 < r2
    dz = np.sqrt(np.maximum(r2 - (dx2 + dy2), 0.0))
    depth_centre = min_depth + (max_depth - min_depth) / 2.0
    depth = np.where(
        inside,
        np.clip(depth_centre - dz, min_depth, max_depth),
        0.0,
    )
    return depth.astype(np.uint16)


def wall_depth_map(
    width: int,
    height: int,
    max_depth: float,
    min_depth: float,
    wall_depth: float,
) -> np.ndarray:
    """u16 (H, W): background at max_depth with a centred wall rectangle.

    ref: make_wall_depth_map TestHelpers.cpp:185-209.
    """
    ys, xs = np.mgrid[0:height, 0:width]
    wall = (
        (xs > (width // 5) * 2)
        & (xs < (width // 5) * 3)
        & (ys > (height // 5) * 2)
        & (ys < (height // 5) * 3)
    )
    depth = np.where(wall, wall_depth, max_depth)
    return np.clip(depth, min_depth, max_depth).astype(np.uint16)
