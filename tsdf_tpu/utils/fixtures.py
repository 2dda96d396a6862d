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


def _axis_centres(vol: TSDFVolume):
    """Per-axis voxel-centre vectors (z, y, x) — the separable form of
    voxel_centres(): building the full (Z, Y, X, 3) grid costs 3 volume
    buffers (5.4 GB at 768³) and OOMs the chip at config-5 scale."""
    sz, sy, sx = vol.tsdf.shape
    vs = vol.voxel_size
    off = vol.offset
    zc = off[2] + (jnp.arange(sz, dtype=jnp.float32) + 0.5) * vs[2]
    yc = off[1] + (jnp.arange(sy, dtype=jnp.float32) + 0.5) * vs[1]
    xc = off[0] + (jnp.arange(sx, dtype=jnp.float32) + 0.5) * vs[0]
    return zc, yc, xc


def sphere_tsdf(vol: TSDFVolume, radius: float, centre=None) -> TSDFVolume:
    """Exact clamped signed distance to a sphere, weights=1.

    ref: create_sphere_in_TSDF TestHelpers.cpp:18-61.
    """
    if centre is None:
        centre = vol.offset + vol.physical_size / 2.0
    centre = jnp.asarray(centre, jnp.float32)
    zc, yc, xc = _axis_centres(vol)
    d2 = (
        ((zc - centre[2]) ** 2)[:, None, None]
        + ((yc - centre[1]) ** 2)[None, :, None]
        + ((xc - centre[0]) ** 2)[None, None, :]
    )
    dist = jnp.sqrt(d2) - radius
    trunc = vol.truncation_distance
    dist = jnp.clip(dist, -trunc, trunc)
    return vol.replace(tsdf=dist, weight=jnp.ones_like(vol.weight))


def wall_tsdf(vol: TSDFVolume, depth: float) -> TSDFVolume:
    """Clamped signed distance to the plane z = depth.

    ref: create_wall_in_TSDF TestHelpers.cpp:63-99.
    """
    zc, _yc, _xc = _axis_centres(vol)
    sz, sy, sx = vol.tsdf.shape
    trunc = vol.truncation_distance
    dist = jnp.clip(depth - zc, -trunc, trunc)
    dist = jnp.broadcast_to(dist[:, None, None], (sz, sy, sx))
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


def kinect_noise(
    depth: jnp.ndarray,
    key,
    sigma_scale: float = 1.425e-6,
    edge_thresh_mm: float = 50.0,
    shadow_px: int = 4,
    dropout_frac: float = 0.002,
) -> jnp.ndarray:
    """Kinect-realistic corruption of a clean mm depth frame (round-3
    verdict item 5: the synthetic acceptance workloads are noise-free,
    overstating tracking robustness vs the reference's real TUM frames,
    ref: Test_TSDF_Integration.cpp:30-43).

    Models, in sensor order:
      1. depth-dependent Gaussian noise: sigma_z = sigma_scale * z^2 mm
         (Khoshelham & Elberink's Kinect axial model, ~3 mm at 1.5 m);
      2. IR shadow dropouts: pixels within ``shadow_px`` on the
         -x side of a strong depth discontinuity (> edge_thresh_mm)
         report 0 (the projector is offset from the IR camera along x);
      3. salt dropouts: ``dropout_frac`` random invalid pixels;
      4. u16 storage quantization through the TUM x5000 round-trip:
         u16 = round(z_m * 5000) -> z_mm = u16 * 0.2
         (ref: TUMDataLoader.cpp:96-98).

    Returns the corrupted (H, W) f32 mm frame (0 = invalid).
    """
    import jax

    d = jnp.asarray(depth, jnp.float32)
    h, w = d.shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0) if key is None else key)

    valid = d > 0
    # 1. axial noise
    sigma = sigma_scale * d * d
    d = jnp.where(valid, d + sigma * jax.random.normal(k1, d.shape), 0.0)

    # 2. edge shadows: right-neighbour jump -> shadow extends shadow_px
    # to the left of the nearer side
    dx = jnp.abs(jnp.pad(d[:, 1:], ((0, 0), (0, 1))) - d)
    edge = (dx > edge_thresh_mm) & valid
    shadow = jnp.zeros_like(edge)
    # s=1..shadow_px so the full shadow_px pixels BEYOND the edge pixel
    # are shadowed (s=0 would re-mark the edge pixel itself and leave
    # the shadow one pixel short of the documented width)
    for s in range(1, shadow_px + 1):
        shifted = jnp.pad(edge[:, s:], ((0, 0), (0, s)))
        shadow = shadow | shifted
    d = jnp.where(shadow, 0.0, d)

    # 3. salt dropouts
    drop = jax.random.uniform(k2, d.shape) < dropout_frac
    d = jnp.where(drop, 0.0, d)

    # 4. TUM u16 x5000 round-trip (0.2 mm quantization, 13.1 m cap)
    u16 = jnp.clip(jnp.round(d * 5.0), 0, 65535)
    return (u16 * 0.2).astype(jnp.float32)
