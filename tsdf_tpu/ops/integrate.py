"""Depth-frame integration into the TSDF volume.

TPU-native re-design of ``integrate_kernel``
(ref: src/TSDF/TSDFVolume.cu:308-392, host wrapper :860-902). The reference
launches one CUDA thread per (y, z) voxel column with a serial x loop; here
the whole update is one fused dense XLA computation over the (Z, Y, X)
grid: project every voxel centre into the depth image, gather the depth,
form the projective TSDF and fold it into the running weighted mean. The
depth lookup is a single XLA gather; everything else fuses into it, so the
op is HBM-bandwidth bound (read tsdf+weight, write tsdf+weight) — the
speed-of-light for this update.

Math per voxel (identical to the reference):
  * deformed centre c (world, mm) -> pixel p = round(K @ (pose_inv @ c));
  * gate: p inside the image and depth(p) > 0
    (ref: TSDFVolume.cu:349-356);
  * projective sdf = depth(p) - cam_z(c)  — camera-z distance, not
    euclidean (ref: :359-363; pixel_to_camera's z equals the raw depth
    because K^-1's bottom row is (0,0,1));
  * discard if sdf < -trunc; clamp positive side to +trunc (ref: :365-372);
  * running mean: d' = (d*w + tsdf)/(w+1), w' = w+1 (ref: :374-384 — the
    max_weight clamp is commented out there; pass ``cap_weight=True`` to
    enable the intended clamp).

Differentiability: the op is differentiable w.r.t. the volume arrays and
the camera pose/intrinsics out of the box (round() has zero gradient, so
pose gradients flow through cam_z — the projective-SDF term — which is the
dominant, well-conditioned term).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..camera import Camera
from ..volume import TSDFVolume


def integrate(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    cap_weight: bool = False,
    rgb: jnp.ndarray | None = None,
) -> TSDFVolume:
    """Fuse one depth frame into the volume.

    Args:
      vol: the volume pytree.
      depth: (H, W) depth in mm; u16 or f32. Zero means no data.
      camera: Camera with pose = camera->world.
      cap_weight: clamp the accumulated weight at vol.max_weight (the
        reference's intended-but-disabled behaviour, TSDFVolume.cu:378).
      rgb: optional (H, W, 3) u8 colour frame. The reference allocates
        and serializes per-voxel colour but no kernel ever writes it
        (SURVEY.md §2.1); here the intended capability is real: voxels
        within the truncation band of the observed surface fold the
        pixel colour into the same running mean. Requires vol.color
        (see TSDFVolume.with_color()).

    Returns:
      Updated volume (same structure; tsdf/weight and optionally color
      change).
    """
    depth = jnp.asarray(depth)
    h, w = depth.shape
    depth_f = depth.astype(jnp.float32).ravel()

    centres = vol.deformed_centres()  # (Z, Y, X, 3) world mm

    # world -> camera (rigid pose: no perspective divide needed).
    cam = (
        centres @ camera.pose_inv[0:3, 0:3].T + camera.pose_inv[0:3, 3]
    )  # (Z, Y, X, 3)

    # camera -> pixel, rounded to ints (ref: world_to_pixel,
    # cuda_coordinate_transforms.cu:10-30).
    img = cam @ camera.k.T
    px = jnp.round(img[..., 0] / img[..., 2]).astype(jnp.int32)
    py = jnp.round(img[..., 1] / img[..., 2]).astype(jnp.int32)

    in_frustum = (px >= 0) & (px < w) & (py >= 0) & (py < h)

    lin = jnp.clip(py, 0, h - 1) * w + jnp.clip(px, 0, w - 1)
    surface_depth = jnp.take(depth_f, lin, axis=0)  # (Z, Y, X)

    sdf = surface_depth - cam[..., 2]
    trunc = vol.truncation_distance
    # The cam-z > 0 gate is absent in the reference (world_to_pixel has
    # no z check): voxels BEHIND the camera can double-sign-flip into the
    # frame and receive spurious free-space updates whenever the camera
    # is inside the volume. Intended math includes the gate.
    update = (
        in_frustum & (cam[..., 2] > 0) & (surface_depth > 0)
        & (sdf >= -trunc)
    )

    # Positive-side truncation only (negative side already gated at -trunc,
    # ref: TSDFVolume.cu:365-372).
    tsdf_obs = jnp.minimum(sdf, trunc)

    # Compute in f32 regardless of the storage dtype (bf16 volumes store
    # half the HBM bytes; the update math must not run at 8-bit mantissa).
    prior_d = vol.tsdf.astype(jnp.float32)
    prior_w = vol.weight.astype(jnp.float32)
    new_w = prior_w + 1.0
    new_d = (prior_d * prior_w + tsdf_obs) / new_w
    if cap_weight:
        new_w = jnp.minimum(new_w, vol.max_weight)

    new_color = vol.color
    if rgb is not None:
        if vol.color is None:
            raise ValueError(
                "colour frame given but the volume has no colour field; "
                "use make_volume(with_color=True) / vol.with_color()"
            )
        rgb = jnp.asarray(rgb)
        if rgb.shape[:2] != depth.shape[:2]:
            raise ValueError(
                f"colour frame {rgb.shape[:2]} does not match depth "
                f"{depth.shape[:2]}; the flat pixel index would fuse "
                "wrong colours"
            )
        rgb_f = rgb.astype(jnp.float32).reshape(-1, 3)
        surf_rgb = jnp.take(rgb_f, lin, axis=0)  # (Z, Y, X, 3)
        # colour only within the truncation band (a free-space voxel
        # should not take the colour of the surface behind it). The TSDF
        # weight also counts band-less (free-space) observations, so a
        # weighted mean over it would starve late-appearing surfaces —
        # blend with a floored rate instead (converges within ~max_weight
        # colour observations regardless of prior free-space weight).
        col_update = (update & (jnp.abs(sdf) < trunc))[..., None]
        old = vol.color.astype(jnp.float32)
        rate = jnp.maximum(1.0 / new_w, 1.0 / vol.max_weight)[..., None]
        blended = old + rate * (surf_rgb - old)
        new_color = jnp.clip(
            jnp.round(jnp.where(col_update, blended, old)), 0, 255
        ).astype(jnp.uint8)

    return vol.replace(
        tsdf=jnp.where(update, new_d, prior_d).astype(vol.tsdf.dtype),
        weight=jnp.where(update, new_w, prior_w).astype(vol.weight.dtype),
        color=new_color,
    )
