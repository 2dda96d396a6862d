"""Differentiable fusion: the pose gradient of the integrate operator.

The integrate op itself is differentiable through XLA (the lax path in
ops/integrate.py), but its depth lookup is a rounded nearest-pixel read:
``round()`` has zero gradient, so AD sees only the projective-SDF term
(-cam_z) and is blind to the image-space term — the depth gradient under
the moving projection — which carries most of the alignment signal for
pose optimization THROUGH fusion. This module defines the analytic
6-twist gradient with both terms (semantics reference, plain jnp); the
production path is the Pallas backward in kernels/integrate.py
(``integrate_pose``), equality-gated against this.

Convention: ``pose_gradient_lax`` returns the LEFT-twist gradient at the
current pose (T' = se3_exp(delta) @ T at delta = 0; (omega, v) packing
of utils/se3.py) — it equals jax.grad through ``se3_exp(delta) @ pose``
at delta = 0. The production ``integrate_pose`` emits the raw pose_inv
MATRIX cotangent instead and lets AD chain through se3_exp / the 4x4
inverse, so its jax.grad is exact at ANY delta.

Adjoint math per voxel (x_w its world centre, x_c = T^-1 x_w):
  d x_c / d v_j     = -R_wc e_j
  d x_c / d omega_j = -R_wc (e_j x x_w)
  d px = fx (dXc Zc - Xc dZc) / Zc^2,   d py analog
  d sdf = [Gx(p) d px + Gy(p) d py]  -  dZc
            (image term; Gx/Gy central differences of the depth frame)
  d new_d / d sdf = update & (sdf < trunc) / (w + 1)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..camera import Camera
from ..volume import TSDFVolume


def depth_image_gradients(depth: jnp.ndarray):
    """(Gx, Gy) central differences of the depth frame in mm/px.

    Pixels adjacent to a no-data (zero) sample get zero gradient — depth
    discontinuities and silhouettes carry no usable image term.
    """
    d = jnp.asarray(depth, jnp.float32)
    valid = d > 0
    left = jnp.pad(d, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(d, ((0, 0), (0, 1)))[:, 1:]
    up = jnp.pad(d, ((1, 0), (0, 0)))[:-1, :]
    down = jnp.pad(d, ((0, 1), (0, 0)))[1:, :]
    vl = jnp.pad(valid, ((0, 0), (1, 0)))[:, :-1]
    vr = jnp.pad(valid, ((0, 0), (0, 1)))[:, 1:]
    vu = jnp.pad(valid, ((1, 0), (0, 0)))[:-1, :]
    vd = jnp.pad(valid, ((0, 1), (0, 0)))[1:, :]
    gx = jnp.where(valid & vl & vr, (right - left) * 0.5, 0.0)
    gy = jnp.where(valid & vu & vd, (down - up) * 0.5, 0.0)
    return gx, gy


def pose_gradient_lax(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    gbar_tsdf: jnp.ndarray,
    image_term: bool = True,
) -> jnp.ndarray:
    """Analytic d<gbar_tsdf, new_tsdf>/d delta at delta = 0 — (6,) twist
    (omega, v). The lax semantics reference for the Pallas backward."""
    depth = jnp.asarray(depth, jnp.float32)
    h, w_img = depth.shape
    depth_f = depth.ravel()
    gx_img, gy_img = depth_image_gradients(depth)

    centres = vol.deformed_centres()  # (Z, Y, X, 3)
    rwc = camera.pose_inv[0:3, 0:3]
    cam = centres @ rwc.T + camera.pose_inv[0:3, 3]
    k = camera.k
    fx, fy = k[0, 0], k[1, 1]
    img = cam @ k.T
    px = jnp.round(img[..., 0] / img[..., 2]).astype(jnp.int32)
    py = jnp.round(img[..., 1] / img[..., 2]).astype(jnp.int32)
    in_frustum = (px >= 0) & (px < w_img) & (py >= 0) & (py < h)
    lin = jnp.clip(py, 0, h - 1) * w_img + jnp.clip(px, 0, w_img - 1)
    d_obs = jnp.take(depth_f, lin, axis=0)
    gxv = jnp.take(gx_img.ravel(), lin, axis=0)
    gyv = jnp.take(gy_img.ravel(), lin, axis=0)

    zc = cam[..., 2]
    sdf = d_obs - zc
    trunc = vol.truncation_distance
    update = (
        in_frustum & (zc > 0) & (d_obs > 0) & (sdf >= -trunc)
    )
    band = sdf < trunc  # the min(sdf, trunc) clamp's derivative
    coef = (
        jnp.asarray(gbar_tsdf, jnp.float32)
        * (update & band).astype(jnp.float32)
        / (vol.weight.astype(jnp.float32) + 1.0)
    )

    xc, yc = cam[..., 0], cam[..., 1]
    # Zc == 0 exactly would produce 0 * inf = NaN through the masked
    # multiply (coef is already zero there via the update gate)
    zc2 = jnp.where(zc > 0, zc * zc, 1.0)
    xw = centres[..., 0]
    yw = centres[..., 1]
    zw = centres[..., 2]
    grads = []
    for j in range(6):
        if j < 3:  # omega_j: d x_w_pert = e_j x x_w
            if j == 0:
                ex, ey, ez = jnp.zeros_like(xw), -zw, yw
            elif j == 1:
                ex, ey, ez = zw, jnp.zeros_like(xw), -xw
            else:
                ex, ey, ez = -yw, xw, jnp.zeros_like(xw)
        else:  # v_j: d x_w_pert = e_j
            ex = jnp.full_like(xw, 1.0 if j == 3 else 0.0)
            ey = jnp.full_like(xw, 1.0 if j == 4 else 0.0)
            ez = jnp.full_like(xw, 1.0 if j == 5 else 0.0)
        dxc = -(rwc[0, 0] * ex + rwc[0, 1] * ey + rwc[0, 2] * ez)
        dyc = -(rwc[1, 0] * ex + rwc[1, 1] * ey + rwc[1, 2] * ez)
        dzc = -(rwc[2, 0] * ex + rwc[2, 1] * ey + rwc[2, 2] * ez)
        dsdf = -dzc
        if image_term:
            dpx = fx * (dxc * zc - xc * dzc) / zc2
            dpy = fy * (dyc * zc - yc * dzc) / zc2
            dsdf = dsdf + gxv * dpx + gyv * dpy
        grads.append(jnp.sum(coef * dsdf))
    return jnp.stack(grads)
