"""Differentiable raycast: gradient checks + pose recovery (config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.ops.raycast_diff import depth_image_diff, raycast_diff
from tsdf_tpu.utils import fixtures
from tsdf_tpu.utils.se3 import se3_exp

W, H = 80, 60
FX, FY, CX, CY = 591.1 / 8, 590.1 / 8, 331.0 / 8, 234.6 / 8


def _scene():
    vol = make_volume((48, 48, 48), 2000.0, offset=(-1000.0, -1000.0, 0.0))
    wall = fixtures.wall_tsdf(vol, 1500.0)
    s1 = fixtures.sphere_tsdf(vol, 380.0, centre=(150.0, -100.0, 900.0))
    return vol.replace(
        tsdf=jnp.minimum(wall.tsdf, s1.tsdf),
        weight=jnp.ones_like(vol.weight),
    )


def _camera():
    return (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([0.0, 0.0, -400.0])
        .look_at([0.0, 0.0, 1000.0])
    )


def _eroded_mask(hit, depth=None, max_jump=30.0):
    """5x5 erosion of silhouettes and occlusion boundaries: the loss is
    only smooth where neighbouring rays hit the same surface patch."""
    h = np.asarray(hit).copy()
    if depth is not None:
        d = np.asarray(depth)
        lo = d.copy()
        hi = d.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                r = np.roll(np.roll(d, dy, 0), dx, 1)
                lo = np.minimum(lo, r)
                hi = np.maximum(hi, r)
        h &= (hi - lo) < max_jump
    out = h.copy()
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            out &= np.roll(np.roll(h, dy, 0), dx, 1)
    out[0:2, :] = out[-2:, :] = False
    out[:, 0:2] = out[:, -2:] = False
    return jnp.asarray(out)


def test_pose_gradient_matches_finite_difference():
    vol = _scene()
    cam = _camera()
    d0, hit0 = depth_image_diff(vol, cam, W, H, max_steps=256)
    mask = _eroded_mask(hit0, d0)  # fixed interior mask: smooth loss

    def loss(xi):
        c = cam.set_pose(se3_exp(xi) @ cam.pose)
        depth, _hit = depth_image_diff(vol, c, W, H, max_steps=256)
        return jnp.sum(jnp.where(mask, depth, 0.0)) / 1e3

    def loss_f64(xi):
        # f32 on-device summation noise swamps small finite differences;
        # sum the (f32) depth image in f64 on the host instead
        c = cam.set_pose(se3_exp(xi) @ cam.pose)
        depth, _hit = depth_image_diff(vol, c, W, H, max_steps=256)
        d = np.asarray(depth, np.float64)
        return d[np.asarray(mask)].sum() / 1e3

    xi0 = jnp.zeros(6, jnp.float32)
    g = jax.grad(loss)(xi0)
    assert np.all(np.isfinite(np.asarray(g)))
    for i in range(6):
        eps = 1e-4 if i < 3 else 0.03
        e = jnp.zeros(6).at[i].set(eps)
        fd = (loss_f64(e) - loss_f64(-e)) / (2 * eps)
        gi = float(g[i])
        # 10% relative, with an absolute floor well below the dominant
        # components' scale (~180) for near-zero gradients like roll
        assert abs(fd - gi) < max(0.1 * max(abs(fd), abs(gi)), 0.5), (
            i, fd, gi,
        )


def test_tsdf_gradient_is_scattered_to_taps():
    vol = _scene()
    cam = _camera()

    def loss(tsdf):
        v = vol.replace(tsdf=tsdf)
        depth, hit = depth_image_diff(v, cam, W, H, max_steps=256)
        return jnp.sum(depth)

    g = jax.grad(loss)(vol.tsdf)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    nz = (g != 0).sum()
    assert nz > 100  # gradient lands on voxels near the surface
    # and only near the surface: voxels with |tsdf| == trunc are mostly
    # untouched except trilinear-neighbourhood effects
    far = np.asarray(jnp.abs(vol.tsdf) >= float(vol.truncation_distance))
    assert (g[far] != 0).mean() < 0.05


def test_pose_recovery_by_gradient_descent():
    vol = _scene()
    cam_true = _camera()
    target, _ = depth_image_diff(vol, cam_true, W, H, max_steps=256)

    xi_perturb = jnp.array([0.01, -0.008, 0.005, 20.0, -15.0, 10.0])
    cam0 = cam_true.set_pose(se3_exp(xi_perturb) @ cam_true.pose)

    def loss(xi):
        c = cam0.set_pose(se3_exp(xi) @ cam0.pose)
        depth, hit = depth_image_diff(vol, c, W, H, max_steps=256)
        m = hit & (target > 0)
        return jnp.sum(jnp.where(m, (depth - target) ** 2, 0.0)) / jnp.sum(m)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    xi = jnp.zeros(6, jnp.float32)
    l0 = float(loss(xi))
    # simple diagonal-preconditioned GD: rotations vs translations scale
    lr = jnp.array([1e-8] * 3 + [1e-2] * 3)
    for _ in range(150):
        val, g = grad_fn(xi)
        xi = xi - lr * g
    l1 = float(loss(xi))
    assert l1 < 0.2 * l0, (l0, l1)
    # pose error shrank vs the initial perturbation
    t_rec = se3_exp(xi) @ cam0.pose
    terr0 = np.linalg.norm(np.asarray(cam0.pose - cam_true.pose)[:3, 3])
    terr1 = np.linalg.norm(np.asarray(t_rec - cam_true.pose)[:3, 3])
    assert terr1 < 0.5 * terr0, (terr0, terr1)
