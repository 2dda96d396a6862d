"""Ablate the fused tracked step inside the chunk scan to find where
its ~30 ms/frame goes (isolated components sum to ~9-11 ms).

Variants (all scan 11 frames at 256^3 in ONE dispatch):
  full      — the production body (reference: ~37 ms/frame measured)
  no-icp    — identity pose increment, everything else kept
  no-ray    — model depth := previous raw depth (skip model render)
  no-fuse   — skip the integrate cond
  no-fallb  — banded ICP only, no exact-fallback cond
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels.bilateral import bilateral_filter_pallas
from tsdf_tpu.kernels.integrate import integrate_pallas
from tsdf_tpu.kernels.raycast import raycast_pallas
from tsdf_tpu.pipelines.kinfu import FusionConfig
from tsdf_tpu.tracking.icp import get_incremental_transformation
from tsdf_tpu.utils import fixtures

W, H = 640, 480
CFG = FusionConfig(
    width=W, height=H, use_pallas=True, use_bilateral_filter=True
)


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


scene = fixtures.sphere_tsdf(
    make_volume((256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)), 600.0
)
wall = fixtures.wall_tsdf(scene, 2500.0)
scene = scene.replace(
    tsdf=jnp.minimum(scene.tsdf, wall.tsdf),
    weight=jnp.ones_like(scene.weight),
)
n_kf = 12
cams = [
    Camera.default_depth_camera()
    .move_to([30.0 * t, -20.0 * t, -500.0])
    .look_at([0.0, 0.0, 1500.0])
    for t in [i / (n_kf - 1.0) for i in range(n_kf)]
]


def depth_of(c):
    verts, _ = raycast_pallas(scene, c, W, H)
    pi = c.pose_inv
    wx = jnp.where(jnp.isfinite(verts[..., 0]), verts[..., 0], 0.0)
    wy = jnp.where(jnp.isfinite(verts[..., 1]), verts[..., 1], 0.0)
    wz = jnp.where(jnp.isfinite(verts[..., 2]), verts[..., 2], 0.0)
    camz = pi[2, 0] * wx + pi[2, 1] * wy + pi[2, 2] * wz + pi[2, 3]
    return jnp.where(jnp.isfinite(verts).all(-1), camz, 0.0).astype(
        jnp.float32
    )


frames = jnp.stack([depth_of(c) for c in cams[1:]])
sync(frames)
kvol = make_volume((256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
kvol, _ = integrate_pallas(kvol, depth_of(cams[0]), cams[0], mode="line")
sync(kvol.weight)

K = cams[0].k
FX, FY, CX, CY = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
MIN_INL = CFG.icp_min_inliers_frac * W * H


def make_step(use_icp=True, use_ray=True, use_fuse=True, use_fallb=True,
              use_bilat=True):
    def step(carry, depth):
        vol, camera = carry
        depth_icp = (
            bilateral_filter_pallas(depth, CFG.sigma_colour, CFG.sigma_space)
            if use_bilat else depth
        )
        if use_ray:
            verts, _ = raycast_pallas(vol, camera, W, H)
            pi = camera.pose_inv
            wx = jnp.where(jnp.isfinite(verts[..., 0]), verts[..., 0], 0.0)
            wy = jnp.where(jnp.isfinite(verts[..., 1]), verts[..., 1], 0.0)
            wz = jnp.where(jnp.isfinite(verts[..., 2]), verts[..., 2], 0.0)
            camz = (
                pi[2, 0] * wx + pi[2, 1] * wy + pi[2, 2] * wz + pi[2, 3]
            )
            model_depth = jnp.where(
                jnp.isfinite(verts).all(-1), camz, 0.0
            )
        else:
            model_depth = depth * 0.999  # stand-in, keeps ICP honest

        if use_icp:
            res = get_incremental_transformation(
                depth_icp, model_depth, FX, FY, CX, CY, band=32
            )
            if use_fallb:
                def exact(_):
                    r = get_incremental_transformation(
                        depth_icp, model_depth, FX, FY, CX, CY, band=None
                    )
                    return r.pose, r.error, r.inliers

                pose_inc, err, inl = jax.lax.cond(
                    res.inliers < MIN_INL,
                    exact,
                    lambda _: (res.pose, res.error, res.inliers),
                    None,
                )
            else:
                pose_inc, err, inl = res.pose, res.error, res.inliers
        else:
            pose_inc = jnp.eye(4, dtype=jnp.float32)
            err = jnp.float32(0.0)
            inl = jnp.float32(1e9)

        lost = inl < MIN_INL
        pose_inc = jnp.where(lost, jnp.eye(4, dtype=jnp.float32), pose_inc)
        camera = camera.set_pose(camera.pose @ pose_inc)

        if use_fuse:
            def fuse(vol):
                return integrate_pallas(vol, depth, camera, mode="line")

            vol, miss = jax.lax.cond(
                jnp.logical_not(lost), fuse,
                lambda v: (v, jnp.int32(0)), vol,
            )
        return (vol, camera), err

    @jax.jit
    def run(vol, camera, frames):
        (vol, camera), errs = jax.lax.scan(step, (vol, camera), frames)
        return vol.weight.sum() + errs.sum()

    return run


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    variants = [
        ("full     ", make_step()),
        ("no-fallb ", make_step(use_fallb=False)),
        ("no-icp   ", make_step(use_icp=False)),
        ("no-ray   ", make_step(use_ray=False)),
        ("no-fuse  ", make_step(use_fuse=False)),
        ("no-bilat ", make_step(use_bilat=False)),
    ]
    for label, run in variants:
        t0 = time.perf_counter()
        sync(run(kvol, cams[0], frames))
        print(f"{label} compile+first: {time.perf_counter()-t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(kvol, cams[0], frames))
            ts.append(time.perf_counter() - t0)
        print(
            f"{label}: {np.median(ts)/11*1e3:6.2f} ms/frame",
            flush=True,
        )
