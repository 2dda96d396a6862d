"""Measure the chunked tracked-fusion loop at the bench config.

Same scene/trajectory as bench.py's kinfu section (256^3, 640x480,
12 frames): per-frame dispatch path vs the track_chunk scan."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import dataclasses

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels.raycast import raycast_pallas
from tsdf_tpu.pipelines import FusionConfig, track_and_fuse_frames
from tsdf_tpu.utils import fixtures

W, H = 640, 480


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


frames = [depth_of(c) for c in cams]
sync(frames[-1])
kvol = make_volume((256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
base = FusionConfig(
    width=W, height=H, use_pallas=True, use_bilateral_filter=True,
)

for label, cfg in (
    ("chunk=11 (one dispatch) ", dataclasses.replace(base, track_chunk=11)),
    ("chunk=8 (default)       ", dataclasses.replace(base, track_chunk=8)),
    ("per-frame (track_chunk=1)", dataclasses.replace(base, track_chunk=1)),
):
    v2, *_ = track_and_fuse_frames(kvol, cams[0], frames[:2], cfg)
    sync(v2.weight)  # warm the compile
    per = []
    for _ in range(3):
        t0 = time.perf_counter()
        vfin, cam_fin, poses, stats = track_and_fuse_frames(
            kvol, cams[0], frames, cfg
        )
        sync(vfin.weight)
        per.append((time.perf_counter() - t0) / len(frames) * 1e3)
    err, inl = stats[-1]
    print(
        f"{label}: {float(np.median(per)):6.2f} ms/frame "
        f"(runs {['%.1f' % p for p in per]}), err {float(err):.2f} mm, "
        f"inl {int(inl)}",
        flush=True,
    )
