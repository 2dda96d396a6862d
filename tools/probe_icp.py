"""A/B the banded-ICP roll sweep: adaptive dy bounds vs fixed band."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from functools import partial

from tsdf_tpu.tracking import icp as icp_mod
from tsdf_tpu.tracking.icp import (
    depth_pyramid, get_incremental_transformation, icp_step_banded,
    vertex_map, normal_map, level_intrinsics,
)

W, H = 640, 480
FX, FY, CX, CY = 591.1, 590.1, 331.0, 234.6


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


# synthetic smooth depth pair with small motion
ys, xs = np.mgrid[0:H, 0:W]
d_prev = (1500 + 200*np.sin(xs/80.0) + 150*np.cos(ys/60.0)).astype(np.float32)
d_curr = np.roll(d_prev, 2, axis=0) + 1.0  # ~2 px vertical shift
dp = jnp.asarray(d_prev); dc = jnp.asarray(d_curr)


@partial(jax.jit, static_argnames=("adaptive", "iters"))
def run_level0(dc, dp, adaptive, iters=10):
    vc = vertex_map(dc, FX, FY, CX, CY)
    nc = normal_map(vc)
    def body(i, pose):
        A, b, _r, _n = icp_step_banded(
            pose[0:3, 0:3], pose[0:3, 3], vc, nc, dp,
            FX, FY, CX, CY, band=32, adaptive=adaptive,
        )
        A = A + 1e-6 * jnp.eye(6)
        up = jnp.linalg.solve(A, b)
        up = jnp.where(jnp.isfinite(up), up, 0.0)
        from tsdf_tpu.utils.se3 import se3_exp
        return se3_exp(jnp.concatenate([up[3:6], up[0:3]])) @ pose
    return jax.lax.fori_loop(0, iters, body, jnp.eye(4, dtype=jnp.float32))


for adaptive in (False, True):
    out = run_level0(dc, dp, adaptive)
    sync(out)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = run_level0(dc, dp, adaptive)
        sync(out)
        ts.append(time.time() - t0)
    print(f"level0 x10 adaptive={adaptive}: {np.median(ts)*1e3:.1f} ms", flush=True)

for band, adaptive in ((None, False), (32, False), (32, True)):
    r = get_incremental_transformation(
        dc, dp, FX, FY, CX, CY, band=band, adaptive=adaptive
    )
    sync(r.pose)
    ts = []
    for _ in range(5):
        t0 = time.time()
        r = get_incremental_transformation(
            dc, dp, FX, FY, CX, CY, band=band, adaptive=adaptive
        )
        sync(r.pose)
        ts.append(time.time() - t0)
    print(
        f"full pyramid band={band} adaptive={adaptive}: "
        f"{np.median(ts)*1e3:.1f} ms (err {float(r.error):.2f}, "
        f"inl {int(r.inliers)})",
        flush=True,
    )
