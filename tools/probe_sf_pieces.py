"""Piecewise timing of the fused SceneFusion frame at 255^3.

Times each stage in its own jit (warm): masked extract (chunked MC),
the slot-stream deformation update (old), the cube-corner deformation
update (new), and the warped Pallas integrate.

Run: PYTHONPATH=. timeout 1700 python tools/probe_sf_pieces.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera
from tsdf_tpu.kernels.integrate import integrate_warped_pallas
from tsdf_tpu.ops.marching_cubes import _extract_arrays
from tsdf_tpu.ops.raycast import render_to_depth_image
from tsdf_tpu.pipelines.scenefusion import (
    SceneFusionConfig,
    update_deformation,
    update_deformation_cubes,
)
from tsdf_tpu.utils import fixtures

W, H = 640, 480


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def _syncable(out):
    o = out[0] if isinstance(out, (tuple, list)) else out
    if hasattr(o, "tsdf"):
        return o.tsdf
    if hasattr(o, "vertices"):
        return o.vertices
    return o


def timeit(name, fn, *args, reps=4):
    t0 = time.time()
    out = fn(*args)
    sync(_syncable(out))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(_syncable(out))
        ts.append(time.time() - t0)
    print(
        f"[{name}] compile+first={tc:.1f}s median={np.median(ts)*1e3:.1f}ms",
        flush=True,
    )
    return out


cfg = SceneFusionConfig()
vol = cfg.make_volume()
vol = fixtures.sphere_tsdf(vol, 500.0, centre=(0.0, 0.0, 1300.0))
cam = (
    Camera.default_depth_camera()
    .move_to([0.0, 0.0, 100.0])
    .look_at([0.0, 0.0, 1300.0])
)
depth = jnp.asarray(
    render_to_depth_image(vol, cam, width=W, height=H), jnp.float32
)
sync(depth)
flow = jnp.broadcast_to(jnp.array([5.0, 0.0, 0.0], jnp.float32), (H, W, 3))


@partial(jax.jit, static_argnames=())
def extract(tsdf, voxel_size, offset):
    return _extract_arrays(
        tsdf, voxel_size, offset,
        max_cubes=cfg.max_cubes, max_vertices=1,
        layout="masked", tpu_safe=True, return_cube_slots=True,
    )


soup, (cid, edge_idx, cube_valid) = timeit(
    "extract masked (chunked)", extract, vol.tsdf, vol.voxel_size,
    vol.offset,
)

upd_old = jax.jit(
    lambda v, s, d, f: update_deformation(v, s, d, cam, f, tpu_safe=True)
)
timeit("update_deformation slot-stream (old)", upd_old, vol, soup,
       depth, flow)

upd_new = jax.jit(
    lambda v, s, ci, ei, cv, d, f: update_deformation_cubes(
        v, s, ci, ei, cv, d, cam, f
    )
)
vol2, n_corr = timeit("update_deformation cube-corner (new)", upd_new,
                      vol, soup, cid, edge_idx, cube_valid, depth, flow)
print(f"[check] n_corr new path = {int(n_corr)}", flush=True)
vol3, n_corr_old = upd_old(vol, soup, depth, flow)
err = float(jnp.abs(vol2.deform - vol3.deform).max())
print(
    f"[check] n_corr old={int(n_corr_old)}; max |deform delta| "
    f"new-vs-old = {err:.2e} mm",
    flush=True,
)

integ = jax.jit(
    lambda v, d: integrate_warped_pallas(v, d, cam, nk=cfg.integrate_nk)
)
timeit("integrate_warped_pallas", integ, vol2, depth)
