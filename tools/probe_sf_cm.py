"""A/B the round-5 chunk-major SceneFusion path vs round 4 at 255^3.

Times the fused step both ways (chunk_major True/False) and, piecewise,
the new extraction + deformation update stages. Verifies device-side
equality of the deform field between paths.

Run: PYTHONPATH=. timeout 2400 python tools/probe_sf_cm.py
Env: SF_CM_ONLY=1 to skip the round-4 path (saves its ~2 min warm load).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera
from tsdf_tpu.ops.marching_cubes import _extract_arrays
from tsdf_tpu.ops.raycast import render_to_depth_image
from tsdf_tpu.pipelines.scenefusion import (
    SceneFusionConfig,
    _sf_step_pallas,
    update_deformation_cubes_cm,
)
from tsdf_tpu.utils import fixtures

W, H = 640, 480


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def _syncable(out):
    o = out[0] if isinstance(out, (tuple, list)) else out
    if hasattr(o, "deform") and o.deform is not None:
        return o.deform
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
t0 = time.time()
depth = jnp.asarray(
    render_to_depth_image(vol, cam, width=W, height=H), jnp.float32
)
sync(depth)
print(f"[setup+claim] {time.time()-t0:.1f}s", flush=True)
flow = jnp.broadcast_to(jnp.array([5.0, 0.0, 0.0], jnp.float32), (H, W, 3))

FAST_CAP = 1 << 16

# --- pieces of the new path -------------------------------------------


@jax.jit
def extract_cm(tsdf, voxel_size, offset):
    return _extract_arrays(
        tsdf, voxel_size, offset,
        max_cubes=FAST_CAP, max_vertices=1,
        layout="masked", tpu_safe=True, return_cube_slots=True,
        chunk_major=True,
    )

soup, (cid, ei, cv, cch, csl, meta) = timeit(
    "extract cm", extract_cm, vol.tsdf, vol.voxel_size, vol.offset
)
print(f"[check] n live cubes = {int(jnp.sum(cv))}", flush=True)

upd_cm = jax.jit(
    lambda v, s, ei, cv, cch, csl, d, f: update_deformation_cubes_cm(
        v, s, ei, cv, cch, csl, meta, d, cam, f
    )
)
timeit("update cm (corr + halo-fold + unchunkify)", upd_cm,
       vol, soup, ei, cv, cch, csl, depth, flow)

# --- fused steps -------------------------------------------------------

step_kw = dict(max_cubes=FAST_CAP, nk=cfg.integrate_nk,
               threshold_mm=cfg.threshold_mm, tpu_safe=True)

new = timeit(
    "sf step NEW (chunk-major)",
    partial(_sf_step_pallas, chunk_major=True, **step_kw),
    vol, depth, flow, cam,
)

if not os.environ.get("SF_CM_ONLY"):
    old = timeit(
        "sf step OLD (round 4)",
        partial(_sf_step_pallas, chunk_major=False, **step_kw),
        vol, depth, flow, cam,
    )
    dd = float(jnp.abs(new[0].deform - old[0].deform).max())
    dt = float(jnp.abs(new[0].tsdf - old[0].tsdf).max())
    print(
        f"[check] n_corr new={int(new[3])} old={int(old[3])}; "
        f"max|deform delta|={dd:.2e} max|tsdf delta|={dt:.2e}",
        flush=True,
    )
