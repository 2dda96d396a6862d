"""Chained-loop stage timing for the chunk-major SF path (255^3).

Each stage is dispatched N times back-to-back with ONE device sync at
the end: the ~25 ms tunnel round-trip that poisoned every single-sync
stage probe (round-4's decomposition included) amortizes to ~2.5 ms at
N=10 and the loop slope is the real device cost.

Run: PYTHONPATH=. timeout 2400 python tools/probe_sf_cm3.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera
from tsdf_tpu.ops.marching_cubes import (
    _chunk_front,
    _chunked_compact,
    _chunked_compact_cm,
    _extract_arrays,
)
from tsdf_tpu.ops.raycast import render_to_depth_image
from tsdf_tpu.pipelines.scenefusion import (
    SceneFusionConfig,
    _sf_step_pallas,
    _slot_correspondence,
    update_deformation_cubes,
)
from tsdf_tpu.utils import fixtures

W, H = 640, 480
FAST_CAP = 1 << 16
N = 10


def _leaf(out):
    if isinstance(out, (tuple, list)):
        return _leaf(out[0])
    if isinstance(out, dict):
        return _leaf(out["t_r"])
    if hasattr(out, "tsdf"):
        return out.tsdf
    if hasattr(out, "vertices"):
        return out.vertices
    return out


def sync(x):
    x = jnp.asarray(x, jnp.float32)
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    sync(_leaf(out))
    tc = time.time() - t0
    out = fn(*args)
    sync(_leaf(out))
    t0 = time.time()
    for _ in range(N):
        out = fn(*args)
    sync(_leaf(out))
    dt = (time.time() - t0) / N * 1e3
    print(f"[{name}] compile={tc:.1f}s loop={dt:.1f}ms/iter", flush=True)
    return out


cfg = SceneFusionConfig()
vol = fixtures.sphere_tsdf(
    cfg.make_volume(), 500.0, centre=(0.0, 0.0, 1300.0)
)
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
print(f"[setup+claim] {time.time()-t0:.1f}s  nk={cfg.integrate_nk}",
      flush=True)
flow = jnp.broadcast_to(jnp.array([5.0, 0.0, 0.0], jnp.float32), (H, W, 3))

timeit("front", jax.jit(lambda d: _chunk_front(d, None, None)), vol.tsdf)
timeit("front+OLD compact",
       jax.jit(lambda d: _chunked_compact(d, None, FAST_CAP)[0]), vol.tsdf)
timeit("front+CM compact (incl order restore)",
       jax.jit(lambda d: _chunked_compact_cm(d, None, FAST_CAP)[0]),
       vol.tsdf)

ext = jax.jit(
    lambda d, vs, off: _extract_arrays(
        d, vs, off, max_cubes=FAST_CAP, max_vertices=1, layout="masked",
        tpu_safe=True, return_cube_slots=True, chunk_major=True,
        return_edge_verts=True,
    )
)
soup, (cid, ei, cv, edge_verts) = timeit(
    "extract cm full", ext, vol.tsdf, vol.voxel_size, vol.offset
)

corr_fn = jax.jit(
    lambda v, sv, d, f: _slot_correspondence(v, sv, d, cam, f, 10.0)
)
timeit("correspondence per-slot", corr_fn, soup.vertices, soup.valid,
       depth, flow)

upd_edge = jax.jit(
    lambda v, s, cid, ei, cv, ev, d, f: update_deformation_cubes(
        v, s, cid, ei, cv, d, cam, f, edge_verts=ev
    )
)
timeit("update (per-edge corr + dense fold)", upd_edge, vol, soup, cid,
       ei, cv, edge_verts, depth, flow)

from functools import partial

step_kw = dict(max_cubes=FAST_CAP, nk=cfg.integrate_nk,
               threshold_mm=cfg.threshold_mm, tpu_safe=True)
new = timeit("FUSED new (cm + per-edge + nk=3)",
             partial(_sf_step_pallas, chunk_major=True, **step_kw),
             vol, depth, flow, cam)
old = timeit("FUSED old-compaction (same corr/nk)",
             partial(_sf_step_pallas, chunk_major=False, **step_kw),
             vol, depth, flow, cam)
dd = float(jnp.abs(new[0].deform - old[0].deform).max())
dt_ = float(jnp.abs(new[0].tsdf - old[0].tsdf).max())
print(f"[check] n_corr new={int(new[3])} old={int(old[3])} "
      f"miss new={int(new[1])}; |d deform|={dd:.2e} |d tsdf|={dt_:.2e}",
      flush=True)
