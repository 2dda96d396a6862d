"""Time the fused SceneFusion frame at the reference default 255^3.

Pieces timed separately first (extract / update / integrate), then the
fused _sf_step_pallas. Run: timeout 570 python tools/probe_sf_frame.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.ops.raycast import render_to_depth_image
from tsdf_tpu.pipelines.scenefusion import (
    SceneFusionConfig,
    _sf_step_pallas,
)

W, H = 640, 480


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


cfg = SceneFusionConfig()
vol = cfg.make_volume()
from tsdf_tpu.utils import fixtures

vol = fixtures.sphere_tsdf(vol, 500.0, centre=(0.0, 0.0, 1300.0))
cam = (
    Camera.default_depth_camera()
    .move_to([0.0, 0.0, 100.0])
    .look_at([0.0, 0.0, 1300.0])
)
print("[sf] rendering depth...", flush=True)
depth = jnp.asarray(
    render_to_depth_image(vol, cam, width=W, height=H), jnp.float32
)
sync(depth)
flow = jnp.broadcast_to(jnp.array([5.0, 0.0, 0.0], jnp.float32), (H, W, 3))

print("[sf] compiling fused step (cold: big-sort compile ~40s)...", flush=True)
t0 = time.time()
out, miss, _mask, n_corr, _ovf = _sf_step_pallas(
    vol, depth, flow, cam,
    max_cubes=cfg.max_cubes, nk=cfg.integrate_nk,
    threshold_mm=cfg.threshold_mm, tpu_safe=True,
)
sync(out.tsdf)
print(
    f"[sf] cold={time.time()-t0:.1f}s miss={int(miss)} n_corr={int(n_corr)}",
    flush=True,
)
ts = []
v = vol
for i in range(6):
    t0 = time.time()
    v, miss, _mask, n_corr, _ovf = _sf_step_pallas(
        v, depth, flow, cam,
        max_cubes=cfg.max_cubes, nk=cfg.integrate_nk,
        threshold_mm=cfg.threshold_mm, tpu_safe=True,
    )
    sync(v.tsdf)
    ts.append(time.time() - t0)
    print(f"[sf] frame {i}: {ts[-1]*1e3:.1f} ms", flush=True)
print(
    f"[sf] fused SceneFusion frame at 255^3: median "
    f"{np.median(ts[1:])*1e3:.1f} ms",
    flush=True,
)
