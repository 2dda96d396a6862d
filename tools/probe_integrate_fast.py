#!/usr/bin/env python
"""Chip measurement for the round-4 lane-span-compression prototype
(integrate_pallas mode="fast": decimated line sweep, ~3 gathered
elements/voxel vs ~9; see kernels/integrate.py:_kernel_fast).

VERDICT r3 item 3 target: >= 2x the 13.2 G upd/s exact-mode headline
(>= 25 G upd/s at 512^3) or a measured negative result.

Run on the chip: PYTHONPATH=. timeout 900 python tools/probe_integrate_fast.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels.integrate import integrate_pallas
from tsdf_tpu.utils import fixtures

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 512
W, H = 640, 480


def sync(x):
    return float(jnp.sum(x))


vol = make_volume((GRID,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
cam = (
    Camera.default_depth_camera()
    .move_to([300.0, -200.0, -500.0])
    .look_at([50.0, 80.0, 1500.0])
)
depth = jnp.asarray(fixtures.sphere_depth_map(W, H, 150.0, 1000.0, 2500.0))

for mode in ("line", "fast"):
    t0 = time.time()
    v, miss = integrate_pallas(vol, depth, cam, mode=mode)
    sync(v.weight)
    compile_s = time.time() - t0
    iters = 10
    t0 = time.perf_counter()
    out = vol
    for _ in range(iters):
        out, miss = integrate_pallas(out, depth, cam, mode=mode)
    sync(out.weight)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{mode:>5}: {dt*1e3:6.2f} ms = {GRID**3/dt/1e9:6.2f} G upd/s "
        f"(miss={int(miss)}, compile {compile_s:.1f}s)",
        flush=True,
    )
