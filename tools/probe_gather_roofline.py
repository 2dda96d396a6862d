"""Measure the v5e's raw dynamic_gather throughput — the exact
integrate's roofline (round-5 verdict item 4 closure evidence).

A Pallas kernel issues G back-to-back (S, 128) lane gathers on
VMEM-resident blocks (no HBM in the loop): the measured elements/s is
the hardware ceiling for any gather-per-voxel depth lookup. The exact
integrate performs ~9 gathered elements per voxel (pass 1 sweeps
Wp/128 = 5 depth column blocks, pass 2 Hp/128 = 4 row blocks — spans
set by the projection geometry, 0.86-3.5 px/voxel at 512^3), so its
predicted floor is 512^3 * 9 / ceiling; compare with the measured
kernel time.

Run: PYTHONPATH=. timeout 900 python tools/probe_gather_roofline.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 512  # rows per block
G = 64  # chained gathers per program
N_PROG = 64


def _kern(tab_ref, idx_ref, out_ref, *, g):
    acc = jnp.zeros((S, 128), jnp.float32)
    tab = tab_ref[...]
    idx = idx_ref[...]
    for i in range(g):
        # vary the index stream so gathers cannot be CSE'd; the rotate
        # is cheap VPU work against the gather's port-limited cost
        ix = jnp.clip(idx + i, 0, 127)
        acc = acc + jnp.take_along_axis(tab, ix, axis=1)
    out_ref[...] = acc


@partial(jax.jit, static_argnames=("g",))
def bench_kernel(tab, idx, g):
    return pl.pallas_call(
        partial(_kern, g=g),
        grid=(N_PROG,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (S, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N_PROG * S, 128), jnp.float32),
    )(tab, idx)


key = jax.random.PRNGKey(0)
tab = jax.random.normal(key, (N_PROG * S, 128), jnp.float32)
idx = jax.random.randint(key, (N_PROG * S, 128), 0, 128, jnp.int32)

_ = float(jnp.sum(bench_kernel(tab, idx, G)[:4, :4]))
reps = 20
t0 = time.time()
for _ in range(reps):
    out = bench_kernel(tab, idx, G)
_ = float(jnp.sum(out[:4, :4]))
dt = (time.time() - t0) / reps
n_elem = N_PROG * S * 128 * G
rate = n_elem / dt
print(f"dynamic_gather ceiling: {rate/1e9:.1f} G elem/s "
      f"({dt*1e3:.2f} ms for {n_elem/1e6:.0f} M gathered elems)",
      flush=True)

# predicted exact-integrate floor at 9 gathers/voxel vs measured
from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels import integrate_pallas
from tsdf_tpu.utils import fixtures

grid = 512
vol = make_volume((grid,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
cam = (
    Camera.default_depth_camera()
    .move_to([300.0, -200.0, -500.0])
    .look_at([50.0, 80.0, 1500.0])
)
depth = jnp.asarray(fixtures.sphere_depth_map(640, 480, 150.0, 1000.0, 2500.0))
v, m = integrate_pallas(vol, depth, cam, mode="line")
_ = float(jnp.sum(v.weight[:4, :4, :4]))
t0 = time.time()
for _ in range(10):
    v, m = integrate_pallas(v, depth, cam, mode="line")
_ = float(jnp.sum(v.weight[:4, :4, :4]))
dt_int = (time.time() - t0) / 10
pred = grid**3 * 9 / rate
print(f"integrate line 512^3: measured {dt_int*1e3:.1f} ms; "
      f"9-elem/voxel floor at ceiling = {pred*1e3:.1f} ms "
      f"({dt_int/pred:.2f}x off the gather roofline)", flush=True)
