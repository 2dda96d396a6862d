"""Compile-time probes for the in-matmul fold redesign (sequel to
probe_fold_compile.py, whose findings: the pad-shift fold compiled in
2048 s at 255^3 shapes; the no-fold D=32 checked-hint variant also blew
past 1400 s — so both the old fold body and the cond'd 33-operand sort
are suspects).

  P5. _cube_corner_scatter with the NEW in-matmul fold + trusted hint
      at production shapes (C=2^18, 255^3) — the number that matters.
  P3. no-fold D=4 checked-hint (lax.cond with a 5-operand sort branch):
      does the cond alone bomb at small D?
  P1. no-fold D=32 is_sorted=False (33-operand sort inline, no cond).

Run: PYTHONPATH=/root/.axon_site:. python -u tools/probe_fold_compile2.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

C = 1 << 18
MAXV = 24
SHAPE = (255, 255, 255)
NVOX = int(np.prod(SHAPE))


def clock(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"[{name}] lower={t1-t0:.1f}s compile={t2-t1:.1f}s", flush=True)


rng = np.random.RandomState(0)
contrib = jnp.asarray(rng.rand(C, MAXV, 4).astype(np.float32))
cid = jnp.asarray(np.sort(rng.randint(0, 254**3, C)).astype(np.int32))
edge_idx = jnp.asarray(rng.randint(0, 12, (C, MAXV)).astype(np.int32))
cube_valid = jnp.asarray(np.arange(C) < C // 2)
payload4 = jnp.asarray(rng.rand(4, C).astype(np.float32))
payload32 = jnp.asarray(rng.rand(32, C).astype(np.float32))
lin = jnp.asarray(np.sort(rng.randint(0, NVOX, C)).astype(np.int32))

from tsdf_tpu.ops.scatter import scatter_add_flat  # noqa: E402
from tsdf_tpu.pipelines.scenefusion import _cube_corner_scatter  # noqa: E402

print("P5: cube-corner scatter, in-matmul fold + trusted", flush=True)
clock(
    "P5 cube-corner-new",
    lambda c, i, e, v: _cube_corner_scatter(c, i, e, v, SHAPE),
    contrib,
    cid,
    edge_idx,
    cube_valid,
)

print("P3: no-fold D=4 checked-hint (cond)", flush=True)
clock(
    "P3 cond-d4",
    lambda l, v: scatter_add_flat(NVOX, l, v, is_sorted=True),
    lin,
    payload4,
)

print("P1: no-fold D=32 full sort (no cond)", flush=True)
clock(
    "P1 sort-d32",
    lambda l, v: scatter_add_flat(NVOX, l, v, is_sorted=False),
    lin,
    payload32,
)
