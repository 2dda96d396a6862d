"""One-off TPU probes for the on-device marching-cubes design (round 2).

Measures the primitive costs the on-device MC rewrite depends on:
  1. warm host-CPU extract_surface at 255^3 (the thing being replaced)
  2. XLA sort of 16.6M (key, payload) pairs on TPU  (compaction option)
  3. XLA element gather 2M from 16.6M flat on TPU   (corner lookup)
  4. XLA element gather 1M from 307k image on TPU   (deformation lookup)

Run: timeout 570 python tools/probe_mc_costs.py [step...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np


def sync(x):
    # block_until_ready does not block through the axon tunnel; D2H scalar does
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(name, fn, *args, reps=5):
    t0 = time.time()
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t_compile = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        ts.append(time.time() - t0)
    print(f"[{name}] compile+first={t_compile:.2f}s median={np.median(ts)*1e3:.1f}ms", flush=True)
    return np.median(ts)


steps = sys.argv[1:] or ["cpu_mc", "sort", "gather_vol", "gather_img"]

N = 254 * 254 * 254  # cube grid at 255^3
NV = 255 * 255 * 255

if "cpu_mc" in steps:
    from tsdf_tpu.utils.fixtures import sphere_tsdf
    from tsdf_tpu.ops.marching_cubes import extract_surface

    vol = sphere_tsdf((255, 255, 255), 2550.0)
    t0 = time.time()
    soup = extract_surface(vol)
    n = int(soup.n_vertices)
    print(f"[cpu_mc] cold={time.time()-t0:.2f}s n_vertices={n}", flush=True)
    for _ in range(3):
        t0 = time.time()
        soup = extract_surface(vol)
        _ = int(soup.n_vertices)
        print(f"[cpu_mc] warm={time.time()-t0:.2f}s", flush=True)

if "sort" in steps:
    key = jnp.asarray(np.random.randint(0, 1 << 30, size=N, dtype=np.int32))
    pay = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def dosort(k, p):
        return jax.lax.sort([k, p], num_keys=1)[1]

    timeit("sort_16.6M", dosort, key, pay)

if "gather_vol" in steps:
    src = jnp.asarray(np.random.rand(NV).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, NV, size=2_000_000, dtype=np.int32))

    @jax.jit
    def dogather(s, i):
        return jnp.take(s, i, axis=0, mode="clip")

    timeit("gather_2M_from_16.6M", dogather, src, idx)

if "gather_img" in steps:
    img = jnp.asarray(np.random.rand(480 * 640, 3).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 480 * 640, size=1 << 20, dtype=np.int32))

    @jax.jit
    def dogather2(s, i):
        return jnp.take(s, i, axis=0, mode="clip")

    timeit("gather_1M_from_307k_x3", dogather2, img, idx)
