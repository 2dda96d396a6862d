"""Probe the chunked MC compaction redesign (round 2).

Current tpu_safe extract at 255^3: full-volume lax.sort of 16.6M
(id, type) pairs = 86 ms + 2M-element corner gather = 48 ms. Candidate:
  1. classify as now; ALSO build the 8 shifted corner-value arrays
     (pure slices, no gather);
  2. 3D-chunk every array to (n_chunks, B); reduce chunk occupancy;
  3. tiny sort compacts active chunk ids (n_chunks ~ 32k entries);
  4. row-gather the active chunks' rows for [type, w0..w7];
  5. cumsum-rank + sorted matmul-scatter compacts occupied cubes with
     their corner values as payload (no element gathers at all).

Measures, per chunk shape: n_active chunks, time of each stage, and the
current sort+gather for comparison.

Run: PYTHONPATH=. timeout 1700 python tools/probe_mc_chunked.py
"""

import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import make_volume
from tsdf_tpu.ops.marching_cubes import CORNER_OFFSETS
from tsdf_tpu.ops.scatter import scatter_add_flat
from tsdf_tpu.utils import fixtures

GRID = 255
MAX_CUBES = 1 << 18
MAX_CHUNKS = 2048


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out[0] if isinstance(out, (tuple, list)) else out)
        ts.append(time.time() - t0)
    print(
        f"[{name}] compile+first={tc:.1f}s median={np.median(ts)*1e3:.1f}ms",
        flush=True,
    )
    return out


vol = fixtures.sphere_tsdf(
    make_volume((GRID,) * 3, 2550.0, offset=(-1275.0, -1275.0, 0.0)), 600.0
)
wall = fixtures.wall_tsdf(vol, 2200.0)
d = jnp.minimum(vol.tsdf, wall.tsdf)
Z = Y = X = GRID
cz = cy = cx = GRID - 1


@jax.jit
def classify(d):
    inside = d < 0.0
    cube_type = jnp.zeros((cz, cy, cx), jnp.int32)
    ws = []
    for k in range(8):
        dx, dy, dz = (int(v) for v in CORNER_OFFSETS[k])
        bit = inside[dz : dz + cz, dy : dy + cy, dx : dx + cx]
        cube_type = cube_type | (bit.astype(jnp.int32) << k)
        ws.append(d[dz : dz + cz, dy : dy + cy, dx : dx + cx])
    return cube_type, ws


cube_type, ws = timeit("classify+shift x9", classify, d)


def chunkify(arr, bs, pz, py, px):
    bz, by, bx = bs
    a = jnp.pad(arr, ((0, pz - cz), (0, py - cy), (0, px - cx)))
    a = a.reshape(pz // bz, bz, py // by, by, px // bx, bx)
    a = a.transpose(0, 2, 4, 1, 3, 5)
    return a.reshape(-1, bz * by * bx)


for bs in [(4, 8, 16), (2, 16, 16), (4, 4, 32), (4, 1, 128)]:
    bz, by, bx = bs
    pz = -(-cz // bz) * bz
    py = -(-cy // by) * by
    px = -(-cx // bx) * bx
    B = bz * by * bx
    n_chunks = (pz // bz) * (py // by) * (px // bx)

    @jax.jit
    def stage_chunk(cube_type, ws):
        tg = chunkify(cube_type, bs, pz, py, px)
        wg = [chunkify(w, bs, pz, py, px) for w in ws]
        occ = (tg != 0) & (tg != 255)
        active = occ.any(axis=1)
        return tg, wg, active

    tg, wg, active = timeit(f"{bs} chunkify x9 + reduce", stage_chunk,
                            cube_type, ws)
    n_act = int(jnp.sum(active))
    print(f"[{bs}] n_chunks={n_chunks} B={B} active={n_act} "
          f"slots={n_act*B/1e6:.2f}M", flush=True)

    @jax.jit
    def stage_compact_ids(active):
        key = jnp.where(
            active,
            jnp.arange(active.shape[0], dtype=jnp.int32),
            jnp.int32(0x7FFFFFFF),
        )
        skey = jax.lax.sort(key)
        ids = skey[:MAX_CHUNKS]
        valid = ids < 0x7FFFFFFF
        return jnp.where(valid, ids, 0), valid

    (ids, valid) = timeit(f"{bs} chunk-id sort", stage_compact_ids, active)

    @jax.jit
    def stage_rowgather(tg, wg, ids):
        t_r = jnp.take(tg, ids, axis=0)
        w_r = [jnp.take(w, ids, axis=0) for w in wg]
        return t_r, w_r

    t_r, w_r = timeit(f"{bs} row-gather x9", stage_rowgather, tg, wg, ids)

    @jax.jit
    def stage_scatter(t_r, w_r, ids, valid):
        occ = (t_r != 0) & (t_r != 255) & valid[:, None]
        occ_f = occ.ravel()
        rank = jnp.cumsum(occ_f.astype(jnp.int32)) - 1
        dest = jnp.where(occ_f, rank, -1)
        dest = jnp.maximum(jax.lax.cummax(dest), 0)
        dest = jnp.where(dest >= MAX_CUBES, MAX_CUBES, dest)
        # global cube id per slot (arithmetic only)
        nby = py // by
        nbx = px // bx
        chz = ids // (nby * nbx)
        rem = ids - chz * (nby * nbx)
        chy = rem // nbx
        chx = rem - chy * nbx
        s = jnp.arange(B, dtype=jnp.int32)
        sz = s // (by * bx)
        sr = s - sz * (by * bx)
        sy = sr // bx
        sx = sr - sy * bx
        gz = chz[:, None] * bz + sz[None, :]
        gy = chy[:, None] * by + sy[None, :]
        gx = chx[:, None] * bx + sx[None, :]
        gid = (gz * cy + gy) * cx + gx
        payload = [
            (gid.ravel() & 0xFFF).astype(jnp.float32),
            (gid.ravel() >> 12).astype(jnp.float32),
            t_r.ravel().astype(jnp.float32),
        ] + [w.ravel() for w in w_r]
        payload = jnp.stack(
            [jnp.where(occ_f, p, 0.0) for p in payload]
        )
        out = scatter_add_flat(MAX_CUBES, dest, payload, is_sorted=True)
        return out

    out = timeit(f"{bs} rank matmul-scatter D=11", stage_scatter,
                 t_r, w_r, ids, valid)
    n_occ = int(jnp.sum((cube_type != 0) & (cube_type != 255)))
    got = int(jnp.sum(out[2] != 0))
    print(f"[{bs}] occupied={n_occ} compacted_nonzero_type={got}",
          flush=True)

# reference: the current 16.6M sort
@jax.jit
def current_sort(cube_type):
    occ = (cube_type != 0) & (cube_type != 255)
    flat = cube_type.ravel()
    n = flat.shape[0]
    key = jnp.where(
        occ.ravel(), jnp.arange(n, dtype=jnp.int32), jnp.int32(0x7FFFFFFF)
    )
    skey, stype = jax.lax.sort([key, flat], num_keys=1)
    return skey[:MAX_CUBES], stype[:MAX_CUBES]


timeit("CURRENT full sort 16.6M", current_sort, cube_type)
