"""Stage-level decomposition of the chunk-major SF path at 255^3.

Times each stage in its own jit: chunk front, old vs new compaction,
correspondence, chunk-halo fold scatter, halo unchunkify, and the
building blocks of the unchunkify (row gather, merges).

Run: PYTHONPATH=. timeout 2400 python tools/probe_sf_cm2.py
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
    _CHUNK,
    _chunk_front,
    _chunked_compact,
    _chunked_compact_cm,
    _extract_arrays,
)
from tsdf_tpu.ops.raycast import render_to_depth_image
from tsdf_tpu.pipelines.scenefusion import (
    SceneFusionConfig,
    _cube_corner_scatter_cm,
    _halo_unchunkify,
    _slot_correspondence,
)
from tsdf_tpu.utils import fixtures

W, H = 640, 480
FAST_CAP = 1 << 16


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(jnp.asarray(x, jnp.float32)), jnp.asarray(x, jnp.float32), 0.0)))


def timeit(name, fn, *args, reps=4):
    t0 = time.time()
    out = fn(*args)
    s = out[0] if isinstance(out, (tuple, list)) else out
    sync(s)
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        s = out[0] if isinstance(out, (tuple, list)) else out
        sync(s)
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

# 1. chunk front alone
front = jax.jit(lambda d: _chunk_front(d, None, None)["t_r"])
timeit("chunk front (pool+sort+chunkify+halo+classify)", front, vol.tsdf)

# 2. old compaction (includes front)
old_c = jax.jit(lambda d: _chunked_compact(d, None, FAST_CAP)[0])
timeit("front + OLD compaction (walk + sort)", old_c, vol.tsdf)

# 3. new compaction (includes front)
new_c = jax.jit(lambda d: _chunked_compact_cm(d, None, FAST_CAP)[:4])
timeit("front + NEW cm compaction", new_c, vol.tsdf)

# full extract for downstream inputs (outside timing)
soup, (cid, ei, cv, cch, csl, meta) = jax.jit(
    lambda d, vs, off: _extract_arrays(
        d, vs, off, max_cubes=FAST_CAP, max_vertices=1, layout="masked",
        tpu_safe=True, return_cube_slots=True, chunk_major=True,
    )
)(vol.tsdf, vol.voxel_size, vol.offset)
sync(soup.vertices)

# 4. correspondence alone
corr_fn = jax.jit(
    lambda v, sv, d, f: _slot_correspondence(v, sv, d, cam, f, 10.0)
)
corr, fav = timeit("correspondence (gather_flat walk)", corr_fn,
                   soup.vertices, soup.valid, depth, flow)

# 5. fold scatter alone
from tsdf_tpu.ops.marching_cubes import _MAX_V

contrib = jnp.concatenate(
    [soup.valid.astype(jnp.float32)[:, None], fav], axis=-1
).reshape(FAST_CAP, _MAX_V, 4)
J = 2048

fold = jax.jit(
    lambda c, ei, cch, csl, cv: _cube_corner_scatter_cm(
        c, ei, cch, csl, cv, n_chunks=J
    )
)
acc = timeit("fold scatter (chunk-halo)", fold, contrib, ei, cch, csl, cv)

# 6. unchunkify alone (meta arrays passed explicitly)
meta_arrays = {k: meta[k] for k in ("chz", "chy", "chx", "ids_valid")}

unchunk = jax.jit(
    lambda a, chz, chy, chx, iv: _halo_unchunkify(
        a, dict(chz=chz, chy=chy, chx=chx, ids_valid=iv),
        vol.tsdf.shape,
    )
)
timeit("halo unchunkify (gather+merge+transpose)", unchunk, acc,
       meta_arrays["chz"], meta_arrays["chy"], meta_arrays["chx"],
       meta_arrays["ids_valid"])

# 6b. just the row gather part of unchunkify
bz, by, bx = _CHUNK
hz, hy, hx = bz + 1, by + 1, bx + 1
nb = [-(-(n - 1) // b) for n, b in zip(vol.tsdf.shape, _CHUNK)]
npz, npy, npx = nb[0] + 1, nb[1] + 1, nb[2] + 1
n_nodes = npz * npy * npx


def rowgather(a, chz, chy, chx, iv):
    from tsdf_tpu.ops.scatter import scatter_set_int

    nid = (chz * npy + chy) * npx + chx
    nid = jnp.where(iv, nid, n_nodes)
    invj = scatter_set_int(
        n_nodes, nid, jnp.arange(J, dtype=jnp.int32) + 1, is_sorted=True
    ) - 1
    invj = jnp.where(invj >= 0, invj, J)
    acc_p = jnp.concatenate(
        [a.reshape(4, J, -1), jnp.zeros((4, 1, hz * hy * hx))], axis=1
    )
    return jnp.take(acc_p, invj, axis=1)


timeit("  unchunkify: row gather only", jax.jit(rowgather), acc,
       meta_arrays["chz"], meta_arrays["chy"], meta_arrays["chx"],
       meta_arrays["ids_valid"])
