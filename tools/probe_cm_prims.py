"""Micro-probe the chunk-major redesign's primitives on the chip.

1. row_gather_op at the two SF scales (front neighbor blocks, halo
   densify) vs jnp.take;
2. the chunkified-dense -> (D, Z, Y, X) transpose;
3. chunk-front internals: pooling+sort vs chunkify vs the 8 takes vs
   classify.

Run: PYTHONPATH=. timeout 1800 python tools/probe_cm_prims.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)[:7, :3]))


def timeit(name, fn, *args, reps=4):
    t0 = time.time()
    out = fn(*args)
    jnp.asarray(out).block_until_ready()
    s = float(jnp.sum(out.ravel()[:3].astype(jnp.float32)))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        s = float(jnp.sum(out.ravel()[:3].astype(jnp.float32)))
        ts.append(time.time() - t0)
    print(
        f"[{name}] compile+first={tc:.1f}s median={np.median(ts)*1e3:.2f}ms",
        flush=True,
    )
    return out


from tsdf_tpu.kernels.gather import row_gather_op

key = jax.random.PRNGKey(0)
t0 = time.time()
_ = float(jnp.sum(jnp.ones((8, 128))))
print(f"[claim] {time.time()-t0:.1f}s", flush=True)

# scale A: front neighbor blocks — (35937, 512) table, 16384 rows out
tabA = jax.random.normal(key, (35937, 512), jnp.float32)
idxA = jnp.asarray(
    np.sort(np.random.randint(0, 35937, (16384,))), jnp.int32
)
timeit("rowgather A kernel (16384x512 from 35937)",
       lambda: row_gather_op(tabA, idxA))
timeit("rowgather A take   (16384x512 from 35937)",
       jax.jit(lambda: jnp.take(tabA, idxA, axis=0)))

# scale B: halo densify — (2049, 3072) table, 35937 rows out
tabB = jax.random.normal(key, (2049, 3072), jnp.float32)
idxB = jnp.asarray(np.random.randint(0, 2049, (35937,)), jnp.int32)
timeit("rowgather B kernel (35937x3072 from 2049)",
       lambda: row_gather_op(tabB, idxB))
timeit("rowgather B take   (35937x3072 from 2049)",
       jax.jit(lambda: jnp.take(tabB, idxB, axis=0)))

# scale C: receiver merge — (2049, 2048) table, 6144 rows out
tabC = jax.random.normal(key, (2049, 2048), jnp.float32)
idxC = jnp.asarray(np.random.randint(0, 2049, (6144,)), jnp.int32)
timeit("rowgather C kernel (6144x2048 from 2049)",
       lambda: row_gather_op(tabC, idxC))

# 2. chunkified-dense -> dense transpose at 255^3 (4 channels)
npz, npy, npx = 33, 33, 17
bz, by, bx = 4, 8, 16
cd = jax.random.normal(key, (npz * npy * npx, 4, bz * by * bx), jnp.float32)


def unchunk(c):
    c6 = c.reshape(npz, npy, npx, 4, bz, by, bx)
    return c6.transpose(3, 0, 4, 1, 5, 2, 6).reshape(
        4, npz * bz, npy * by, npx * bx
    )


timeit("chunkified->dense transpose (440 MB)", jax.jit(unchunk), cd)

# inverse direction (the front's chunkify) for reference
dd = jax.random.normal(key, (4, npz * bz, npy * by, npx * bx), jnp.float32)


def chunk(v):
    return v.reshape(4, npz, bz, npy, by, npx, bx).transpose(
        1, 3, 5, 0, 2, 4, 6
    ).reshape(npz * npy * npx, 4, bz * by * bx)


timeit("dense->chunkified transpose", jax.jit(chunk), dd)

# 3. front internals at 255^3
from tsdf_tpu.ops.marching_cubes import _CHUNK, _MAX_CHUNKS, _INT_MAX
from tsdf_tpu.pipelines.scenefusion import SceneFusionConfig
from tsdf_tpu.utils import fixtures

cfg = SceneFusionConfig()
vol = fixtures.sphere_tsdf(
    cfg.make_volume(), 500.0, centre=(0.0, 0.0, 1300.0)
)
d = vol.tsdf
Z, Y, X = d.shape
cz, cy, cx = Z - 1, Y - 1, X - 1
nbz, nby, nbx = (-(-n // b) for n, b in zip((cz, cy, cx), _CHUNK))
B = bz * by * bx
pz, py, px = (nbz + 1) * bz, (nby + 1) * by, (nbx + 1) * bx


def front_pool(d):
    dp = jnp.pad(d, ((0, pz - Z), (0, py - Y), (0, px - X)), mode="edge")

    def pool_axis(a, b, nb, axis, op):
        sl = [slice(None)] * 3
        sl[axis] = slice(0, nb * b)
        blk = a[tuple(sl)]
        shape = list(blk.shape)
        shape[axis : axis + 1] = [nb, b]
        blk = op(blk.reshape(shape), axis=axis + 1)
        sl[axis] = slice(b, nb * b + 1, b)
        return op(jnp.stack([blk, a[tuple(sl)]], 0), axis=0)

    cmin, cmax = dp, dp
    for axis, (b, nb) in enumerate(((bz, nbz), (by, nby), (bx, nbx))):
        cmin = pool_axis(cmin, b, nb, axis, jnp.min)
        cmax = pool_axis(cmax, b, nb, axis, jnp.max)
    active = (cmin < 0.0) & (cmax >= 0.0)
    key = jnp.where(
        active.ravel(),
        jnp.arange(active.size, dtype=jnp.int32),
        _INT_MAX,
    )
    ids = jax.lax.sort(key)[:2048]
    return ids


ids = timeit("front: pool+sort", jax.jit(front_pool), d)


def front_chunkify(d):
    dp = jnp.pad(d, ((0, pz - Z), (0, py - Y), (0, px - X)), mode="edge")
    return (
        dp.reshape(nbz + 1, bz, nby + 1, by, nbx + 1, bx)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, B)
    )


r = timeit("front: pad+chunkify transpose", jax.jit(front_chunkify), d)

ids_valid = ids < _INT_MAX
ids0 = jnp.where(ids_valid, ids, 0)
chz = ids0 // (nby * nbx)
rem = ids0 - chz * (nby * nbx)
chy = rem // nbx
chx = rem - chy * nbx
npx_, npy_ = nbx + 1, nby + 1


def takes8(r):
    blocks = []
    for dz_ in (0, 1):
        for dy_ in (0, 1):
            for dx_ in (0, 1):
                nid = ((chz + dz_) * npy_ + (chy + dy_)) * npx_ + (
                    chx + dx_
                )
                blocks.append(jnp.take(r, nid, axis=0))
    return sum(blocks)


timeit("front: 8 neighbor takes (XLA)", jax.jit(takes8), r)


def takes8_kernel(r):
    nids = []
    for dz_ in (0, 1):
        for dy_ in (0, 1):
            for dx_ in (0, 1):
                nids.append(
                    ((chz + dz_) * npy_ + (chy + dy_)) * npx_ + (chx + dx_)
                )
    allid = jnp.concatenate(nids)
    g = row_gather_op(r, allid)
    return sum(
        g[i * 2048 : (i + 1) * 2048] for i in range(8)
    )


timeit("front: 8 neighbor takes (row_gather_op)", jax.jit(takes8_kernel), r)
