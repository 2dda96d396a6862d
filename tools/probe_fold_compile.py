"""Isolate the ~24-min compile of update_deformation_cubes (probe).

Pieces, each AOT-compiled cold (different shapes/consts than the cached
pipeline program where needed):
  A. _cube_corner_scatter at the production shapes (C=2^18, 255^3).
  B. scatter_add_flat with fold_offsets (the 8-corner fold) alone.
  C. scatter_add_flat is_sorted=True WITHOUT fold (control).
  D. the edge-mask einsum fold alone (control).

Run: PYTHONPATH=/root/.axon_site:. python -u tools/probe_fold_compile.py
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
payload32 = jnp.asarray(rng.rand(32, C).astype(np.float32))
lin = jnp.asarray(np.sort(rng.randint(0, NVOX, C)).astype(np.int32))

from tsdf_tpu.ops.scatter import scatter_add_flat  # noqa: E402

OFFS = (0, 1, 255, 256, 65025, 65026, 65280, 65281)

print("B: fold scatter alone", flush=True)
clock(
    "B fold-scatter",
    lambda l, v: scatter_add_flat(
        NVOX, l, v, is_sorted=True, fold_offsets=OFFS
    ),
    lin,
    payload32,
)

print("C: sorted scatter no fold (32ch)", flush=True)
clock(
    "C plain-scatter",
    lambda l, v: scatter_add_flat(NVOX, l, v, is_sorted=True),
    lin,
    payload32,
)

print("D: einsum fold alone", flush=True)


def einsum_fold(contrib, edge_idx):
    from tsdf_tpu.ops.marching_cubes import EDGE_CORNERS

    ec = np.asarray(EDGE_CORNERS)
    edge_mask = [(edge_idx == i).astype(jnp.float32) for i in range(12)]
    corner_edges = [
        [i for i in range(12) if k in (int(ec[i, 0]), int(ec[i, 1]))]
        for k in range(8)
    ]
    out = []
    for k in range(8):
        a, b, c = corner_edges[k]
        w_k = edge_mask[a] + edge_mask[b] + edge_mask[c]
        out.append(jnp.einsum("cs,csd->dc", w_k, contrib))
    return jnp.concatenate(out, axis=0)


clock("D einsum-fold", einsum_fold, contrib, edge_idx)

print("A: _cube_corner_scatter full", flush=True)
from tsdf_tpu.pipelines.scenefusion import _cube_corner_scatter  # noqa: E402

clock(
    "A cube-corner-scatter",
    lambda c, i, e, v: _cube_corner_scatter(c, i, e, v, SHAPE),
    contrib,
    cid,
    edge_idx,
    cube_valid,
)
