"""Blockwise gather primitives for Mosaic kernels.

The TPU VPU's only gather hardware is ``tpu.dynamic_gather``: a
``take_along_axis`` over one dimension of a rank-2 vreg block, with
operand/index/output shapes equal and the gathered dimension = 128 lanes.
These helpers compose arbitrary-width row/column lookups out of that
primitive: loop over 128-wide blocks of the table, gather each with
locally-shifted indices, and select by block membership.

Everything here operates on *values* inside a Pallas kernel body.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def mxu_transpose(x: jnp.ndarray) -> jnp.ndarray:
    """Transpose a 2D f32 block on the MXU.

    Mosaic's native ``tpu.transpose`` lowering is compile-time pathological
    for large blocks (observed: minutes/hangs for a 256x256 in-kernel
    transpose on v5e). ``X.T == dot(I, X)`` contracting the last dims of
    both operands, which the MXU executes natively and exactly (identity
    rows select single elements; f32 accumulation): X.T[i, j] =
    sum_k I[i, k] * X[j, k].
    """
    eye = jnp.eye(x.shape[1], dtype=jnp.float32)
    return jax.lax.dot_general(
        eye,
        x,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def lane_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[s, c] = table[s, idx[s, c]].

    Args:
      table: (S, W) with W a multiple of 128.
      idx:   (S, C) int32, C a multiple of 128, values in [0, W) (out of
             range returns 0).

    Returns: (S, C) of table.dtype.
    """
    s, w = table.shape
    s2, c = idx.shape
    assert s == s2, (table.shape, idx.shape)
    assert w % LANE == 0 and c % LANE == 0, (table.shape, idx.shape)

    outs = []
    for cb in range(c // LANE):
        sub_idx = idx[:, cb * LANE : (cb + 1) * LANE]
        acc = jnp.zeros((s, LANE), table.dtype)
        for wb in range(w // LANE):
            local = sub_idx - wb * LANE
            valid = (local >= 0) & (local < LANE)
            g = jnp.take_along_axis(
                table[:, wb * LANE : (wb + 1) * LANE],
                jnp.clip(local, 0, LANE - 1),
                axis=1,
            )
            acc = jnp.where(valid, g, acc)
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _lane_gather_kernel(table_ref, idx_ref, out_ref):
    out_ref[...] = lane_gather(table_ref[...], idx_ref[...])


@partial(jax.jit, static_argnames=("interpret",))
def lane_gather_op(
    table: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Standalone op: out[s, c] = table[s, idx[s, c]], any shapes.

    The one Pallas primitive the gather-heavy pipelines are built from
    (slab-sweep raycast, warped integrate): XLA does transposes,
    index math and state updates natively well — per-element gathers are
    the single thing it cannot do, so only that lives in a kernel.
    Monolithic stateful kernels (sequential grids / fori+DMA sweeps)
    compile pathologically on current Mosaic; this op keeps every
    pallas_call tiny, stateless and compiled once per shape.

    Out-of-range indices return 0.
    """
    s, w = table.shape
    s2, c = idx.shape
    assert s == s2, (table.shape, idx.shape)
    sp = -(-s // 8) * 8
    wp = -(-w // LANE) * LANE
    cp = -(-c // LANE) * LANE
    tp = (
        jnp.pad(table, ((0, sp - s), (0, wp - w)))
        if (sp, wp) != (s, w)
        else table
    )
    # clamp pad-region behaviour: pad idx with w (out of range -> 0)
    ip = (
        jnp.pad(idx, ((0, sp - s), (0, cp - c)), constant_values=wp)
        if (sp, cp) != (s, c)
        else idx
    )
    bs = 256
    while sp % bs:
        bs //= 2
    out = pl.pallas_call(
        _lane_gather_kernel,
        grid=(sp // bs,),
        out_shape=jax.ShapeDtypeStruct((sp, cp), table.dtype),
        in_specs=[
            pl.BlockSpec((bs, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bs, cp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(tp, ip)
    return out[:s, :c]


def lane_gather_any(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[s, c] = table[s, idx[s, c]] on any backend: the Pallas kernel
    on TPU, plain take_along_axis elsewhere (XLA CPU gathers are fine;
    it is only the TPU lowering that crawls)."""
    if jax.default_backend() == "tpu":
        return lane_gather_op(table, idx)
    return jnp.take_along_axis(
        table, jnp.clip(idx, 0, table.shape[1] - 1), axis=1
    ) * ((idx >= 0) & (idx < table.shape[1]))


def gather2d_banded(
    img: jnp.ndarray,
    py: jnp.ndarray,
    px: jnp.ndarray,
    band: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 2D lookup out[y, x] = img[py, px] for |py - y| <= band.

    The fully general per-pixel 2D gather has no fast TPU form; but when
    the row displacement is bounded (projective ICP association under
    small inter-frame motion), it decomposes into 2*band+1 row-rolls,
    each a pure lane-gather at the exact column, selected where the row
    candidate matches — the same candidates-plus-exact-select pattern as
    kernels/integrate.py.

    Returns (values, found) — found is False where |py - y| > band or
    the target is out of the image; such lookups must be treated as
    no-correspondence by the caller.
    """
    h, w = img.shape
    yy = jnp.arange(h, dtype=py.dtype)[:, None]
    dy = py - yy  # (H, W)
    in_img = (py >= 0) & (py < h) & (px >= 0) & (px < w)
    found = in_img & (jnp.abs(dy) <= band)
    out = jnp.zeros(px.shape, img.dtype)
    for k in range(-band, band + 1):
        rolled = jnp.roll(img, -k, axis=0)  # rolled[y] = img[y + k]
        cand = lane_gather_any(rolled, px)
        out = jnp.where(dy == k, cand, out)
    return jnp.where(found, out, 0.0), found


def row_gather(table: jnp.ndarray, rowidx: jnp.ndarray) -> jnp.ndarray:
    """out[y, c] = table[rowidx[y, c], c].

    Gathers along the first axis by transposing into lane-gather form.

    Args:
      table:  (R, C) with R and C multiples of 128 (R is gathered over,
              so it must tile into lane blocks after the transpose).
      rowidx: (Y, C) int32, Y a multiple of 8, values in [0, R).

    Returns: (Y, C).
    """
    r, ct = table.shape
    y, c = rowidx.shape
    assert ct == c, (table.shape, rowidx.shape)
    # int32 indices ride the MXU transpose via f32 (exact below 2^24).
    idx_t = mxu_transpose(rowidx.astype(jnp.float32)).astype(jnp.int32)
    out_t = lane_gather(mxu_transpose(table), idx_t)  # (C, Y)
    return mxu_transpose(out_t)
