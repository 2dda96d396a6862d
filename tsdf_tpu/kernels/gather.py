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
