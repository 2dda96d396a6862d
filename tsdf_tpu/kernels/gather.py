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

import jax
import jax.numpy as jnp

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
