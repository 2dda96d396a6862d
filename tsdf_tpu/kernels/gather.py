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


def _lane_gather_windowed_kernel(table_ref, idx_ref, out_ref, miss_ref, *, w, wb_count):
    idx = idx_ref[...]
    bs, c = idx.shape
    outs = []
    miss = jnp.int32(0)
    for cb in range(c // LANE):
        sub = idx[:, cb * LANE : (cb + 1) * LANE]
        inr = (sub >= 0) & (sub < w)
        # window base: 128-aligned floor of the tile's smallest in-range
        # index, clamped so the full window stays inside the table
        m = jnp.min(jnp.where(inr, sub, w - 1))
        m0 = jnp.minimum((m >> 7) << 7, w - wb_count * LANE)
        acc = jnp.zeros((bs, LANE), jnp.float32)
        covered = jnp.zeros((bs, LANE), jnp.bool_)
        for wb in range(wb_count):
            # the >>7<<7 alignment is invisible to Mosaic's divisibility
            # prover; assert it explicitly
            start = pl.multiple_of(m0 + wb * LANE, LANE)
            tblock = table_ref[:, pl.ds(start, LANE)]
            local = sub - start
            v = (local >= 0) & (local < LANE)
            g = jnp.take_along_axis(
                tblock, jnp.clip(local, 0, LANE - 1), axis=1
            )
            acc = jnp.where(v, g, acc)
            covered = covered | v
        miss = miss + jnp.sum(
            (inr & ~covered).astype(jnp.int32)
        )
        outs.append(acc)
    out_ref[...] = (
        outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    )
    # (8, 128) block: Mosaic needs sublane-divisible output tiles
    miss_ref[...] = jnp.full((8, LANE), miss, jnp.int32)


@partial(
    jax.jit, static_argnames=("window_blocks", "block_rows", "interpret")
)
def lane_gather_windowed_op(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    window_blocks: int = 2,
    block_rows: int = 64,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """out[s, c] = table[s, idx[s, c]] via per-tile index windows.

    The plain ``lane_gather_op`` scans every 128-lane block of the table
    for every 128-column block of the output — cost (c/128)·(w/128)
    dynamic_gathers per row. When indices are locally coherent (the
    raycast's per-slab resampling lines, the warped integrate's rows),
    each (block_rows, 128) tile of ``idx`` spans far less than the table
    width; this kernel finds the tile's 128-aligned window with one
    min-reduction and gathers only ``window_blocks`` table blocks via a
    ref-level ``pl.ds`` (value-level dynamic_slice is unimplemented in
    Mosaic; ref slicing compiles fine).

    MEASURED RESULT (round 2, v5e, in-jit loop): at the raycast/ICP
    table widths (w = 512-640, 4-5 blocks) this is a WASH — 304 vs
    309 us per pass-A-shaped call — because the kernel is bound by
    total per-element VPU work (gather + block-membership selects),
    not by the dynamic_gather count alone; the window bookkeeping
    (min-reduce, coverage masks) cancels the saved scans. Kept for
    genuinely wide tables (w/128 >> other per-element work) where the
    scan term dominates; no production path uses it today.

    Returns (out, miss): ``miss`` counts in-table-range indices that fell
    outside their tile's window — the result is EXACT iff miss == 0, so
    callers gate on it (``lane_gather_checked``) the same way the
    integrate kernel's exact-or-skip counter works. Out-of-range indices
    return 0 (same semantics as lane_gather_op) and never count as
    misses.
    """
    s, w = table.shape
    s2, c = idx.shape
    assert s == s2, (table.shape, idx.shape)
    assert w % LANE == 0, table.shape
    wb_count = min(window_blocks, w // LANE)

    sp = -(-s // 8) * 8
    cp = -(-c // LANE) * LANE
    tp = jnp.pad(table, ((0, sp - s), (0, 0))) if sp != s else table
    ip = (
        jnp.pad(idx, ((0, sp - s), (0, cp - c)), constant_values=w)
        if (sp, cp) != (s, c)
        else idx
    )
    bs = block_rows
    while sp % bs:
        bs //= 2
    nb = sp // bs
    out, miss = pl.pallas_call(
        partial(_lane_gather_windowed_kernel, w=w, wb_count=wb_count),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((sp, cp), jnp.float32),
            jax.ShapeDtypeStruct((nb * 8, LANE), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((bs, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bs, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.asarray(tp, jnp.float32), ip)
    return out[:s, :c], jnp.sum(miss[::8, 0])


def lane_gather_checked(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    window_blocks: int = 2,
    block_rows: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed gather with an on-device exact fallback: runs the
    windowed kernel, and if any tile's span exceeded its window
    (miss > 0), re-runs the full-scan kernel via lax.cond — no host
    sync, exactness unconditional."""
    out, miss = lane_gather_windowed_op(
        table, idx,
        window_blocks=window_blocks, block_rows=block_rows,
        interpret=interpret,
    )
    return jax.lax.cond(
        miss > 0,
        lambda: lane_gather_op(
            jnp.asarray(table, jnp.float32), idx, interpret=interpret
        ),
        lambda: out,
    )


def _row_gather_kernel(idx_ref, *refs, r):
    # refs = r input blocks (1, 1, W) + one output block (r, 1, W)
    out_ref = refs[-1]
    for k in range(r):
        out_ref[k, 0, :] = refs[k][0, 0, :]


@partial(jax.jit, static_argnames=("rows_per_program", "interpret"))
def row_gather_op(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    rows_per_program: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[j, :] = table[idx[j], :] — whole-ROW gather at DMA speed.

    The row index rides scalar prefetch
    (``pltpu.PrefetchScalarGridSpec``) and each grid program's input
    BlockSpec index_map selects its source row directly — Mosaic turns
    each block fetch into a plain DMA. ``rows_per_program`` output rows
    share one program (one in_spec per row) to amortize grid overhead.

    Measured on the v5e (tools/probe_cm_prims.py, chained loops): at
    the SceneFusion chunk-gather shapes XLA's own ``jnp.take(axis=0)``
    turned out EQUAL in-loop (the alarming 15-30 ms single-dispatch
    numbers were tunnel-sync round-trips), so no production path
    switched to this kernel — it is kept, equality-tested, for genuine
    wide-row gathers where XLA's lowering does fall behind (and as the
    building block for scalar-prefetch block-indexing patterns).

    Args:
      table: (N, W) any dtype (cast to f32 on TPU path callers' side if
        needed — the kernel copies bytes, dtype preserved).
      idx: (J,) int32 in [0, N). Out-of-range behaviour: clamped.

    Returns (J, W) of table.dtype.
    """
    n, w = table.shape
    (j,) = idx.shape
    r = int(rows_per_program)
    wp = _round_up_lane(w)
    jp = -(-j // r) * r
    tp = jnp.pad(table, ((0, 0), (0, wp - w))) if wp != w else table
    # Mosaic constrains only the LAST TWO block dims (divisible by
    # (8, 128) or equal to the array dims): a free reshape to
    # (N, 1, W) makes the row-selecting dim a leading dim, so a
    # (1, 1, W) block at an arbitrary prefetched row index is legal.
    tp = tp.reshape(n, 1, wp)
    idx_c = jnp.clip(jnp.asarray(idx, jnp.int32), 0, n - 1)
    if jp != j:
        idx_c = jnp.pad(idx_c, (0, jp - j))

    grid = (jp // r,)
    in_specs = [
        pl.BlockSpec(
            (1, 1, wp),
            # late-bound k: freeze per spec
            (lambda i, idx_ref, k=k: (idx_ref[i * r + k], 0, 0)),
            memory_space=pltpu.VMEM,
        )
        for k in range(r)
    ]
    out = pl.pallas_call(
        partial(_row_gather_kernel, r=r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (r, 1, wp), lambda i, idx_ref: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((jp, 1, wp), table.dtype),
        interpret=interpret,
    )(idx_c, *([tp] * r))
    return out.reshape(jp, wp)[:j, :w]


def _round_up_lane(v: int) -> int:
    return -(-v // LANE) * LANE


def row_gather_any(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatched whole-row gather: the scalar-prefetch DMA
    kernel on TPU, plain take elsewhere."""
    if jax.default_backend() == "tpu":
        return row_gather_op(table, idx)
    return jnp.take(table, jnp.clip(idx, 0, table.shape[0] - 1), axis=0)


def lane_gather_any(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[s, c] = table[s, idx[s, c]] on any backend: the Pallas kernel
    on TPU, plain take_along_axis elsewhere (XLA CPU gathers are fine;
    it is only the TPU lowering that crawls)."""
    if jax.default_backend() == "tpu":
        return lane_gather_op(table, idx)
    return _take_or_zero(table, idx)


def _take_or_zero(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """CPU twin of the kernels' out-of-range-returns-0 semantics. Must
    be a where (not a mask multiply): a NaN/inf table value at the
    clipped position would otherwise turn 0 into NaN and break the
    bit-identical contract with the TPU path."""
    in_range = (idx >= 0) & (idx < table.shape[1])
    g = jnp.take_along_axis(
        table, jnp.clip(idx, 0, table.shape[1] - 1), axis=1
    )
    return jnp.where(in_range, g, jnp.zeros_like(g))


def lane_gather_fast(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatched gather for locally-coherent indices: the
    windowed kernel with on-device exact fallback on TPU (2.5x fewer
    dynamic_gathers when tiles span < 256 lanes), take_along_axis on
    CPU. Bit-identical to lane_gather_any on every input."""
    if jax.default_backend() == "tpu":
        return lane_gather_checked(table, idx)
    return _take_or_zero(table, idx)
