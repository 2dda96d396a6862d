"""Slab-sweep raycasting: XLA orchestration + Pallas lane gathers.

TPU-native replacement for the reference per-thread ray march
(ref: src/RayCaster/GPURaycaster.cu:265-377). A CUDA thread chasing one
ray through memory is the worst possible TPU access pattern (per-element
gathers); instead the perspective ray bundle is factored the shear-warp
way:

  Sweep the volume one z-slab at a time in front-to-back ray order.
  Every ray crosses the slab plane z = z_k exactly once, at grid coords
  (u, v) = (Cu + Su*rx, Cv + Sv*ry) where rx = d_x/d_z, ry = d_y/d_z are
  per-pixel constants and Cu/Su/Cv/Sv are per-slab scalars — sampling
  ALL rays against one slab is a single homography warp of the slab
  image into screen space, decomposed into two separable 1-D resamplings
  (pixel rows map to straight lines v = alpha(py) + beta(py)*u in the
  slab plane).

  Architecture: ONE jit containing a `lax.fori_loop` over slabs. The
  loop body is plain XLA (transposes, index math, bilinear lerps, the
  crossing-state update) except for the one thing XLA cannot do fast —
  per-element gathers — which run as `kernels.gather.lane_gather_op`,
  a tiny stateless Pallas kernel. Monolithic stateful Pallas sweeps
  (sequential revisited grids, fori+DMA in-kernel) were tried first and
  compile pathologically on current Mosaic (100+ MB register spills from
  thin-slice relayouts; minutes-to-hours in the scheduler); this
  factoring compiles in seconds and keeps all state in XLA loop
  carries.

  The first + -> - crossing is secant-refined in z; a ray whose first
  valid sample is already <= 0 registers an entry hit at that slab
  plane. Any <= 0 sample terminates the ray, so a marching ray always
  has prev_s > 0 and the reference's - -> + backface transition cannot
  arise (ref: GPURaycaster.cu:325-374). Sampling density is one
  sample per slab crossing instead of the reference's 20 per truncation
  distance; the TSDF's sign bands are >= a truncation distance
  (~2 voxels) wide, so crossings are still bracketed, and the secant
  refinement is the reference's intended one.

Rays whose d_z opposes the sweep order would be traversed back-to-front;
their hits are discarded (t < 0). Pixel rows that degenerate under the
line parameterization (|camera roll| ~ 90 deg) report misses —
ops/raycast.py remains the fully general reference path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..volume import TSDFVolume
from .gather import lane_gather_op

_BIG = 1.0e6
_NO_HIT = -1.0e30

# Slabs batched per sweep-loop iteration: both gather passes concat K
# slabs into one lane-gather call each way, so K amortizes per-call and
# loop overhead. Round-4 on-chip A/B at 512^3: K=4 and K=8 are a wash
# (within tunnel noise), K=2 and K=16 are ~10-20% worse — kept at 4.
# Module-level so probes can A/B it.
_K_SLABS = 4

# state codes
_S_NOPREV = 0.0
_S_MARCH = 1.0
_S_DEAD = 2.0


def _sweep(
    tsdf: jnp.ndarray,
    m: jnp.ndarray,
    origin: jnp.ndarray,
    off: jnp.ndarray,
    physical: jnp.ndarray,
    vs: jnp.ndarray,
    fwd_axis: jnp.ndarray,
    width: int,
    height: int,
    interpret: bool,
) -> jnp.ndarray:
    """One slab sweep along the array's axis 0; all quantities are in
    this (possibly axis-permuted) frame. Returns (H, W, 3) vertices."""
    Z = tsdf.shape[0]

    def provider(p0, zb):
        # physical slabs [p0, p0 + zb) straight off the resident volume
        return jax.lax.dynamic_slice_in_dim(tsdf, p0, zb, axis=0)

    # Per-brick occupancy for the sweep's run-jump skip (round 5): one
    # cheap per-slab min reduce; the brick tables for both sweep
    # directions come from the (Z,) vector. A brick is live iff it
    # contains a non-positive voxel — exactly the in-body min test this
    # replaces, hoisted out of the loop so empty RUNS cost one step.
    zl = min(_K_SLABS, Z)
    n_bricks = -(-Z // zl)
    # two-step reduce: XLA's fused axes-(1,2) reduce ran at ~125 GB/s
    # (1.7 ms at 512^3); minoring axis 2 then 1 streams at ~HBM speed
    # (0.3 ms)
    smin = jnp.min(
        jnp.min(tsdf.astype(jnp.float32), axis=2), axis=1
    )  # (Z,)
    pad = n_bricks * zl - Z
    smin_f = jnp.concatenate([smin, jnp.full((pad,), _BIG)])
    bmin_f = smin_f.reshape(n_bricks, zl).min(axis=1)
    smin_r = jnp.concatenate([smin[::-1], jnp.full((pad,), _BIG)])
    bmin_r = smin_r.reshape(n_bricks, zl).min(axis=1)
    reverse = fwd_axis < 0.0
    # ~(min > 0), NOT (min <= 0): a NaN voxel makes the brick min NaN,
    # and NaN must classify LIVE (sample it) — the in-body test this
    # hoists was conservative the same way (min > 0 is False for NaN)
    brick_live = ~jnp.where(reverse, bmin_r > 0.0, bmin_f > 0.0)

    return _sweep_bricks(
        provider, Z, tsdf.shape[1], tsdf.shape[2],
        m, origin, off, physical, vs, fwd_axis,
        width, height, interpret,
        brick_live=brick_live,
    )


def _sweep_bricks(
    provider,
    Z: int,
    Yr: int,
    Xr: int,
    m: jnp.ndarray,
    origin: jnp.ndarray,
    off: jnp.ndarray,
    physical: jnp.ndarray,
    vs: jnp.ndarray,
    fwd_axis: jnp.ndarray,
    width: int,
    height: int,
    interpret: bool,
    brick_slabs: int | None = None,
    any_alive=jnp.any,
    y0=0,
    brick_live: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Slab sweep over bricks served by ``provider(p0, zb)`` — a traced
    callable returning the physical slabs [p0, p0+zb) as a (zb, Yr, Xr)
    block. The single-device path serves 4-slab bricks from the resident
    volume; the brick-sharded path (parallel/ops.py) serves each owner's
    brick via one ring/psum broadcast per step, so per-device memory is
    O(brick), not O(volume). Early termination stops requesting bricks
    once every ray is resolved; ``any_alive`` aggregates the liveness
    mask (the sharded path psums it so all devices stop together).

    ``brick_live``: optional (n_bricks,) bool in SWEEP order — brick b
    contains a non-positive voxel. With it, the sweep JUMPS over empty
    runs (round 5): a run of all-positive bricks [b, e) contributes
    exactly one sample — the slab adjacent to the next live brick —
    because no bilinear sample of positives can satisfy s <= 0, the
    secant's prev_s only needs that adjacent slab, and enter/exit
    liveness resolves at the same sample (a ray entering AND exiting
    inside the run stays NOPREV = a miss, as it must). The loop trip
    count drops from n_bricks to n_live_bricks + n_empty_runs — the
    deep-scene sweep was ~128 iterations of mostly per-iteration
    overhead (ref bound it per ray instead: step = 0.05*trunc, <= 4400
    steps, GPURaycaster.cu:324,369). Without it, each brick is min-
    tested in-body (the round-3 behaviour)."""
    H, W = height, width
    K_default = _K_SLABS

    # Per-pixel ray fields. ``y0``: first image row of this ray tile
    # (row-sharded rays; traced ok).
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32) + jnp.asarray(y0, jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (H, W))
    py = jnp.broadcast_to(ys[:, None], (H, W))
    d_x = m[0, 0] * px + m[0, 1] * py + m[0, 2]
    d_y = m[1, 0] * px + m[1, 1] * py + m[1, 2]
    d_z = m[2, 0] * px + m[2, 1] * py + m[2, 2]
    safe_dz = jnp.where(jnp.abs(d_z) < 1e-12, 1e-12, d_z)
    rx = d_x / safe_dz
    ry = d_y / safe_dz

    o_x, o_y, o_z = origin[0], origin[1], origin[2]
    cu = (o_x - off[0]) / vs[0] - 0.5
    cv = (o_y - off[1]) / vs[1] - 0.5

    # Sweep ascending when the camera looks along +axis (traced select).
    reverse = fwd_axis < 0.0
    sweep_sign = jnp.where(reverse, -1.0, 1.0)

    uu_row = jnp.arange(Xr, dtype=jnp.float32)[None, :]  # (1, Xr)

    # Batch K slabs per loop iteration: both gather passes operate on
    # row-independent tables, so K slabs concatenate along rows into ONE
    # lane-gather call each way — amortizing per-custom-call and loop
    # overhead K-fold across the Z-step sweep.
    zl = brick_slabs if brick_slabs is not None else min(K_default, Z)
    n_bricks = -(-Z // zl)
    K = min(K_default, zl)
    n_inner = -(-zl // K)

    def slab_fields(s_idx, s_hi, block, p0):
        """Per-slab sampling of one sweep position (traced index) out of
        ``block`` = physical slabs [p0, p0 + zl)."""
        zi = jnp.where(reverse, Z - 1 - s_idx, s_idx)
        zi_c = jnp.clip(zi, 0, Z - 1)
        slab = jax.lax.dynamic_index_in_dim(
            block, jnp.clip(zi_c - p0, 0, zl - 1), axis=0, keepdims=False
        ).astype(jnp.float32)  # (Yr, Xr); bf16 storage reads half the HBM
        zk = off[2] + (zi.astype(jnp.float32) + 0.5) * vs[2]
        su = (zk - o_z) / vs[0]
        sv = (zk - o_z) / vs[1]
        u_pix = cu + su * rx  # (H, W)
        v_pix = cv + sv * ry

        valid = (
            # The sample domain is the PHYSICAL AABB (lattice coords
            # [-0.5, N-0.5]), matching the lax march / the reference's
            # tsdf_value_at clamp (TSDF_utilities.cu:29-37): samples in
            # the outer half-voxel shell interpolate against edge-
            # clamped taps (u_s/vstar clips below). Gating at voxel
            # CENTRES dropped rays that enter through a side face and
            # hit within the shell (240/19k rays on the deep-wall
            # fixture, tests_tpu).
            (u_pix >= -0.5)
            & (u_pix <= Xr - 0.5)
            & (v_pix >= -0.5)
            & (v_pix <= Yr - 0.5)
            & (s_idx < s_hi)  # inside this brick's sweep range and < Z
            # slab plane must be IN FRONT of this ray (t > 0): a slab
            # behind the camera projects to the ray's mirror image, and
            # a mirror sample with s <= 0 would kill the ray before its
            # true forward intersection (camera inside the volume with
            # geometry behind it).
            & ((zk - o_z) * d_z > 0.0)
        )

        # Row lines in slab space from the row's first/last pixels.
        u0 = u_pix[:, 0:1]
        v0 = v_pix[:, 0:1]
        u1 = u_pix[:, W - 1 : W]
        v1 = v_pix[:, W - 1 : W]
        du = u1 - u0
        degen = jnp.abs(du) < 1e-6
        beta = (v1 - v0) / jnp.where(degen, 1.0, du)  # (H, 1)
        alpha = v0 - beta * u0
        valid = valid & ~degen

        vstar = alpha + beta * uu_row  # (H, Xr)
        vstar = jnp.clip(
            jnp.where(jnp.isfinite(vstar), vstar, 0.0), 0.0, Yr - 1.0
        )
        vi = jnp.floor(vstar)
        vf = vstar - vi
        vi0 = vi.astype(jnp.int32)
        vi1 = jnp.minimum(vi0 + 1, Yr - 1)

        u_s = jnp.clip(
            jnp.where(jnp.isfinite(u_pix), u_pix, 0.0), 0.0, Xr - 1.0
        )
        ui = jnp.floor(u_s)
        uf = u_s - ui
        ui0 = ui.astype(jnp.int32)
        ui1 = jnp.minimum(ui0 + 1, Xr - 1)
        return dict(
            slab_t=slab.T, zk=zk, valid=valid, vf=vf,
            vi0=vi0, vi1=vi1, uf=uf, ui0=ui0, ui1=ui1,
        )

    def crossing_update(carry, s, valid, zk):
        # Termination semantics: ANY s <= 0 sample kills the ray — as a
        # secant-refined crossing when the previous valid sample was
        # positive, or as an entry hit at the slab plane when the ray's
        # first valid sample is already non-positive (camera inside /
        # behind a surface; this also subsumes the reference's
        # backface-miss case, ref: GPURaycaster.cu:352-355 — a marching
        # ray here always has prev_s > 0, so a - -> + transition cannot
        # occur).
        prev_s, state, hit_z = carry
        prev_valid = state == _S_MARCH
        dead = state == _S_DEAD
        fvalid = valid & ~dead
        entry_hit = fvalid & (state == _S_NOPREV) & (s <= 0.0)
        cross = fvalid & prev_valid & (prev_s > 0.0) & (s <= 0.0)
        # Exit-transition crossing: when a marching ray leaves the AABB
        # through a side face, its final sub-slab segment is otherwise
        # unsampled — a surface within that last half-voxel is missed
        # (the lax march keeps sampling up to the exact exit t). The
        # gathers are dense, so the exit slab's edge-clamped sample is
        # already computed: use it once to close the interval. The
        # secant lands within half a voxel of the lax hit.
        exit_cross = (
            prev_valid & ~valid & ~dead & (prev_s > 0.0) & (s <= 0.0)
        )

        z_prev = zk - sweep_sign * vs[2]
        denom = prev_s - s
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        frac = prev_s / denom
        z_cross = z_prev + frac * (zk - z_prev)

        new_hit = entry_hit | cross | exit_cross
        hit_z = jnp.where(
            new_hit, jnp.where(entry_hit, zk, z_cross), hit_z
        )
        # a marching ray that left the (convex) volume can never re-enter
        exited = prev_valid & jnp.logical_not(valid)
        state = jnp.where(
            dead | new_hit | exited,
            _S_DEAD,
            jnp.where(valid, _S_MARCH, _S_NOPREV),
        )
        prev_s = jnp.where(valid, s, prev_s)
        return prev_s, state, hit_z

    def run_slabs(s_list, s_hi, block, p0, carry):
        fields = [slab_fields(s, s_hi, block, p0) for s in s_list]

        # pass A for all K slabs in one gather per tap
        tab_a = jnp.concatenate([f["slab_t"] for f in fields], axis=0)
        idx_a0 = jnp.concatenate([f["vi0"].T for f in fields], axis=0)
        idx_a1 = jnp.concatenate([f["vi1"].T for f in fields], axis=0)
        g0 = lane_gather_op(tab_a, idx_a0, interpret=interpret)
        g1 = lane_gather_op(tab_a, idx_a1, interpret=interpret)

        i1s = []
        for j, f in enumerate(fields):
            sl = slice(j * Xr, (j + 1) * Xr)
            i1s.append(
                (1.0 - f["vf"]) * g0[sl].T + f["vf"] * g1[sl].T
            )  # (H, Xr)

        # pass B for all K slabs in one gather per tap
        tab_b = jnp.concatenate(i1s, axis=0)  # (K*H, Xr)
        idx_b0 = jnp.concatenate([f["ui0"] for f in fields], axis=0)
        idx_b1 = jnp.concatenate([f["ui1"] for f in fields], axis=0)
        s0 = lane_gather_op(tab_b, idx_b0, interpret=interpret)
        s1 = lane_gather_op(tab_b, idx_b1, interpret=interpret)

        # sequential crossing updates in sweep order
        for j, f in enumerate(fields):
            sl = slice(j * H, (j + 1) * H)
            s = (1.0 - f["uf"]) * s0[sl] + f["uf"] * s1[sl]
            carry = crossing_update(carry, s, f["valid"], f["zk"])
        return carry

    # Early termination: a ray is finished when dead (hit / backface /
    # exited the convex volume) or when it never intersects the AABB at
    # all; front-heavy scenes then stop after a fraction of the Z sweep.
    from ..ops.raycast import slab_near_far

    dirs_flat = jnp.stack([d_x, d_y, d_z], axis=-1).reshape(-1, 3)
    _n, _f, intersects = slab_near_far(
        origin[None, :],
        dirs_flat,
        off[None, :],
        (off + physical)[None, :],
    )
    intersects = intersects.reshape(H, W)

    zeros = jnp.zeros((H, W), jnp.float32)
    init = (0, (zeros, zeros, jnp.full((H, W), _NO_HIT, jnp.float32)))

    def cond(state):
        b, (_ps, st, _hz) = state
        alive = intersects & (st != _S_DEAD)
        return (b < n_bricks) & any_alive(alive)

    def brick_base(b):
        # physical base of the brick at sweep position b (clamped so the
        # last partial brick still serves a full static-size block)
        p0 = jnp.where(reverse, Z - (b + 1) * zl, b * zl)
        return jnp.clip(p0, 0, max(Z - zl, 0))

    def full_at(b, carry):
        p0 = brick_base(b)
        block = provider(p0, zl)
        s_hi = jnp.minimum((b + 1) * zl, Z)

        def inner(j, carry):
            s_base = b * zl + j * K
            return run_slabs(
                [s_base + t for t in range(K)], s_hi, block, p0, carry
            )

        return jax.lax.fori_loop(0, n_inner, inner, carry)

    def skip_at(b, carry):
        # All-positive brick: no sample (bilinear = convex comb of
        # positives) can satisfy s <= 0, so neither a crossing nor an
        # entry hit can originate here. Sampling ONLY the sweep-last
        # slab preserves exactness: it is the adjacent previous
        # sample for the next brick's first slab (secant z_prev
        # stays correct) and keeps enter/exit liveness flowing.
        # Empty space is most of a TSDF (cleared to +trunc), so deep
        # scenes skip most of the sweep's gather work.
        p0 = brick_base(b)
        block = provider(p0, zl)
        s_hi = jnp.minimum((b + 1) * zl, Z)
        return run_slabs([s_hi - 1], s_hi, block, p0, carry)

    if brick_live is None:

        def wbody(state):
            # block fetched ONCE and closed over by both branches (XLA
            # cannot CSE a provider call duplicated across lax.cond
            # branches — and a sharded provider is a psum broadcast)
            b, carry = state
            p0 = brick_base(b)
            block = provider(p0, zl)
            s_hi = jnp.minimum((b + 1) * zl, Z)
            empty = jnp.min(block.astype(jnp.float32)) > 0.0

            def full(carry):
                def inner(j, carry):
                    s_base = b * zl + j * K
                    return run_slabs(
                        [s_base + t for t in range(K)], s_hi, block, p0,
                        carry,
                    )

                return jax.lax.fori_loop(0, n_inner, inner, carry)

            def skip(carry):
                return run_slabs([s_hi - 1], s_hi, block, p0, carry)

            carry = jax.lax.cond(empty, skip, full, carry)
            return b + 1, carry

    else:
        # next live brick at index >= b (suffix min), padded so that
        # e = nxt[b + 1] is n_bricks past the last live brick
        idx = jnp.arange(n_bricks, dtype=jnp.int32)
        live_i = jnp.where(brick_live, idx, n_bricks)
        nxt = jnp.concatenate(
            [
                jax.lax.cummin(live_i[::-1])[::-1],
                jnp.full((1,), n_bricks, jnp.int32),
            ]
        )

        def wbody(state):
            b, carry = state
            lv = jax.lax.dynamic_index_in_dim(
                brick_live, b, keepdims=False
            )

            def live_body(carry):
                return b + 1, full_at(b, carry)

            def empty_body(carry):
                # jump the whole empty run [b, e): one adjacency sample
                # from the run's last brick, then continue at e
                e = jax.lax.dynamic_index_in_dim(
                    nxt, b + 1, keepdims=False
                )
                eb = jnp.clip(e - 1, 0, n_bricks - 1)
                return e, skip_at(eb, carry)

            return jax.lax.cond(lv, live_body, empty_body, carry)

    _, (_, _, hit_z) = jax.lax.while_loop(cond, wbody, init)

    # Recover t from the hit plane; drop wrong-direction rays (t < 0).
    t = (hit_z - o_z) / safe_dz
    hit = (hit_z > _NO_HIT / 2) & (t > 0.0)
    dirs = jnp.stack([d_x, d_y, d_z], axis=-1)
    verts = origin[None, None, :] + t[..., None] * dirs
    return jnp.where(hit[..., None], verts, jnp.nan)


# Sweep permutations: new coords = original[perm], ordered (u, v, sweep).
# Three sweep axes x two in-plane orientations — the row-line
# parameterization needs image rows to actually traverse the u axis, and
# a 90-degree camera roll makes rows constant-u under one orientation
# while the other stays well-conditioned (the round-3 "rows degenerate
# at |roll| ~ 90 deg -> misses" limitation, now closed). Pairs (2i, 2i+1)
# sweep original axis ("z", "y", "x") resp.
_SWEEP_PERMS = (
    (0, 1, 2), (1, 0, 2),  # sweep z: u=x | u=y
    (0, 2, 1), (2, 0, 1),  # sweep y: u=x | u=z
    (2, 1, 0), (1, 2, 0),  # sweep x: u=z | u=y
)
# Back-compat aliases (the first orientation of each sweep axis, the
# round-2 self-inverse triple).
_AXIS_PERMS = (_SWEEP_PERMS[0], _SWEEP_PERMS[2], _SWEEP_PERMS[4])
_ARRAY_PERMS = ((0, 1, 2), (1, 0, 2), (2, 1, 0))  # for [z, y, x] arrays


def _array_perm(q):
    """Transpose spec turning a [z, y, x] array into [sweep, v, u] for
    coord perm ``q`` (coords numbered 0=x, 1=y, 2=z; dim of coord c in a
    [z, y, x] array is 2 - c)."""
    return (2 - q[2], 2 - q[1], 2 - q[0])


def _inv_perm(q):
    """Inverse coordinate permutation (q is not always self-inverse)."""
    return tuple(sorted(range(3), key=q.__getitem__))


def _sweep_branch_index(m, fwd):
    """Traced branch index into ``_SWEEP_PERMS``: the sweep axis most
    aligned with the camera forward, then the in-plane orientation whose
    u axis the image rows actually traverse (|d dir/d px| component)."""
    axis = jnp.argmax(jnp.abs(jnp.stack([fwd[2], fwd[1], fwd[0]])))
    # primary/alternate u axis (coord index) per sweep axis, matching
    # _SWEEP_PERMS pair order
    prim = jnp.array([0, 0, 2], jnp.int32)
    alt = jnp.array([1, 2, 1], jnp.int32)
    mcol = jnp.abs(m[:, 0])  # d(ray dir)/d(pixel x)
    orient = (mcol[alt[axis]] > mcol[prim[axis]]).astype(jnp.int32)
    return axis * 2 + orient


@partial(
    jax.jit,
    static_argnames=("width", "height", "interpret"),
)
def raycast_pallas(
    vol: TSDFVolume,
    camera: Camera,
    width: int = 640,
    height: int = 480,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Raycast with the slab-sweep pipeline.

    The sweep axis is the volume axis most aligned with the camera's
    forward direction (a `lax.switch` over the three permuted
    geometries — the line parameterization needs pixel rows to be
    well-conditioned against the sweep planes).

    Returns (vertices, normals) with the same conventions as ops.raycast:
    (H, W, 3) world-mm vertices (NaN on miss) and screen-space normals.
    """
    m = camera.rotation @ camera.k_inv  # world dir = m @ (px, py, 1)
    origin = camera.position
    fwd = camera.pose[0:3, 2]

    def branch(perm):
        p = jnp.asarray(perm)
        ip = jnp.asarray(_inv_perm(perm))

        def run():
            tsdf_p = jnp.transpose(vol.tsdf, _array_perm(perm))
            verts_p = _sweep(
                tsdf_p,
                m[p, :],
                origin[p],
                vol.offset[p],
                vol.physical_size[p],
                vol.voxel_size[p],
                fwd[perm[2]],
                width,
                height,
                interpret,
            )
            return verts_p[..., ip]  # un-permute components

        return run

    verts = jax.lax.switch(
        _sweep_branch_index(m, fwd),
        [branch(q) for q in _SWEEP_PERMS],
    )

    from ..ops.raycast import compute_normals_from_vertices

    normals = compute_normals_from_vertices(verts)
    return verts, normals
