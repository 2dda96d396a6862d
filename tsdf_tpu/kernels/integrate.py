"""Pallas TPU kernel for rigid TSDF depth integration.

TPU-native replacement for the reference ``integrate_kernel``
(ref: src/TSDF/TSDFVolume.cu:308-392). The math per voxel is identical to
ops/integrate.py (the lax reference path); what changes is how the
per-voxel depth lookup ``depth[round(py), round(px)]`` is executed.

XLA lowers that lookup to a generic gather: measured ~0.11 G lookups/s on
v5e plus minutes of compile time — 50x off the HBM roofline. The TPU VPU
has no scatter/gather hardware; what Mosaic *does* support is
``dynamic_gather`` within one vreg dimension: ``take_along_axis`` on a
(S, 128) block along lanes. This kernel restructures the projective
lookup into exactly those ops via a line-warp decomposition:

  All voxel columns (fixed x, varying y) are parallel 3D lines, so their
  images are lines through the common vanishing point of the volume's
  +y axis: px = alpha(x) + beta(x) * py. For each volume z-slab:

  pass 1  tmp_k[y_img, x] = depth[y_img, round(alpha + beta*y_img) + k]
          for a few candidate column offsets k — a lane-gather of depth
          column-blocks, since the column index depends only on
          (y_img, x);
  pass 2  val_k[y, x] = tmp_k[round(py), x] — after a transpose, another
          lane-gather along the y_img dimension;
  select  the candidate whose column equals round(px) computed exactly
          per voxel. If no candidate matches (|beta| > nk/2 - 0.5, i.e.
          extreme camera roll), the voxel is *skipped* and counted —
          exact-or-skip semantics, never a wrong depth value. For
          upright-ish cameras |beta| < 1 and nk=3 gives zero misses.
          nk=1 is ~2x faster but exact only for axis-aligned cameras:
          for generic poses the line-evaluated column and the directly
          evaluated one are distinct f32 computations of the same
          quantity, and ~0.2% of voxels land on opposite sides of a .5
          rounding boundary (covered by the +-1 candidates of nk=3).

Cost: O(nk * W/128) vreg lane-gathers per depth row instead of a scalar
gather per voxel; the kernel is HBM-bound on the tsdf+weight streams.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import Camera
from ..volume import TSDFVolume

_LANE = 128
_BIG = 1.0e6


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pack_params(vol: TSDFVolume, camera: Camera) -> jnp.ndarray:
    """The (1, 24) SMEM parameter row shared by every integrate kernel:
    pose_inv rows 0-2, intrinsics, offset, voxel size, trunc,
    max_weight — ONE packing used by the rigid/warped/colour wrappers
    so the layout cannot drift between them."""
    pose_inv = camera.pose_inv
    return jnp.concatenate(
        [
            pose_inv[0, 0:4],
            pose_inv[1, 0:4],
            pose_inv[2, 0:4],
            jnp.stack(
                [
                    camera.k[0, 0],
                    camera.k[1, 1],
                    camera.k[0, 2],
                    camera.k[1, 2],
                ]
            ),
            vol.offset,
            vol.voxel_size,
            jnp.stack(
                [
                    vol.truncation_distance.astype(jnp.float32),
                    vol.max_weight.astype(jnp.float32),
                ]
            ),
        ]
    ).reshape(1, 24)


def _fit_column_lines(
    r00, r01, r10, r11, r20, r21, kx, ky, kz, fx, fy, cx0, cy0,
    wx_row, wyA, wyB,
):
    """Per-column image line px = alpha + beta * py (1, BX): every voxel
    column (fixed x, varying y) projects to a straight image line; fit
    it from the first/last row's projections. Shared by the rigid,
    warped and colour kernels — the line IS the candidate-table axis."""
    def _project_row(wy_s):
        Xr_ = r00 * wx_row + r01 * wy_s + kx
        Yr_ = r10 * wx_row + r11 * wy_s + ky
        Zr_ = r20 * wx_row + r21 * wy_s + kz
        return fx * Xr_ / Zr_ + cx0, fy * Yr_ / Zr_ + cy0

    pxA, pyA = _project_row(wyA)
    pxB, pyB = _project_row(wyB)
    denom = pyB - pyA
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    beta = (pxB - pxA) / denom
    alpha = pxA - beta * pyA
    beta = jnp.where(jnp.isfinite(beta), jnp.clip(beta, -_BIG, _BIG), 0.0)
    alpha = jnp.where(
        jnp.isfinite(alpha), jnp.clip(alpha, -_BIG, _BIG), -_BIG
    )
    return alpha, beta


def _unpack_params(params_ref):
    """Unpack the shared (1, 24) SMEM row (see _pack_params). Returns
    (pose_inv rows, intrinsics, offset, voxel size, trunc, max_weight)
    — ONE unpacking for all four kernels so the layout cannot drift."""
    p = params_ref
    rows = (
        (p[0, 0], p[0, 1], p[0, 2], p[0, 3]),
        (p[0, 4], p[0, 5], p[0, 6], p[0, 7]),
        (p[0, 8], p[0, 9], p[0, 10], p[0, 11]),
    )
    intr = (p[0, 12], p[0, 13], p[0, 14], p[0, 15])
    off = (p[0, 16], p[0, 17], p[0, 18])
    vs = (p[0, 19], p[0, 20], p[0, 21])
    return rows, intr, off, vs, p[0, 22], p[0, 23]


def _rigid_prologue(params_ref, *, Y, BX, Yr, Xr, Hr, Wr):
    """Shared prologue of the three rigid kernels (forward, colour,
    pose-adjoint): param unpack, exact per-voxel projection of the
    lattice centres, frustum/validity gate, per-column image line fit,
    and the pass-1/pass-2 index planes. The custom VJP depends on the
    adjoint kernel gating EXACTLY like the forward — keeping this in
    one place makes the gates bit-identical by construction.

    Returns a dict of everything the update/adjoint bodies need."""
    z = pl.program_id(0)
    xb = pl.program_id(1)
    rows, intr, off, vs, trunc, max_weight = _unpack_params(params_ref)
    (r00, r01, r02, t0), (r10, r11, r12, t1), (r20, r21, r22, t2) = rows
    fx, fy, cx0, cy0 = intr
    off_x, off_y, off_z = off
    vs_x, vs_y, vs_z = vs

    zf = z.astype(jnp.float32)
    cz = off_z + (zf + 0.5) * vs_z
    x0 = (xb * BX).astype(jnp.float32)

    # --- exact per-voxel projection (Y, BX) ------------------------------
    xv_i = jax.lax.broadcasted_iota(jnp.int32, (Y, BX), 1)
    yv_i = jax.lax.broadcasted_iota(jnp.int32, (Y, BX), 0)
    xv = xv_i.astype(jnp.float32) + x0
    yv = yv_i.astype(jnp.float32)
    # real (unpadded) voxels only; padded lanes never update or count
    vox_valid = (xv_i + xb * BX < Xr) & (yv_i < Yr)
    wx = off_x + (xv + 0.5) * vs_x
    wy = off_y + (yv + 0.5) * vs_y
    kx = r02 * cz + t0
    ky = r12 * cz + t1
    kz = r22 * cz + t2
    Xc = r00 * wx + r01 * wy + kx
    Yc = r10 * wx + r11 * wy + ky
    Zc = r20 * wx + r21 * wy + kz
    px = fx * Xc / Zc + cx0
    py = fy * Yc / Zc + cy0
    px = jnp.where(jnp.isfinite(px), jnp.clip(px, -_BIG, _BIG), -1.0)
    py = jnp.where(jnp.isfinite(py), jnp.clip(py, -_BIG, _BIG), -1.0)
    pxr = jnp.round(px).astype(jnp.int32)
    pyr = jnp.round(py).astype(jnp.int32)
    in_img = (
        (pxr >= 0) & (pxr < Wr) & (pyr >= 0) & (pyr < Hr) & vox_valid
    )

    # --- per-column image line px = alpha + beta * py (1, BX) ------------
    wx_row = off_x + (
        jax.lax.broadcasted_iota(jnp.int32, (1, BX), 1).astype(jnp.float32)
        + x0
        + 0.5
    ) * vs_x
    wyA = off_y + 0.5 * vs_y
    wyB = off_y + (Y - 0.5) * vs_y
    alpha, beta = _fit_column_lines(
        r00, r01, r10, r11, r20, r21, kx, ky, kz, fx, fy, cx0, cy0,
        wx_row, wyA, wyB,
    )

    return dict(
        rows=rows, intr=intr, off=off, vs=vs,
        trunc=trunc, max_weight=max_weight,
        cz=cz, wx=wx, wy=wy, vox_valid=vox_valid,
        Xc=Xc, Yc=Yc, Zc=Zc, pxr=pxr, pyr=pyr, in_img=in_img,
        alpha=alpha, beta=beta,
    )


def _pass1_index(alpha, beta, Hp, BX):
    """Pass-1 candidate base column per (image row, voxel column)."""
    y_img = jax.lax.broadcasted_iota(jnp.int32, (Hp, BX), 0).astype(
        jnp.float32
    )
    return jnp.round(jnp.clip(alpha + beta * y_img, -_BIG, _BIG)).astype(
        jnp.int32
    )


def _pass2_index(alpha, beta, pyr, Hp):
    """Pass-2 row index (transposed, gather-safe) + the candidate base
    column evaluated at the fetched row."""
    pyrT = jnp.clip(pyr, 0, Hp - 1).T
    c0r = jnp.round(
        jnp.clip(alpha + beta * pyr.astype(jnp.float32), -_BIG, _BIG)
    ).astype(jnp.int32)
    return pyrT, c0r


def _pass1_gather(tables, c0, nk, BX, Hp, Wp):
    """Pass 1 of the line-warp lookup for N tables sharing the index
    math: tmps[k][t][y_img, x] = tables[t][y_img, c0[y_img, x] + ko],
    ko = k - nk//2. Lane-gathers over 128-column blocks (the one Mosaic
    dynamic_gather shape); extra tables cost one extra gather per block,
    not a second sweep."""
    tmps = []
    for k in range(nk):
        ko = k - nk // 2
        subs = [[] for _ in tables]
        for xsub in range(BX // _LANE):
            sl = slice(xsub * _LANE, (xsub + 1) * _LANE)
            idx = c0[:, sl] + ko  # (Hp, 128)
            accs = [jnp.zeros((Hp, _LANE), jnp.float32) for _ in tables]
            for cb in range(Wp // _LANE):
                local = idx - cb * _LANE
                valid = (local >= 0) & (local < _LANE)
                lcl = jnp.clip(local, 0, _LANE - 1)
                for t, tab in enumerate(tables):
                    g = jnp.take_along_axis(
                        tab[:, cb * _LANE : (cb + 1) * _LANE], lcl, axis=1
                    )
                    accs[t] = jnp.where(valid, g, accs[t])
            for t in range(len(tables)):
                subs[t].append(accs[t])
        tmps.append(tuple(jnp.concatenate(sb, axis=1) for sb in subs))
    return tmps


def _pass2_select(tmps, pyrT, pxr, c0r, nk, BX, Y, Hp):
    """Pass 2 + exact-column select for N tables: gather each candidate
    table at the per-voxel row, keep the candidate whose column equals
    the per-voxel target column. Returns ([vals per table], matched)."""
    n_tab = len(tmps[0])
    vals = [jnp.zeros((Y, BX), jnp.float32) for _ in range(n_tab)]
    matched = jnp.zeros((Y, BX), jnp.bool_)
    for k in range(nk):
        ko = k - nk // 2
        tkTs = [tmps[k][t].T for t in range(n_tab)]
        vsubs = [[] for _ in range(n_tab)]
        for yvb in range(Y // _LANE):
            ysl = slice(yvb * _LANE, (yvb + 1) * _LANE)
            idx = pyrT[:, ysl]  # (BX, 128), values in [0, Hp)
            accs = [
                jnp.zeros((BX, _LANE), jnp.float32) for _ in range(n_tab)
            ]
            for cb2 in range(Hp // _LANE):
                local = idx - cb2 * _LANE
                valid = (local >= 0) & (local < _LANE)
                lcl = jnp.clip(local, 0, _LANE - 1)
                for t in range(n_tab):
                    g = jnp.take_along_axis(
                        tkTs[t][:, cb2 * _LANE : (cb2 + 1) * _LANE],
                        lcl,
                        axis=1,
                    )
                    accs[t] = jnp.where(valid, g, accs[t])
            for t in range(n_tab):
                vsubs[t].append(accs[t])
        match_k = (c0r + ko) == pxr
        for t in range(n_tab):
            val_k = jnp.concatenate(vsubs[t], axis=1).T  # (Y, BX)
            vals[t] = jnp.where(match_k, val_k, vals[t])
        matched = matched | match_k
    return vals, matched


def _kernel(
    params_ref,  # (1, 24) f32 SMEM
    depth_ref,  # (Hp, Wp) f32 VMEM
    tsdf_ref,  # (1, Y, BX) f32 VMEM
    weight_ref,  # (1, Y, BX) f32 VMEM
    out_tsdf_ref,  # (1, Y, BX) f32
    out_weight_ref,  # (1, Y, BX) f32
    out_miss_ref,  # (1, 1, 8, 128) i32 VMEM (count broadcast; [0,0] read)
    *,
    Y: int,
    BX: int,
    Hp: int,
    Wp: int,
    Hr: int,
    Wr: int,
    Yr: int,
    Xr: int,
    nk: int,
    cap_weight: bool,
    line_mode: bool = False,
):
    pro = _rigid_prologue(params_ref, Y=Y, BX=BX, Yr=Yr, Xr=Xr, Hr=Hr, Wr=Wr)
    trunc, max_weight = pro["trunc"], pro["max_weight"]
    Zc, pxr, pyr, in_img = pro["Zc"], pro["pxr"], pro["pyr"], pro["in_img"]
    alpha, beta, vox_valid = pro["alpha"], pro["beta"], pro["vox_valid"]

    # --- pass 1: tmp_k[y_img, x] = depth[y_img, c0 + ko] -----------------
    c0 = _pass1_index(alpha, beta, Hp, BX)
    depth_full = depth_ref[...]  # (Hp, Wp)
    tmps = _pass1_gather((depth_full,), c0, nk, BX, Hp, Wp)

    # --- pass 2: val_k[y, x] = tmp_k[pyr, x], then exact-column select ---
    pyrT, c0r = _pass2_index(alpha, beta, pyr, Hp)

    if line_mode:
        # Line mode: the projection of a voxel column IS a straight
        # image line (projective maps send lines to lines), so the
        # line-evaluated column equals the per-voxel projection up to
        # f32 rounding and the row-rounding convention (<= |beta|/2 px).
        # Sample it directly: nk=1 with zero misses for any pose with
        # |beta| <= 1; steeper lines (extreme roll) are skipped and
        # counted, as exact mode does.
        pxr = c0r
        in_img = (
            (c0r >= 0) & (c0r < Wr) & (pyr >= 0) & (pyr < Hr) & vox_valid
        )

    (depth_val,), matched = _pass2_select(
        tmps, pyrT, pxr, c0r, nk, BX, Y, Hp
    )

    if line_mode:
        # steep lines (|beta| > 1, extreme roll) fall outside the
        # row-line convention: skip and count
        matched = matched & (jnp.abs(beta) <= 1.0)

    # --- the TSDF update (identical math to ops/integrate.py) ------------
    # storage may be bf16 (half the HBM stream); compute stays f32
    d = tsdf_ref[0].astype(jnp.float32)
    w = weight_ref[0].astype(jnp.float32)
    sdf = depth_val - Zc
    # Zc > 0 gate: see ops/integrate.py — behind-camera voxels must not
    # receive free-space updates (reference bug, not replicated).
    update = (
        in_img & (Zc > 0.0) & matched & (depth_val > 0.0)
        & (sdf >= -trunc)
    )
    tsdf_obs = jnp.minimum(sdf, trunc)
    new_w = w + 1.0
    new_d = (d * w + tsdf_obs) / new_w
    if cap_weight:
        new_w = jnp.minimum(new_w, max_weight)
    out_tsdf_ref[0] = jnp.where(update, new_d, d).astype(
        out_tsdf_ref.dtype
    )
    out_weight_ref[0] = jnp.where(update, new_w, w).astype(
        out_weight_ref.dtype
    )
    miss_count = jnp.sum((in_img & ~matched).astype(jnp.int32))
    out_miss_ref[0, 0] = jnp.full((8, _LANE), miss_count, jnp.int32)


def _kernel_fast(
    params_ref,  # (1, 24) f32 SMEM
    depth_ref,  # (Hd, Wd) f32 VMEM — DECIMATED depth (rows/dr, cols/dc)
    tsdf_ref,  # (1, Y, BX) f32 VMEM
    weight_ref,  # (1, Y, BX) f32 VMEM
    out_tsdf_ref,
    out_weight_ref,
    out_miss_ref,
    *,
    Y: int,
    BX: int,
    Hd: int,
    Wd: int,
    Hr: int,
    Wr: int,
    Yr: int,
    Xr: int,
    dr: int,
    dc: int,
    cap_weight: bool,
):
    """Decimated line-sweep integrate — the round-4 "lane-span
    compression" prototype (BASELINE.md round-2 analysis: the exact
    kernel is VPU gather-element-throughput bound at ~9 gathered
    elements/voxel: pass 1 sweeps Wp/128 = 5 depth column blocks,
    pass 2 Hp/128 = 4 warp-table row blocks, because a 128-voxel lane
    group's pixel span is 110-443 px at 512^3).

    The compression: sample a (dr x dc)-decimated depth image on the
    column's exact image line evaluated at the decimated row (the line
    convention of mode="line", in decimated coordinates) — the pixel
    span of a lane group shrinks by dc and the row span by dr, so both
    passes sweep ~1-2 blocks instead of 5 + 4 (~3 gathered
    elements/voxel at (2, 4)). RESAMPLING CONVENTION, not exact: the
    sampled pixel sits within dc/2 + |beta|(dr-1) <= ~3 px of the
    reference's rounded projection (dr=2, dc=4, |beta| <= 1); interior
    depth is smooth so the TSDF error is sub-voxel, but silhouette
    pixels can land on the other side of an edge — use for
    throughput-critical fusion where the exact modes' gather bound
    dominates; the default stays exact.
    """
    pro = _rigid_prologue(params_ref, Y=Y, BX=BX, Yr=Yr, Xr=Xr, Hr=Hr, Wr=Wr)
    trunc, max_weight = pro["trunc"], pro["max_weight"]
    Zc, pyr = pro["Zc"], pro["pyr"]
    alpha, beta, vox_valid = pro["alpha"], pro["beta"], pro["vox_valid"]

    # decimated row per voxel + line-evaluated decimated column
    pyd = jnp.clip(pyr, 0, Hr - 1) // dr  # (Y, BX) in [0, ceil(Hr/dr))
    # pass-1 index plane: for each decimated table row r', the line's
    # column at the REAL row r'*dr, in decimated units
    y_img = jax.lax.broadcasted_iota(jnp.int32, (Hd, BX), 0).astype(
        jnp.float32
    )
    c0d = jnp.round(
        jnp.clip(alpha + beta * (y_img * dr), -_BIG, _BIG) / dc
    ).astype(jnp.int32)

    depth_full = depth_ref[...]
    tmps = _pass1_gather((depth_full,), c0d, 1, BX, Hd, Wd)

    # pass 2 at the decimated rows; the line convention needs no match
    pydT = pyd.T
    c0d_at = jnp.round(
        jnp.clip(
            alpha + beta * (pyd.astype(jnp.float32) * dr), -_BIG, _BIG
        )
        / dc
    ).astype(jnp.int32)
    (depth_val,), _matched = _pass2_select(
        tmps, pydT, c0d_at, c0d_at, 1, BX, Y, Hd
    )

    in_img = (
        (pyr >= 0) & (pyr < Hr)
        & (c0d_at * dc >= 0) & (c0d_at * dc < Wr)
        & vox_valid
    )
    # steep lines leave the convention's error bound: skip and count
    matched = jnp.abs(beta) <= 1.0

    d = tsdf_ref[0].astype(jnp.float32)
    w = weight_ref[0].astype(jnp.float32)
    sdf = depth_val - Zc
    update = (
        in_img & (Zc > 0.0) & matched & (depth_val > 0.0)
        & (sdf >= -trunc)
    )
    tsdf_obs = jnp.minimum(sdf, trunc)
    new_w = w + 1.0
    new_d = (d * w + tsdf_obs) / new_w
    if cap_weight:
        new_w = jnp.minimum(new_w, max_weight)
    out_tsdf_ref[0] = jnp.where(update, new_d, d).astype(
        out_tsdf_ref.dtype
    )
    out_weight_ref[0] = jnp.where(update, new_w, w).astype(
        out_weight_ref.dtype
    )
    miss_count = jnp.sum((in_img & ~matched).astype(jnp.int32))
    out_miss_ref[0, 0] = jnp.full((8, _LANE), miss_count, jnp.int32)


def _kernel_warped(
    params_ref,  # (1, 24) f32 SMEM
    depth_ref,  # (Hp, Wp) f32 VMEM
    tsdf_ref,  # (1, Y, BX) VMEM
    weight_ref,  # (1, Y, BX) VMEM
    dx_ref,  # (1, Y, BX) f32 VMEM — deformed world centre x
    dy_ref,  # (1, Y, BX) f32 VMEM
    dz_ref,  # (1, Y, BX) f32 VMEM
    out_tsdf_ref,
    out_weight_ref,
    out_miss_ref,
    # optional trailing ref (emit_mask=True only):
    #   out_mask_ref (1, Y, BX) f32: 1.0 where in-image but unmatched
    *maybe_mask_ref,
    emit_mask: bool,
    Y: int,
    BX: int,
    Hp: int,
    Wp: int,
    Hr: int,
    Wr: int,
    Yr: int,
    Xr: int,
    nk: int,
    cap_weight: bool,
):
    """Deformed-volume integrate (ref: the deformed-centre read in
    integrate_kernel, src/TSDF/TSDFVolume.cu:337-343).

    The warp breaks the rigid kernel's exact line structure, but not the
    whole factorization: pass 1's candidate table is built from the
    *undeformed* lattice lines, while pass 2 gathers per-voxel at the
    *warped* image row — so arbitrary y-displacement is exact for free,
    and only the x-displacement (in pixels) must fall inside the nk
    candidate window. Out-of-window voxels are skipped and counted
    (exact-or-skip, as the rigid kernel): callers escalate nk or fall
    back to the lax path on a nonzero count.

    Dual-band window (round 4, the ICP adaptive-band trick adapted to
    the warp field's actual structure): a SceneFusion deformation is
    BIMODAL within a voxel column — background voxels sit on the rigid
    lattice (pixel deviation ~0 up to rounding) while the deformed
    surface shell is displaced by the accumulated flow (measured on a
    large-deformation sequence by tools/probe_sf_warp.py: deviations
    cluster at 0 and at the flow magnitude, tens of pixels). So pass 1
    gathers TWO nk-candidate windows per column: one at the rigid line
    (exact for the background mode, like the rigid kernel) and one
    shifted by the mid-range of the column's clearly-deformed
    deviations (|dev| >= 2, above rounding noise). A uniform or
    locally-smooth flow of ANY pixel magnitude is thereby exact; only
    voxels whose deviation falls between the modes (or a shell whose
    within-column flow variation exceeds nk - 1) are skipped and
    counted, vs the old absolute bound of (nk-1)/2 px for EVERY
    deformed voxel.
    """
    # shared prologue computes the rigid lattice projection/line; only
    # the per-voxel projection is redone below on the DEFORMED centres
    pro = _rigid_prologue(params_ref, Y=Y, BX=BX, Yr=Yr, Xr=Xr, Hr=Hr, Wr=Wr)
    trunc, max_weight = pro["trunc"], pro["max_weight"]
    vox_valid = pro["vox_valid"]
    alpha, beta = pro["alpha"], pro["beta"]
    (r00, r01, r02, t0), (r10, r11, r12, t1), (r20, r21, r22, t2) = (
        pro["rows"]
    )
    fx, fy, cx0, cy0 = pro["intr"]

    # --- exact per-voxel projection of the DEFORMED centres --------------
    wx = dx_ref[0]
    wy = dy_ref[0]
    wz = dz_ref[0]
    Xc = r00 * wx + r01 * wy + r02 * wz + t0
    Yc = r10 * wx + r11 * wy + r12 * wz + t1
    Zc = r20 * wx + r21 * wy + r22 * wz + t2
    px = fx * Xc / Zc + cx0
    py = fy * Yc / Zc + cy0
    px = jnp.where(jnp.isfinite(px), jnp.clip(px, -_BIG, _BIG), -1.0)
    py = jnp.where(jnp.isfinite(py), jnp.clip(py, -_BIG, _BIG), -1.0)
    pxr = jnp.round(px).astype(jnp.int32)
    pyr = jnp.round(py).astype(jnp.int32)
    in_img = (
        (pxr >= 0) & (pxr < Wr) & (pyr >= 0) & (pyr < Hr) & vox_valid
    )

    # --- per-column linear deformed-mode band ----------------------------
    # deviation of the warped column from the rigid line evaluated at
    # the warped row (columns run along voxel y = sublanes). The
    # deformed mode's deviation varies SMOOTHLY along a column (the
    # pixel displacement of a ~constant mm warp scales with 1/Zc), so a
    # constant shift leaves tens of pixels of within-column range on
    # deep columns — fit dev ~ a + b*row per column (least squares over
    # clearly-deformed voxels, |dev| >= 2; rounding noise stays in the
    # base window) and shift the second band along that line.
    pyrT, c0r = _pass2_index(alpha, beta, pyr, Hp)
    dev = (pxr - c0r).astype(jnp.float32)  # (Y, BX)
    dev_ok = in_img & (jnp.abs(dev) >= 2.0)
    wgt = dev_ok.astype(jnp.float32)
    rr = pyr.astype(jnp.float32)
    n_ok = jnp.sum(wgt, axis=0, keepdims=True)
    Sr = jnp.sum(wgt * rr, axis=0, keepdims=True)
    Sd = jnp.sum(wgt * dev, axis=0, keepdims=True)
    Srr = jnp.sum(wgt * rr * rr, axis=0, keepdims=True)
    Srd = jnp.sum(wgt * rr * dev, axis=0, keepdims=True)
    var = n_ok * Srr - Sr * Sr
    b_fit = jnp.where(
        var > 1e-3, (n_ok * Srd - Sr * Sd) / jnp.maximum(var, 1e-3), 0.0
    )
    b_fit = jnp.clip(b_fit, -8.0, 8.0)
    a_fit = jnp.where(
        n_ok > 0.0, (Sd - b_fit * Sr) / jnp.maximum(n_ok, 1.0), 0.0
    )
    a_fit = jnp.clip(a_fit, -65536.0, 65536.0)

    def band_shift(rows_f):
        # IDENTICAL expression in both passes so the pass-1 table and
        # the pass-2 match agree bit-for-bit at equal row values
        return jnp.round(a_fit + b_fit * rows_f).astype(jnp.int32)

    # --- pass 1: base window (rigid line) + linearly-shifted window ------
    c0p1 = _pass1_index(alpha, beta, Hp, BX)
    y_img_f = jax.lax.broadcasted_iota(jnp.int32, (Hp, BX), 0).astype(
        jnp.float32
    )
    depth_full = depth_ref[...]
    tmps_base = _pass1_gather((depth_full,), c0p1, nk, BX, Hp, Wp)
    tmps_shift = _pass1_gather(
        (depth_full,), c0p1 + band_shift(y_img_f), nk, BX, Hp, Wp
    )

    # --- pass 2 at the WARPED rows + exact-column select on both bands ---
    shift_at = band_shift(rr)  # (Y, BX) at each voxel's warped row
    (val_b,), matched_b = _pass2_select(
        tmps_base, pyrT, pxr, c0r, nk, BX, Y, Hp
    )
    (val_s,), matched_s = _pass2_select(
        tmps_shift, pyrT, pxr, c0r + shift_at, nk, BX, Y, Hp
    )
    depth_val = jnp.where(matched_b, val_b, val_s)
    matched = matched_b | matched_s

    # --- the TSDF update (identical math) --------------------------------
    d = tsdf_ref[0].astype(jnp.float32)
    w = weight_ref[0].astype(jnp.float32)
    sdf = depth_val - Zc
    update = (
        in_img & (Zc > 0.0) & matched & (depth_val > 0.0)
        & (sdf >= -trunc)
    )
    tsdf_obs = jnp.minimum(sdf, trunc)
    new_w = w + 1.0
    new_d = (d * w + tsdf_obs) / new_w
    if cap_weight:
        new_w = jnp.minimum(new_w, max_weight)
    out_tsdf_ref[0] = jnp.where(update, new_d, d).astype(
        out_tsdf_ref.dtype
    )
    out_weight_ref[0] = jnp.where(update, new_w, w).astype(
        out_weight_ref.dtype
    )
    missed = in_img & ~matched
    miss_count = jnp.sum(missed.astype(jnp.int32))
    out_miss_ref[0, 0] = jnp.full((8, _LANE), miss_count, jnp.int32)
    if emit_mask:
        # per-voxel miss mask: consumed by warped_miss_topup, which
        # redoes exactly these voxels through the sorted matmul
        # gather/scatter so a frame with misses never needs the
        # full-volume lax fallback. Omitted when return_mask=False —
        # a full (Z, Y, X) f32 stream is ~25% extra HBM traffic.
        maybe_mask_ref[0][0] = missed.astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("cap_weight", "nk", "interpret", "mode"),
)
def integrate_pallas(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    cap_weight: bool = False,
    nk: int = 3,
    interpret: bool = False,
    mode: str = "exact",
) -> tuple[TSDFVolume, jnp.ndarray]:
    """Fuse one depth frame (rigid path) with the Pallas kernel.

    Args:
      vol: volume pytree; ``deform`` must be None (rigid). The non-rigid
        path uses ops/integrate.py or integrate_warped_pallas.
      depth: (H, W) mm depth, u16/f32; zero = no data.
      camera: Camera with pose = camera->world.
      nk: number of candidate depth columns (odd, mode="exact" only).
        nk=3 is exact for |beta| <= 1 (upright-ish cameras); raise to 5
        for extreme roll.
      mode:
        "exact" — the depth pixel is round(project(voxel)) exactly as
          the reference computes it (ref: world_to_pixel,
          cuda_coordinate_transforms.cu:10-30), found by matching the
          per-voxel column against nk candidates on the column's image
          line; unmatched voxels are skipped and counted.
        "line" — the depth pixel column is evaluated ON the column's
          exact image line at the rounded row (projective maps send
          lines to lines, so this is the same mathematical projection;
          only the f32 rounding convention differs by <= 1 px at
          half-pixel boundaries / |beta|/2 sub-pixel from row rounding).
          Always nk=1: ~2x faster than exact nk=3 for generic poses with
          zero misses; columns steeper than |beta| = 1 (extreme roll)
          are skipped and counted.
        "fast" — the line convention on a (2 x 4)-decimated depth image
          (lane-span compression, see _kernel_fast): ~3 gathered
          elements/voxel instead of ~9, at the cost of a documented
          <= ~3 px resampling convention (sub-voxel TSDF error on
          smooth depth; silhouette pixels can land across an edge).
          NOT exact — accuracy-critical fusion should use exact/line.

    Returns:
      (updated volume, miss_count) — miss_count is the number of
      in-frustum voxels skipped (0 in normal operation; nonzero signals
      extreme camera roll: re-run with larger nk / mode="exact" /
      ops.integrate).
    """
    if mode not in ("exact", "line", "fast"):
        raise ValueError(
            f"mode must be 'exact', 'line' or 'fast', got {mode!r}"
        )
    if mode in ("line", "fast"):
        nk = 1
    if vol.deform is not None:
        raise ValueError(
            "integrate_pallas is the rigid path; use ops.integrate for "
            "deformed volumes"
        )
    Z, Yr, Xr = vol.tsdf.shape
    Hr, Wr = depth.shape

    Y = _round_up(Yr, _LANE)
    X = _round_up(Xr, _LANE)
    Hp = _round_up(Hr, _LANE)  # padded so Hp/_LANE pass-2 blocks tile it
    Wp = _round_up(Wr, _LANE)

    depth_f = jnp.asarray(depth, jnp.float32)

    if mode == "fast":
        # (dr x dc)-decimated depth: lane-span compression (see
        # _kernel_fast). Strided slicing happens in XLA, outside the
        # kernel.
        dr, dc = 2, 4
        dep_d = depth_f[::dr, ::dc]
        Hd_r, Wd_r = dep_d.shape
        Hd = _round_up(Hd_r, _LANE)
        Wd = _round_up(Wd_r, _LANE)
        dep_d = jnp.pad(dep_d, ((0, Hd - Hd_r), (0, Wd - Wd_r)))
    if (Hp, Wp) != (Hr, Wr):
        depth_f = jnp.pad(depth_f, ((0, Hp - Hr), (0, Wp - Wr)))

    tsdf = vol.tsdf
    weight = vol.weight
    if (Y, X) != (Yr, Xr):
        pad = ((0, 0), (0, Y - Yr), (0, X - Xr))
        tsdf = jnp.pad(tsdf, pad)
        weight = jnp.pad(weight, pad)

    # Per-program VMEM: in/out slab blocks + tmp warps + index planes must
    # fit in 16MB with double buffering; BX=128 keeps 512^3 at ~10MB.
    BX = min(X, _LANE)
    n_xb = X // BX

    params = _pack_params(vol, camera)

    if mode == "fast":
        kern = partial(
            _kernel_fast,
            Y=Y, BX=BX, Hd=Hd, Wd=Wd, Hr=Hr, Wr=Wr, Yr=Yr, Xr=Xr,
            dr=dr, dc=dc, cap_weight=cap_weight,
        )
        depth_f = dep_d
        Hp, Wp = Hd, Wd  # the depth BlockSpec below uses (Hp, Wp)
    else:
        kern = partial(
            _kernel,
            Y=Y,
            BX=BX,
            Hp=Hp,
            Wp=Wp,
            Hr=Hr,
            Wr=Wr,
            Yr=Yr,
            Xr=Xr,
            nk=nk,
            cap_weight=cap_weight,
            line_mode=(mode == "line"),
        )

    new_tsdf, new_weight, miss = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Z, Y, X), vol.tsdf.dtype),
            jax.ShapeDtypeStruct((Z, Y, X), vol.weight.dtype),
            jax.ShapeDtypeStruct((Z, n_xb, 8, _LANE), jnp.int32),
        ),
        grid=(Z, n_xb),
        in_specs=[
            pl.BlockSpec((1, 24), lambda z, xb: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Hp, Wp), lambda z, xb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, BX), lambda z, xb: (z, 0, xb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, BX), lambda z, xb: (z, 0, xb), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Y, BX), lambda z, xb: (z, 0, xb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, BX), lambda z, xb: (z, 0, xb), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 8, _LANE),
                lambda z, xb: (z, xb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(params, depth_f, tsdf, weight)

    if (Y, X) != (Yr, Xr):
        new_tsdf = new_tsdf[:, :Yr, :Xr]
        new_weight = new_weight[:, :Yr, :Xr]

    return (
        vol.replace(tsdf=new_tsdf, weight=new_weight),
        jnp.sum(miss[:, :, 0, 0]),
    )


@partial(
    jax.jit,
    static_argnames=("cap_weight", "nk", "interpret", "return_mask"),
)
def integrate_warped_pallas(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    cap_weight: bool = False,
    nk: int = 5,
    interpret: bool = False,
    return_mask: bool = False,
) -> tuple[TSDFVolume, jnp.ndarray]:
    """Fuse one depth frame into a DEFORMED volume with the warped
    line-sweep kernel (non-rigid path; ref: deformed-centre integrate
    src/TSDF/TSDFVolume.cu:337-343).

    Exact-or-skip: a voxel whose warped projection falls outside the nk
    candidate columns around its column's band-shifted lattice line is
    skipped and counted. Vertical (image-y) warp displacement is
    unbounded, and the horizontal window base adapts per voxel column
    (the mid-range of the column's actual pixel deviations), so a
    smooth or uniform x-warp of ANY magnitude is exact (dual-band
    window, see _kernel_warped); only voxels whose deviation falls
    between the background and deformed modes are skipped and counted.
    Callers pass ``return_mask=True`` and hand the per-voxel miss mask
    to ``warped_miss_topup``, which fuses EXACTLY the missed voxels —
    so no frame ever needs the full-volume lax fallback (see
    pipelines/scenefusion.py).

    Returns (updated volume, miss count[, miss mask f32 (Z, Y, X)]).
    """
    if vol.deform is None:
        raise ValueError(
            "integrate_warped_pallas needs vol.deform; use "
            "integrate_pallas for rigid volumes"
        )
    Z, Yr, Xr = vol.tsdf.shape
    Hr, Wr = depth.shape

    Y = _round_up(Yr, _LANE)
    X = _round_up(Xr, _LANE)
    Hp = _round_up(Hr, _LANE)
    Wp = _round_up(Wr, _LANE)

    depth_f = jnp.asarray(depth, jnp.float32)
    if (Hp, Wp) != (Hr, Wr):
        depth_f = jnp.pad(depth_f, ((0, Hp - Hr), (0, Wp - Wr)))

    tsdf = vol.tsdf
    weight = vol.weight
    # deformed world centres, split into 3 planes for (1, Y, BX) blocks
    dx = vol.deform[..., 0]
    dy = vol.deform[..., 1]
    dz = vol.deform[..., 2]
    if (Y, X) != (Yr, Xr):
        pad = ((0, 0), (0, Y - Yr), (0, X - Xr))
        tsdf = jnp.pad(tsdf, pad)
        weight = jnp.pad(weight, pad)
        # pad with 1.0 so padded voxels project finitely (and are masked)
        dx = jnp.pad(dx, pad, constant_values=1.0)
        dy = jnp.pad(dy, pad, constant_values=1.0)
        dz = jnp.pad(dz, pad, constant_values=1.0)

    BX = min(X, _LANE)
    n_xb = X // BX

    params = _pack_params(vol, camera)

    kern = partial(
        _kernel_warped,
        emit_mask=return_mask,
        Y=Y, BX=BX, Hp=Hp, Wp=Wp, Hr=Hr, Wr=Wr, Yr=Yr, Xr=Xr,
        nk=nk, cap_weight=cap_weight,
    )

    vol_spec = pl.BlockSpec(
        (1, Y, BX), lambda z, xb: (z, 0, xb), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((Z, Y, X), vol.tsdf.dtype),
        jax.ShapeDtypeStruct((Z, Y, X), vol.weight.dtype),
        jax.ShapeDtypeStruct((Z, n_xb, 8, _LANE), jnp.int32),
    ]
    out_specs = [
        vol_spec,
        vol_spec,
        pl.BlockSpec(
            (1, 1, 8, _LANE),
            lambda z, xb: (z, xb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if return_mask:
        # the mask output is compiled out when unused — it is a full
        # (Z, Y, X) f32 HBM stream, ~25% extra volume traffic
        out_shape.append(jax.ShapeDtypeStruct((Z, Y, X), jnp.float32))
        out_specs.append(vol_spec)
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(Z, n_xb),
        in_specs=[
            pl.BlockSpec((1, 24), lambda z, xb: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Hp, Wp), lambda z, xb: (0, 0), memory_space=pltpu.VMEM),
            vol_spec, vol_spec, vol_spec, vol_spec, vol_spec,
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
        # the dual-band window doubles the pass-1 tmps: ~30 MB of
        # scoped vmem at 512^3, past the conservative 16 MB default
        # (v5e VMEM is 128 MB; same cure as the pose adjoint)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
    )(params, depth_f, tsdf, weight, dx, dy, dz)
    new_tsdf, new_weight, miss = outs[:3]

    if (Y, X) != (Yr, Xr):
        new_tsdf = new_tsdf[:, :Yr, :Xr]
        new_weight = new_weight[:, :Yr, :Xr]

    out_vol = vol.replace(tsdf=new_tsdf, weight=new_weight)
    miss_total = jnp.sum(miss[:, :, 0, 0])
    if return_mask:
        mask = outs[3]
        if (Y, X) != (Yr, Xr):
            mask = mask[:, :Yr, :Xr]
        return out_vol, miss_total, mask
    return out_vol, miss_total


@partial(jax.jit, static_argnames=("cap_weight", "max_topup"))
def warped_miss_topup(
    vol: TSDFVolume,
    mask: jnp.ndarray,
    depth: jnp.ndarray,
    camera: Camera,
    cap_weight: bool = False,
    max_topup: int = 1 << 16,
) -> tuple[TSDFVolume, jnp.ndarray]:
    """Fuse exactly the voxels the warped kernel skipped (round 4).

    ``vol`` is the kernel's OUTPUT volume and ``mask`` its per-voxel
    miss mask (integrate_warped_pallas(return_mask=True)): each masked
    voxel received no observation, so its update is the plain running
    mean with ONE observation — no volume-state gathers are needed,
    only the voxel's deformed centre (3 channels) and one depth pixel.
    All data movement runs through the sorted matmul gather/scatter
    (ops/scatter.py), never the XLA gather lowering:

      1. one (mask, index) sort compacts the first ``max_topup`` missed
         voxel ids (ascending);
      2. gather_flat pulls their deformed centres and the projected
         depth pixels;
      3. scatter_add_flat lands (observation, count) per voxel and an
         elementwise merge applies the running mean.

    Exactness: identical update math and gates as the kernel
    (projection of the deformed centre, round-to-pixel, depth > 0,
    sdf >= -trunc, Zc > 0). Intended use: the caller reads the miss
    count (one host sync it already does) and invokes this only on
    frames with misses — a zero-miss frame costs nothing.

    Returns (volume, remaining): ``remaining`` > 0 only when misses
    exceeded ``max_topup`` (fall back to ops.integrate then).
    """
    new_tsdf, new_weight, remaining = _topup_arrays(
        vol.tsdf, vol.weight, vol.deform, mask, depth,
        camera.k, camera.pose_inv, vol.truncation_distance,
        vol.max_weight, cap_weight, int(max_topup),
    )
    return vol.replace(tsdf=new_tsdf, weight=new_weight), remaining


def _topup_arrays(
    tsdf, weight, deform, mask, depth, kmat, pose_inv, trunc,
    max_weight, cap_weight: bool, K: int,
):
    """Array-level core of ``warped_miss_topup`` — also runs PER BRICK
    inside the sharded path's shard_map (everything is plain jnp +
    the sorted matmul gather/scatter, so it is SPMD-safe; voxel ids,
    the sort and the scatter are all brick-local)."""
    Z, Yr, Xr = tsdf.shape
    Hr, Wr = depth.shape
    N = Z * Yr * Xr

    from ..ops.scatter import gather_flat, scatter_add_flat

    flat = mask.reshape(-1).astype(jnp.float32)
    idx = jnp.arange(N, dtype=jnp.int32)
    keys, sidx = jax.lax.sort([1.0 - flat, idx], num_keys=1)
    ids = sidx[:K]
    is_miss = keys[:K] < 0.5

    # deformed world centres of the candidates (one 3-channel gather)
    dc = gather_flat(deform.reshape(-1, 3), ids)  # (K, 3)
    pi = pose_inv
    fx, fy, cx, cy = kmat[0, 0], kmat[1, 1], kmat[0, 2], kmat[1, 2]
    wx, wy, wz = dc[:, 0], dc[:, 1], dc[:, 2]
    Xc = pi[0, 0] * wx + pi[0, 1] * wy + pi[0, 2] * wz + pi[0, 3]
    Yc = pi[1, 0] * wx + pi[1, 1] * wy + pi[1, 2] * wz + pi[1, 3]
    Zc = pi[2, 0] * wx + pi[2, 1] * wy + pi[2, 2] * wz + pi[2, 3]
    safe_z = jnp.where(Zc == 0.0, 1e-12, Zc)
    px = fx * Xc / safe_z + cx
    py = fy * Yc / safe_z + cy
    px = jnp.where(jnp.isfinite(px), px, -1.0)
    py = jnp.where(jnp.isfinite(py), py, -1.0)
    pxr = jnp.round(px).astype(jnp.int32)
    pyr = jnp.round(py).astype(jnp.int32)
    in_img = (
        is_miss
        & (pxr >= 0) & (pxr < Wr) & (pyr >= 0) & (pyr < Hr)
        & (Zc > 0.0)
    )
    lin_pix = jnp.where(in_img, pyr * Wr + pxr, Hr * Wr)
    dval = gather_flat(
        jnp.asarray(depth, jnp.float32).reshape(-1), lin_pix,
        fill_mode="zero",
    )

    sdf = dval - Zc
    update = in_img & (dval > 0.0) & (sdf >= -trunc)
    obs = jnp.minimum(sdf, trunc)
    targets = jnp.where(update, ids, N)  # off-the-end drop
    acc = scatter_add_flat(
        N, targets,
        jnp.stack([jnp.where(update, obs, 0.0),
                   update.astype(jnp.float32)]),
    )  # (2, N)
    obs_sum = acc[0].reshape(Z, Yr, Xr)
    cnt = acc[1].reshape(Z, Yr, Xr)

    d = tsdf.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    new_w = w + cnt
    new_d = jnp.where(cnt > 0.0, (d * w + obs_sum) / new_w, d)
    if cap_weight:
        # Clamp only voxels that actually received observations this
        # top-up: pre-existing weights above max_weight (accumulated with
        # capping off) must pass through untouched, matching the warped
        # kernel's where(update, capped, w) semantics.
        new_w = jnp.where(cnt > 0.0, jnp.minimum(new_w, max_weight), w)
    remaining = (jnp.sum(flat) - jnp.sum(is_miss.astype(jnp.float32))
                 ).astype(jnp.int32)
    return (
        new_d.astype(tsdf.dtype),
        new_w.astype(weight.dtype),
        remaining,
    )


def integrate_auto(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    cap_weight: bool = False,
    nk: int = 1,
    interpret: bool = False,
):
    """Adaptive-candidate integrate: run with a cheap candidate count and
    escalate only when the exact-or-skip miss counter reports misses.

    The kernel's cost is linear in nk (~5.9 ms/candidate at 512^3) and
    nk=1 is exact whenever |beta| <= 0.5 — true for any near-axis camera
    — so the common case runs ~2x faster than the always-safe nk=3. The
    miss counter makes this lossless: a frame with misses is recomputed
    at nk=3 (and finally nk=5) before any voxel is skipped. The miss
    readback forces one device sync per frame; fusion loops already sync
    per frame for tracking.

    Returns (volume, final miss count).
    """
    out, miss = integrate_pallas(
        vol, depth, camera, cap_weight=cap_weight, nk=nk,
        interpret=interpret,
    )
    while int(miss) > 0 and nk < 5:
        nk = min(nk + 2, 5)
        out, miss = integrate_pallas(
            vol, depth, camera, cap_weight=cap_weight, nk=nk,
            interpret=interpret,
        )
    return out, miss


def _kernel_color(
    params_ref,  # (1, 24) f32 SMEM
    depth_ref,  # (Hp, Wp) f32 VMEM
    rgbp_ref,  # (Hp, Wp) f32 VMEM — packed r*65536 + g*256 + b (24-bit)
    tsdf_ref,  # (1, Y, BX) VMEM
    weight_ref,  # (1, Y, BX) VMEM
    cr_ref,  # (1, Y, BX) f32 VMEM — colour planes
    cg_ref,
    cb_ref,
    out_tsdf_ref,
    out_weight_ref,
    out_cr_ref,
    out_cg_ref,
    out_cb_ref,
    out_miss_ref,
    *,
    Y: int,
    BX: int,
    Hp: int,
    Wp: int,
    Hr: int,
    Wr: int,
    Yr: int,
    Xr: int,
    nk: int,
    cap_weight: bool,
    line_mode: bool = False,
    dr: int = 0,  # fast mode: row/column decimation factors (0 = off;
    dc: int = 0,  # Hp/Wp then carry the DECIMATED padded table dims)
):
    """Colour-fusing variant of ``_kernel``: the RGB frame rides a second
    table through the SHARED ``_pass1_gather``/``_pass2_select``/
    ``_fit_column_lines`` machinery (one lookup implementation for the
    rigid/warped/colour kernels).

    f32 table (24-bit packed, exact) through the SAME two-pass line-warp
    lookup — the index math, candidate membership masks and match select
    are shared, so colour costs one extra gather per pass, not a second
    sweep. Blend semantics match ops/integrate.py's floored-rate colour
    path exactly (the capability the reference allocates but never
    writes, ref: TSDFVolume.cu m_colours). ``dr``/``dc`` > 0 switch to
    the decimated line convention of ``_kernel_fast`` (lane-span
    compression; both tables ride the same decimated indices)."""
    pro = _rigid_prologue(params_ref, Y=Y, BX=BX, Yr=Yr, Xr=Xr, Hr=Hr, Wr=Wr)
    trunc, max_weight = pro["trunc"], pro["max_weight"]
    Zc, pxr, pyr, in_img = pro["Zc"], pro["pxr"], pro["pyr"], pro["in_img"]
    alpha, beta, vox_valid = pro["alpha"], pro["beta"], pro["vox_valid"]

    depth_full = depth_ref[...]
    rgbp_full = rgbp_ref[...]
    if dr:
        # decimated line convention (see _kernel_fast)
        pyd = jnp.clip(pyr, 0, Hr - 1) // dr
        y_img = jax.lax.broadcasted_iota(jnp.int32, (Hp, BX), 0).astype(
            jnp.float32
        )
        c0 = jnp.round(
            jnp.clip(alpha + beta * (y_img * dr), -_BIG, _BIG) / dc
        ).astype(jnp.int32)
        tmps = _pass1_gather((depth_full, rgbp_full), c0, 1, BX, Hp, Wp)
        pyrT = pyd.T
        c0r = jnp.round(
            jnp.clip(
                alpha + beta * (pyd.astype(jnp.float32) * dr),
                -_BIG, _BIG,
            )
            / dc
        ).astype(jnp.int32)
        pxr = c0r
        in_img = (
            (pyr >= 0) & (pyr < Hr)
            & (c0r * dc >= 0) & (c0r * dc < Wr)
            & vox_valid
        )
    else:
        # --- pass 1 over BOTH tables (shared index math) ------------------
        c0 = _pass1_index(alpha, beta, Hp, BX)
        tmps = _pass1_gather((depth_full, rgbp_full), c0, nk, BX, Hp, Wp)

        # --- pass 2 at the voxel rows + exact-column select ---------------
        pyrT, c0r = _pass2_index(alpha, beta, pyr, Hp)

        if line_mode:
            pxr = c0r
            in_img = (
                (c0r >= 0) & (c0r < Wr) & (pyr >= 0) & (pyr < Hr)
                & vox_valid
            )

    (depth_val, rgb_val), matched = _pass2_select(
        tmps, pyrT, pxr, c0r, nk, BX, Y, Hp
    )

    if line_mode or dr:
        matched = matched & (jnp.abs(beta) <= 1.0)

    # --- TSDF + colour update (identical math to ops/integrate.py) -------
    d = tsdf_ref[0].astype(jnp.float32)
    w = weight_ref[0].astype(jnp.float32)
    sdf = depth_val - Zc
    update = (
        in_img & (Zc > 0.0) & matched & (depth_val > 0.0)
        & (sdf >= -trunc)
    )
    tsdf_obs = jnp.minimum(sdf, trunc)
    new_w = w + 1.0
    new_d = (d * w + tsdf_obs) / new_w
    capped_w = jnp.minimum(new_w, max_weight) if cap_weight else new_w
    out_tsdf_ref[0] = jnp.where(update, new_d, d).astype(
        out_tsdf_ref.dtype
    )
    out_weight_ref[0] = jnp.where(update, capped_w, w).astype(
        out_weight_ref.dtype
    )

    # unpack the 24-bit colour (exact in f32)
    obs_r = jnp.floor(rgb_val / 65536.0)
    rem = rgb_val - obs_r * 65536.0
    obs_g = jnp.floor(rem / 256.0)
    obs_b = rem - obs_g * 256.0
    col_update = update & (jnp.abs(sdf) < trunc)
    # ops/integrate.py computes the rate from the (possibly capped) new
    # weight; match it exactly
    rate = jnp.maximum(1.0 / capped_w, 1.0 / max_weight)
    for ref_in, ref_out, obs in (
        (cr_ref, out_cr_ref, obs_r),
        (cg_ref, out_cg_ref, obs_g),
        (cb_ref, out_cb_ref, obs_b),
    ):
        old = ref_in[0]
        blended = old + rate * (obs - old)
        ref_out[0] = jnp.where(col_update, blended, old)

    miss_count = jnp.sum((in_img & ~matched).astype(jnp.int32))
    out_miss_ref[0, 0] = jnp.full((8, _LANE), miss_count, jnp.int32)


@partial(
    jax.jit,
    static_argnames=("cap_weight", "nk", "interpret", "mode"),
)
def integrate_color_pallas(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    rgb: jnp.ndarray,
    camera: Camera,
    cap_weight: bool = False,
    nk: int = 3,
    interpret: bool = False,
    mode: str = "line",
) -> tuple[TSDFVolume, jnp.ndarray]:
    """Fuse one depth + colour frame (rigid path) with the Pallas kernel.

    Same exact-or-skip line-warp lookup as ``integrate_pallas``; the RGB
    frame rides a second 24-bit-packed f32 table through the shared
    two-pass gather, and colour blends with ops/integrate.py's
    floored-rate semantics (bit-equal u8 output). The lax colour path is
    a pathological XLA gather on TPU; this is the production colour
    fusion. ``mode="fast"`` applies the (2 x 4)-decimated line
    convention to BOTH tables (see integrate_pallas): sub-voxel TSDF
    error, and colour within ~1/255 on locally-smooth imagery (the
    <= ~3 px resample picks a neighbouring pixel, so high-frequency
    colour detail shifts accordingly — silhouette voxels can take the
    other side's colour).

    Returns (updated volume, miss count).
    """
    if mode not in ("exact", "line", "fast"):
        raise ValueError(
            f"mode must be 'exact', 'line' or 'fast', got {mode!r}"
        )
    if mode in ("line", "fast"):
        nk = 1
    if vol.deform is not None:
        raise ValueError("integrate_color_pallas is the rigid path")
    if vol.color is None:
        raise ValueError(
            "volume has no colour field; use make_volume(with_color=True)"
        )
    rgb = jnp.asarray(rgb)
    if rgb.shape[:2] != depth.shape[:2]:
        raise ValueError(
            f"colour frame {rgb.shape[:2]} does not match depth "
            f"{depth.shape[:2]}"
        )
    Z, Yr, Xr = vol.tsdf.shape
    Hr, Wr = depth.shape

    Y = _round_up(Yr, _LANE)
    X = _round_up(Xr, _LANE)
    Hp = _round_up(Hr, _LANE)
    Wp = _round_up(Wr, _LANE)

    depth_f = jnp.asarray(depth, jnp.float32)
    rgb_f = rgb.astype(jnp.float32)
    rgbp = (
        rgb_f[..., 0] * 65536.0 + rgb_f[..., 1] * 256.0 + rgb_f[..., 2]
    )  # 24-bit packed: exact in f32
    dr = dc = 0
    if mode == "fast":
        # (dr x dc)-decimated tables: both ride the same decimated line
        # indices (lane-span compression, see _kernel_fast)
        dr, dc = 2, 4
        depth_f = depth_f[::dr, ::dc]
        rgbp = rgbp[::dr, ::dc]
        Hd_r, Wd_r = depth_f.shape
        Hp = _round_up(Hd_r, _LANE)
        Wp = _round_up(Wd_r, _LANE)
        depth_f = jnp.pad(depth_f, ((0, Hp - Hd_r), (0, Wp - Wd_r)))
        rgbp = jnp.pad(rgbp, ((0, Hp - Hd_r), (0, Wp - Wd_r)))
    elif (Hp, Wp) != (Hr, Wr):
        depth_f = jnp.pad(depth_f, ((0, Hp - Hr), (0, Wp - Wr)))
        rgbp = jnp.pad(rgbp, ((0, Hp - Hr), (0, Wp - Wr)))

    tsdf = vol.tsdf
    weight = vol.weight
    cr = vol.color[..., 0].astype(jnp.float32)
    cg = vol.color[..., 1].astype(jnp.float32)
    cb = vol.color[..., 2].astype(jnp.float32)
    if (Y, X) != (Yr, Xr):
        pad = ((0, 0), (0, Y - Yr), (0, X - Xr))
        tsdf = jnp.pad(tsdf, pad)
        weight = jnp.pad(weight, pad)
        cr = jnp.pad(cr, pad)
        cg = jnp.pad(cg, pad)
        cb = jnp.pad(cb, pad)

    BX = min(X, _LANE)
    n_xb = X // BX

    params = _pack_params(vol, camera)

    kern = partial(
        _kernel_color,
        Y=Y, BX=BX, Hp=Hp, Wp=Wp, Hr=Hr, Wr=Wr, Yr=Yr, Xr=Xr,
        nk=nk, cap_weight=cap_weight, line_mode=(mode == "line"),
        dr=dr, dc=dc,
    )

    vol_spec = pl.BlockSpec(
        (1, Y, BX), lambda z, xb: (z, 0, xb), memory_space=pltpu.VMEM
    )
    img_spec = pl.BlockSpec(
        (Hp, Wp), lambda z, xb: (0, 0), memory_space=pltpu.VMEM
    )
    new_tsdf, new_weight, ncr, ncg, ncb, miss = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Z, Y, X), vol.tsdf.dtype),
            jax.ShapeDtypeStruct((Z, Y, X), vol.weight.dtype),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, n_xb, 8, _LANE), jnp.int32),
        ),
        grid=(Z, n_xb),
        in_specs=[
            pl.BlockSpec(
                (1, 24), lambda z, xb: (0, 0), memory_space=pltpu.SMEM
            ),
            img_spec,
            img_spec,
            vol_spec, vol_spec, vol_spec, vol_spec, vol_spec,
        ],
        out_specs=(
            vol_spec, vol_spec, vol_spec, vol_spec, vol_spec,
            pl.BlockSpec(
                (1, 1, 8, _LANE),
                lambda z, xb: (z, xb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(params, depth_f, rgbp, tsdf, weight, cr, cg, cb)

    if (Y, X) != (Yr, Xr):
        new_tsdf = new_tsdf[:, :Yr, :Xr]
        new_weight = new_weight[:, :Yr, :Xr]
        ncr = ncr[:, :Yr, :Xr]
        ncg = ncg[:, :Yr, :Xr]
        ncb = ncb[:, :Yr, :Xr]

    new_color = jnp.clip(
        jnp.round(jnp.stack([ncr, ncg, ncb], axis=-1)), 0, 255
    ).astype(jnp.uint8)
    return (
        vol.replace(tsdf=new_tsdf, weight=new_weight, color=new_color),
        jnp.sum(miss[:, :, 0, 0]),
    )


def _kernel_pose_grad(
    params_ref,  # (1, 24) f32 SMEM
    depth_ref,  # (Hp, Wp) f32 VMEM
    gx_ref,  # (Hp, Wp) f32 VMEM — depth image x-gradient (mm/px)
    gy_ref,  # (Hp, Wp) f32 VMEM
    tsdf_ref,  # (1, Y, BX) VMEM
    weight_ref,  # (1, Y, BX) VMEM
    gbar_d_ref,  # (1, Y, BX) f32 VMEM — cotangent of new_tsdf
    gbar_w_ref,  # (1, Y, BX) f32 VMEM — cotangent of new_weight
    out_dd_ref,  # (1, Y, BX) f32 — cotangent into tsdf_in
    out_dw_ref,  # (1, Y, BX) f32 — cotangent into weight_in
    out_dxi_ref,  # (1, 1, 96, 128) f32 — 12 block-partial pose_inv sums
    *,
    Y: int,
    BX: int,
    Hp: int,
    Wp: int,
    Hr: int,
    Wr: int,
    Yr: int,
    Xr: int,
    nk: int,
    cap_weight: bool,
    image_term: bool,
    line_mode: bool = False,
):
    """Backward of the integrate w.r.t. the camera pose_inv matrix
    (rows R_wc | t_wc), plus the volume cotangents — the production
    adjoint of ``_kernel`` (twist semantics chain through se3_exp by
    ordinary AD; equality gate: ops/integrate_diff.py). The depth image
    AND its two gradient images ride the shared three-table line-warp
    lookup, so the backward costs ~1.5x one forward pass. With
    ``line_mode`` the lookup and gates replicate the forward's "line"
    convention (nk=1): the adjoint must gate EXACTLY like the forward
    it differentiates, column convention included."""
    pro = _rigid_prologue(params_ref, Y=Y, BX=BX, Yr=Yr, Xr=Xr, Hr=Hr, Wr=Wr)
    trunc, max_weight = pro["trunc"], pro["max_weight"]
    fx, fy = pro["intr"][0], pro["intr"][1]
    cz, wx, wy = pro["cz"], pro["wx"], pro["wy"]
    Xc, Yc, Zc = pro["Xc"], pro["Yc"], pro["Zc"]
    pxr, pyr, in_img = pro["pxr"], pro["pyr"], pro["in_img"]
    alpha, beta = pro["alpha"], pro["beta"]

    c0 = _pass1_index(alpha, beta, Hp, BX)
    tables = (depth_ref[...], gx_ref[...], gy_ref[...])
    tmps = _pass1_gather(tables, c0, nk, BX, Hp, Wp)

    pyrT, c0r = _pass2_index(alpha, beta, pyr, Hp)

    if line_mode:
        # mirror _kernel's line mode: sample ON the column's image line
        # at the rounded row; gate identically
        pxr = c0r
        in_img = (
            (c0r >= 0) & (c0r < Wr) & (pyr >= 0) & (pyr < Hr)
            & pro["vox_valid"]
        )

    (depth_val, gxv, gyv), matched = _pass2_select(
        tmps, pyrT, pxr, c0r, nk, BX, Y, Hp
    )

    if line_mode:
        matched = matched & (jnp.abs(beta) <= 1.0)

    d = tsdf_ref[0].astype(jnp.float32)
    w = weight_ref[0].astype(jnp.float32)
    gbar_d = gbar_d_ref[0]
    gbar_w = gbar_w_ref[0]
    sdf = depth_val - Zc
    update = (
        in_img & (Zc > 0.0) & matched & (depth_val > 0.0)
        & (sdf >= -trunc)
    )
    upd_f = update.astype(jnp.float32)
    band = (sdf < trunc).astype(jnp.float32)
    new_w = w + 1.0

    # ---- pose_inv (R | t) partials: 12 block sums ------------------------
    # The loss reaches the pose only through x_c = R_wc x_w + t_wc per
    # voxel, so dL/dR_wc[i,j] = sum dL/dx_c[i] * x_w[j] and
    # dL/dt_wc[i] = sum dL/dx_c[i] — a raw matrix cotangent the caller
    # chains through jnp.linalg.inv / se3_exp with ordinary AD, making
    # jax.grad exact at ANY twist (not just delta = 0).
    coef = gbar_d * upd_f * band / new_w
    # Zc == 0 exactly would make 0 * inf = NaN through the masked
    # multiply; the update gate already excludes Zc <= 0
    zc2 = jnp.where(Zc > 0.0, Zc * Zc, 1.0)
    # dL/dx_c per voxel
    if image_term:
        dxc = coef * gxv * fx / jnp.where(Zc > 0.0, Zc, 1.0)
        dyc = coef * gyv * fy / jnp.where(Zc > 0.0, Zc, 1.0)
        dzc = coef * (
            -gxv * fx * Xc / zc2 - gyv * fy * Yc / zc2 - 1.0
        )
    else:
        dxc = jnp.zeros_like(coef)
        dyc = jnp.zeros_like(coef)
        dzc = -coef
    czb = jnp.full_like(wx, cz)
    comps = []
    for dci in (dxc, dyc, dzc):
        comps.append(jnp.sum(dci * wx))   # dL/dR[i, 0]
        comps.append(jnp.sum(dci * wy))   # dL/dR[i, 1]
        comps.append(jnp.sum(dci * czb))  # dL/dR[i, 2]
        comps.append(jnp.sum(dci))        # dL/dt[i]
    out_dxi_ref[0, 0] = jnp.concatenate(
        [jnp.full((8, _LANE), c, jnp.float32) for c in comps], axis=0
    )

    # ---- volume cotangents ----------------------------------------------
    o = jnp.minimum(sdf, trunc)
    out_dd_ref[0] = gbar_d * jnp.where(update, w / new_w, 1.0)
    dnewd_dw = upd_f * (d - o) / (new_w * new_w)
    if cap_weight:
        # match jnp.minimum's AD exactly: derivative 1 below the cap,
        # 0.5 at the tie (weights step by 1, so the tie is COMMON: every
        # voxel hits it on the frame it reaches the cap), 0 above
        below = (new_w < max_weight).astype(jnp.float32)
        tie = (new_w == max_weight).astype(jnp.float32)
        capfac = jnp.where(update, below + 0.5 * tie, 1.0)
    else:
        capfac = 1.0
    out_dw_ref[0] = gbar_d * dnewd_dw + gbar_w * capfac


def integrate_pose(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    delta: jnp.ndarray,
    nk: int = 3,
    cap_weight: bool = False,
    image_term: bool = True,
    interpret: bool = False,
    mode: str = "exact",
):
    """Differentiable fusion w.r.t. pose, at production kernel speed.

    Forward: fuse ``depth`` at pose ``se3_exp(delta) @ camera.pose``
    through the line-warp Pallas kernel (``mode`` as in
    integrate_pallas: "exact" = reference rounding via nk candidates;
    "line" = the pipeline-default line convention, nk=1, ~3x cheaper
    backward since the three adjoint tables ride one candidate sweep —
    the adjoint gates bit-identically to whichever forward ran).
    Backward: the
    analytic adjoint — including the image-space term AD cannot see
    through the rounded depth lookup (semantics + equality gate:
    ops/integrate_diff.py) — runs as one three-table kernel pass
    (depth, dD/dx, dD/dy share the lookup), ~1.5x a forward. The kernel
    emits the raw cotangent of the pose_inv MATRIX; ``se3_exp`` and the
    4x4 inverse chain by ordinary AD, so ``jax.grad`` is exact at ANY
    delta (not just 0). Volume cotangents (tsdf, weight, incl. the
    weight-cap tie) are exact, so fusion steps chain under AD;
    ``depth`` and intrinsics are treated as observed data
    (stop-gradient).

    Returns (fused volume, miss count); differentiable in ``delta``
    (and the volume).
    """
    from ..utils.se3 import se3_exp

    pose = se3_exp(delta) @ camera.pose
    pose_inv = jnp.linalg.inv(pose)
    return _integrate_core(
        vol, jnp.asarray(depth, jnp.float32), camera.k, pose_inv,
        nk, cap_weight, image_term, interpret, mode,
    )


def _compose(camera: Camera, delta: jnp.ndarray) -> Camera:
    from ..utils.se3 import se3_exp

    return camera.set_pose(se3_exp(delta) @ camera.pose)


def _cam_from_inv(k: jnp.ndarray, pose_inv: jnp.ndarray) -> Camera:
    return Camera(
        k=k,
        k_inv=jnp.linalg.inv(k),
        pose=jnp.linalg.inv(pose_inv),
        pose_inv=pose_inv,
    )


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _integrate_core(vol, depth, k, pose_inv, nk, cap_weight, image_term,
                    interpret, mode):
    return integrate_pallas(
        vol, depth, _cam_from_inv(k, pose_inv), cap_weight=cap_weight,
        nk=nk, interpret=interpret, mode=mode,
    )


def _integrate_core_fwd(vol, depth, k, pose_inv, nk, cap_weight,
                        image_term, interpret, mode):
    out = _integrate_core(
        vol, depth, k, pose_inv, nk, cap_weight, image_term, interpret,
        mode,
    )
    return out, (vol, depth, k, pose_inv)


def _integrate_core_bwd(nk, cap_weight, image_term, interpret, mode,
                        res, g):
    vol, depth, k, pose_inv = res
    gvol, _gmiss = g
    dd, dw, dpinv = _pose_grad_pallas(
        vol, depth, _cam_from_inv(k, pose_inv), gvol.tsdf, gvol.weight,
        nk=nk, cap_weight=cap_weight, image_term=image_term,
        interpret=interpret, mode=mode,
    )
    # Every non-tsdf/weight field of the output volume is an identity
    # pass-through of the input, so its cotangent flows through
    # unchanged (a loss reading e.g. out.truncation_distance must not
    # silently get zero). The geometry fields' COMPUTE-path influence on
    # new_tsdf (offset/voxel size inside the projection) is treated as
    # observed data like depth/k — only the pass-through term is kept.
    vol_cot = gvol.replace(
        tsdf=dd.astype(vol.tsdf.dtype), weight=dw.astype(vol.weight.dtype)
    )
    return (
        vol_cot,
        jnp.zeros_like(depth),  # observed data: stop-gradient
        jnp.zeros_like(k),
        dpinv,
    )


_integrate_core.defvjp(_integrate_core_fwd, _integrate_core_bwd)


@partial(
    jax.jit,
    static_argnames=(
        "nk", "cap_weight", "image_term", "interpret", "mode"
    ),
)
def _pose_grad_pallas(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    gbar_d: jnp.ndarray,
    gbar_w: jnp.ndarray,
    *,
    nk: int,
    cap_weight: bool,
    image_term: bool,
    interpret: bool,
    mode: str = "exact",
):
    """Run the pose-adjoint kernel: returns (d tsdf_in, d weight_in,
    (4, 4) cotangent of the pose_inv matrix — rows R_wc | t_wc; the
    bottom row is zero)."""
    from ..ops.integrate_diff import depth_image_gradients

    if mode == "line":
        nk = 1

    Z, Yr, Xr = vol.tsdf.shape
    Hr, Wr = depth.shape
    Y = _round_up(Yr, _LANE)
    X = _round_up(Xr, _LANE)
    Hp = _round_up(Hr, _LANE)
    Wp = _round_up(Wr, _LANE)

    depth_f = jnp.asarray(depth, jnp.float32)
    gx_img, gy_img = depth_image_gradients(depth_f)
    if (Hp, Wp) != (Hr, Wr):
        pad2 = ((0, Hp - Hr), (0, Wp - Wr))
        depth_f = jnp.pad(depth_f, pad2)
        gx_img = jnp.pad(gx_img, pad2)
        gy_img = jnp.pad(gy_img, pad2)

    tsdf = vol.tsdf
    weight = vol.weight
    gbar_d = jnp.asarray(gbar_d, jnp.float32)
    gbar_w = jnp.asarray(gbar_w, jnp.float32)
    if (Y, X) != (Yr, Xr):
        pad = ((0, 0), (0, Y - Yr), (0, X - Xr))
        tsdf = jnp.pad(tsdf, pad)
        weight = jnp.pad(weight, pad)
        gbar_d = jnp.pad(gbar_d, pad)
        gbar_w = jnp.pad(gbar_w, pad)

    BX = min(X, _LANE)
    n_xb = X // BX
    params = _pack_params(vol, camera)

    kern = partial(
        _kernel_pose_grad,
        Y=Y, BX=BX, Hp=Hp, Wp=Wp, Hr=Hr, Wr=Wr, Yr=Yr, Xr=Xr,
        nk=nk, cap_weight=cap_weight, image_term=image_term,
        line_mode=(mode == "line"),
    )
    vol_spec = pl.BlockSpec(
        (1, Y, BX), lambda z, xb: (z, 0, xb), memory_space=pltpu.VMEM
    )
    img_spec = pl.BlockSpec(
        (Hp, Wp), lambda z, xb: (0, 0), memory_space=pltpu.VMEM
    )
    dd, dw, dxi = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, n_xb, 96, _LANE), jnp.float32),
        ),
        grid=(Z, n_xb),
        in_specs=[
            pl.BlockSpec(
                (1, 24), lambda z, xb: (0, 0), memory_space=pltpu.SMEM
            ),
            img_spec, img_spec, img_spec,
            vol_spec, vol_spec, vol_spec, vol_spec,
        ],
        out_specs=(
            vol_spec,
            vol_spec,
            pl.BlockSpec(
                (1, 1, 96, _LANE),
                lambda z, xb: (z, xb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        # Three full image planes + 8 double-buffered volume blocks push
        # the per-program footprint past the default 16 MB scoped-vmem
        # cap at 512^3/640x480 (measured 18.73 MB — the round-2 bench
        # compile failure); v5e VMEM is 128 MB, so raise the cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(params, depth_f, gx_img, gy_img, tsdf, weight, gbar_d, gbar_w)

    if (Y, X) != (Yr, Xr):
        dd = dd[:, :Yr, :Xr]
        dw = dw[:, :Yr, :Xr]
    # 12 block-partial rows at 8k: sum over the grid -> (3, 4) rows of
    # the pose_inv cotangent, padded to 4x4 with a zero bottom row
    sums = jnp.stack([jnp.sum(dxi[:, :, 8 * j, 0]) for j in range(12)])
    dpinv = jnp.concatenate(
        [sums.reshape(3, 4), jnp.zeros((1, 4), jnp.float32)], axis=0
    )
    return dd, dw, dpinv
