"""Pallas TPU kernel: slab-sweep raycasting of the TSDF volume.

TPU-native replacement for the reference per-thread ray march
(ref: src/RayCaster/GPURaycaster.cu:265-377). A CUDA thread chasing one
ray through memory is the worst possible TPU access pattern (per-element
gathers); instead this kernel factors the perspective ray bundle the
shear-warp way:

  Sweep the volume one z-slab at a time in front-to-back ray order. Every
  ray crosses the slab plane z = z_k exactly once, at grid coords
  (u, v) = (Cu + Su*rx, Cv + Sv*ry) where rx = d_x/d_z, ry = d_y/d_z are
  per-pixel constants and Cu/Su/Cv/Sv are per-slab scalars — so sampling
  ALL rays against one slab is a single homography warp of the slab image
  into screen space. The warp runs as two passes of blockwise
  ``dynamic_gather`` (kernels/gather.py): pass A resamples each slab
  column at the row-line's v (pixel rows map to straight lines in the
  slab plane: v = alpha(py) + beta(py)*u), executed in transposed layout
  (transposes ride the MXU — see gather.mxu_transpose); pass B resamples
  along u at each pixel's exact u.

  The sweep is an explicit ``fori_loop`` inside the kernel with manual
  double-buffered DMA of slabs from HBM — NOT a pipelined grid dimension:
  a grid whose steps revisit the same output block compiles
  pathologically (minutes; the scheduler unrolls the revisit chain),
  while a fori_loop keeps marching state as plain loop carries and
  compiles in seconds. The Pallas grid covers only independent
  pixel-row blocks.

  The first + -> - crossing is secant-refined in z, a - -> + transition
  kills the ray (backface miss), matching the reference's termination
  semantics (ref: GPURaycaster.cu:325-374).

Sampling density is one sample per slab crossing instead of the
reference's 20 samples per truncation distance; the TSDF's sign bands
are >= a truncation distance (~2 voxels) wide, so crossings are still
bracketed, and the secant refinement is the reference's intended one.

Rays whose d_z opposes the sweep order would be traversed back-to-front;
their hits are discarded in postprocessing (t < 0 test). Pixel rows that
degenerate under the line parameterization (|camera roll| ~ 90 deg)
report misses — ops/raycast.py remains the fully general reference path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import Camera
from ..volume import TSDFVolume
from .gather import LANE, lane_gather, mxu_transpose

_BIG = 1.0e6
_NO_HIT = -1.0e30


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(
    params_ref,  # (1, 16) f32 SMEM
    rx_ref,  # (HB, Wp) f32: d_x / d_z for this pixel-row block
    ry_ref,  # (HB, Wp) f32: d_y / d_z
    tsdf_hbm_ref,  # (Z, Vp, Up) f32 in HBM/ANY
    hit_z_ref,  # (HB, Wp) f32 out
    slab_buf,  # (2, Vp, Up) f32 VMEM scratch (double buffer)
    dma_sems,  # (2,) DMA semaphores
    *,
    Z: int,
    Vr: int,
    Ur: int,
    Wr: int,
    reverse: bool,
):
    p = params_ref
    o_x, o_y, o_z = p[0, 0], p[0, 1], p[0, 2]
    off_x, off_y, off_z = p[0, 3], p[0, 4], p[0, 5]
    vs_x, vs_y, vs_z = p[0, 6], p[0, 7], p[0, 8]
    sweep_sign = -1.0 if reverse else 1.0

    hb, wp = rx_ref.shape
    rx = rx_ref[...]
    ry = ry_ref[...]

    cu = (o_x - off_x) / vs_x - 0.5
    cv = (o_y - off_y) / vs_y - 0.5

    def slab_index(i):
        return (Z - 1 - i) if reverse else i

    def start_dma(i, slot):
        copy = pltpu.make_async_copy(
            tsdf_hbm_ref.at[slab_index(i)],
            slab_buf.at[slot],
            dma_sems.at[slot],
        )
        copy.start()

    def wait_dma(i, slot):
        pltpu.make_async_copy(
            tsdf_hbm_ref.at[slab_index(i)],
            slab_buf.at[slot],
            dma_sems.at[slot],
        ).wait()

    start_dma(0, 0)

    def body(i, carry):
        prev_s, state, hit_z = carry
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < Z)
        def _():
            start_dma(i + 1, next_slot)

        wait_dma(i, slot)
        slab = slab_buf[slot]  # (Vp, Up)

        zi = (Z - 1 - i) if reverse else i
        zk = off_z + (zi.astype(jnp.float32) + 0.5) * vs_z
        su = (zk - o_z) / vs_x
        sv = (zk - o_z) / vs_y
        u_pix = cu + su * rx  # (HB, Wp)
        v_pix = cv + sv * ry

        valid = (
            (u_pix >= 0.0)
            & (u_pix <= Ur - 1.0)
            & (v_pix >= 0.0)
            & (v_pix <= Vr - 1.0)
        )

        # Row line in slab space from the row's first/last real pixels.
        u0 = u_pix[:, 0:1]
        v0 = v_pix[:, 0:1]
        u1 = u_pix[:, Wr - 1 : Wr]
        v1 = v_pix[:, Wr - 1 : Wr]
        du = u1 - u0
        degen = jnp.abs(du) < 1e-6
        du = jnp.where(degen, 1.0, du)
        beta = (v1 - v0) / du  # (HB, 1)
        alpha = v0 - beta * u0
        valid = valid & jnp.logical_not(degen)

        # pass A (transposed): i1T[u, row] = slab[v*(row, u), u]
        slab_t = mxu_transpose(slab)  # (Up, Vp)
        up = slab_t.shape[0]
        uu_col = jax.lax.broadcasted_iota(jnp.int32, (up, hb), 0).astype(
            jnp.float32
        )
        vstar_t = alpha.reshape(1, hb) + beta.reshape(1, hb) * uu_col
        vstar_t = jnp.clip(
            jnp.where(jnp.isfinite(vstar_t), vstar_t, 0.0), 0.0, Vr - 1.0
        )
        vi = jnp.floor(vstar_t)
        vf = vstar_t - vi
        vi0 = vi.astype(jnp.int32)
        vi1 = jnp.minimum(vi0 + 1, Vr - 1)
        i1_t = (1.0 - vf) * lane_gather(slab_t, vi0) + vf * lane_gather(
            slab_t, vi1
        )  # (Up, HB)
        i1 = mxu_transpose(i1_t)  # (HB, Up)

        # pass B: resample along u at each pixel
        u_s = jnp.clip(
            jnp.where(jnp.isfinite(u_pix), u_pix, 0.0), 0.0, Ur - 1.0
        )
        ui = jnp.floor(u_s)
        uf = u_s - ui
        ui0 = ui.astype(jnp.int32)
        ui1 = jnp.minimum(ui0 + 1, Ur - 1)
        s = (1.0 - uf) * lane_gather(i1, ui0) + uf * lane_gather(i1, ui1)

        # crossing detection (state: 0 no-prev, 1 marching, 2 dead)
        prev_valid = state == 1.0
        dead = state == 2.0
        fvalid = valid & jnp.logical_not(dead)
        entry_hit = fvalid & (state == 0.0) & (s <= 0.0)
        cross = fvalid & prev_valid & (prev_s > 0.0) & (s <= 0.0)
        backface = fvalid & prev_valid & (prev_s < 0.0) & (s > 0.0)

        z_prev = zk - sweep_sign * vs_z
        denom = prev_s - s
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        frac = prev_s / denom
        z_cross = z_prev + frac * (zk - z_prev)

        new_hit = entry_hit | cross
        hit_z = jnp.where(
            new_hit, jnp.where(entry_hit, zk, z_cross), hit_z
        )
        state = jnp.where(
            dead | new_hit | backface,
            2.0,
            jnp.where(valid, 1.0, 0.0),
        )
        prev_s = jnp.where(valid, s, prev_s)
        return prev_s, state, hit_z

    zeros = jnp.zeros((hb, wp), jnp.float32)
    init = (zeros, zeros, jnp.full((hb, wp), _NO_HIT, jnp.float32))
    _, _, hit_z = jax.lax.fori_loop(0, Z, body, init)
    hit_z_ref[...] = hit_z


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
    """Raycast with the slab-sweep kernel (z sweep axis).

    Returns (vertices, normals) with the same conventions as ops.raycast:
    (H, W, 3) world-mm vertices (NaN on miss) and screen-space normals.
    """
    Z, Yr, Xr = vol.tsdf.shape
    Hp = _round_up(height, LANE)
    Wp = _round_up(width, LANE)
    Vp = _round_up(Yr, LANE)
    Up = _round_up(Xr, LANE)
    HB = min(Hp, 128)
    nh = Hp // HB

    tsdf = vol.tsdf
    if (Vp, Up) != (Yr, Xr):
        tsdf = jnp.pad(tsdf, ((0, 0), (0, Vp - Yr), (0, Up - Xr)))

    # Per-pixel ray direction fields (plain XLA, computed once).
    m = camera.rotation @ camera.k_inv  # world dir = m @ (px, py, 1)
    ys = jnp.arange(Hp, dtype=jnp.float32)
    xs = jnp.arange(Wp, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (Hp, Wp))
    py = jnp.broadcast_to(ys[:, None], (Hp, Wp))
    d_x = m[0, 0] * px + m[0, 1] * py + m[0, 2]
    d_y = m[1, 0] * px + m[1, 1] * py + m[1, 2]
    d_z = m[2, 0] * px + m[2, 1] * py + m[2, 2]
    safe_dz = jnp.where(jnp.abs(d_z) < 1e-12, 1e-12, d_z)
    rx = d_x / safe_dz
    ry = d_y / safe_dz

    origin = camera.position
    fwd_z = camera.pose[2, 2]
    reverse_arr = fwd_z < 0.0

    params = jnp.concatenate(
        [
            origin,
            vol.offset,
            vol.voxel_size,
            jnp.zeros(7, jnp.float32),
        ]
    ).reshape(1, 16)

    def run(reverse):
        kern = partial(
            _kernel,
            Z=Z,
            Vr=Yr,
            Ur=Xr,
            Wr=width,
            reverse=reverse,
        )
        return pl.pallas_call(
            kern,
            grid=(nh,),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            in_specs=[
                pl.BlockSpec(
                    (1, 16), lambda hb: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (HB, Wp), lambda hb: (hb, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (HB, Wp), lambda hb: (hb, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),  # volume stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (HB, Wp), lambda hb: (hb, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, Vp, Up), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(params, rx, ry, tsdf)

    # reverse must be static for the sweep order; fwd_z is traced under
    # jit, so compile both orders and select at runtime.
    hit_z = jax.lax.cond(reverse_arr, lambda: run(True), lambda: run(False))

    hit_z = hit_z[:height, :width]
    # Recover ray parameter t from the hit plane; discard rays whose d_z
    # opposes the sweep order (their t comes out negative).
    t = (hit_z - origin[2]) / safe_dz[:height, :width]
    hit = (hit_z > _NO_HIT / 2) & (t > 0.0)
    dirs = jnp.stack(
        [d_x[:height, :width], d_y[:height, :width], d_z[:height, :width]],
        axis=-1,
    )
    verts = origin[None, None, :] + t[..., None] * dirs
    verts = jnp.where(hit[..., None], verts, jnp.nan)

    from ..ops.raycast import compute_normals_from_vertices

    normals = compute_normals_from_vertices(verts)
    return verts, normals
