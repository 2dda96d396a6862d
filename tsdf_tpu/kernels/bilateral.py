"""Pallas TPU kernel for the bilateral depth pre-filter.

Production path for ``ops.bilateral.bilateral_filter`` (the semantics
reference; TPU-native re-design of the reference's CPU filter,
ref: src/BilateralFilter.cpp:15-121 — intended math, see the ops
docstring for the documented deltas).

The lax stencil is a (2r+1)^2 loop of shifted slices that XLA
materializes through HBM — ~121 full-image streams at the default
sigma_space=3 (measured 3.1 ms at 640x480 on v5e, ~10% of a tracked
KinectFusion frame). A 640x480 f32 depth image is ~1.5 MB padded: the
whole stencil fits in VMEM, so this kernel runs the identical tap loop
entirely on-chip — one HBM read of the image, one write.

Math is tap-for-tap identical to ops/bilateral.py (same loop order,
same accumulation order): equality-gated in tests in interpret mode
and compiled on TPU (tests_tpu).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(d_ref, out_ref, *, RB, W, radius, inv_sc2, inv_ss2):
    # One program filters an (RB, W) row block. d_ref holds the WHOLE
    # depth image padded by `radius` zeros on top/left and up to the
    # aligned input shape on bottom/right; the program reads its
    # (RB + 2*radius)-row window with a ref-level dynamic slice. Zero
    # depth = no data everywhere, so alignment padding is inert
    # (valid/tval masks are False there).
    #
    # Why a grid at all (the image fits in VMEM): the (2r+1)^2 tap loop
    # is fully unrolled, so program size scales as taps x vregs — one
    # whole-image program is ~121 x 300 vregs of unaligned-shift code
    # and sends the Mosaic compile pathological (>8 min standalone,
    # >50 min fused into the tracked step; the round-2/3 bench stalls).
    # Row blocks keep the identical math at ~1/12 the program size.
    i = pl.program_id(0)
    pd = d_ref[pl.ds(i * RB, RB + 2 * radius), :]
    centre = pd[radius : radius + RB, radius : radius + W]
    valid = centre > 0.0
    num = jnp.zeros((RB, W), jnp.float32)
    den = jnp.zeros((RB, W), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            w_s = math.exp(-(dx * dx + dy * dy) * inv_ss2)
            tap = pd[
                radius + dy : radius + dy + RB,
                radius + dx : radius + dx + W,
            ]
            tval = tap > 0.0
            dv = tap - centre
            w_c = jnp.exp(-(dv * dv) * (0.5 * inv_sc2))
            wgt = jnp.where(tval, w_s * w_c, 0.0)
            num = num + tap * wgt
            den = den + wgt
    out_ref[...] = jnp.where(valid, num / jnp.maximum(den, 1e-12), 0.0)


@partial(
    jax.jit, static_argnames=("sigma_colour", "sigma_space", "interpret")
)
def bilateral_filter_pallas(
    depth: jnp.ndarray,
    sigma_colour: float = 20.0,
    sigma_space: float = 3.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Filter a (H, W) mm depth image (zero = no data); same dtype out.

    Semantics == ops.bilateral.bilateral_filter (equality-tested); this
    is the single-HBM-pass production kernel.
    """
    orig_dtype = depth.dtype
    d = jnp.asarray(depth, jnp.float32)
    H, W = d.shape
    radius = math.ceil(sigma_space * 1.5)
    inv_sc2 = 1.0 / (sigma_colour * sigma_colour)
    inv_ss2 = 1.0 / (sigma_space * sigma_space)

    # Row-block size: a multiple of the sublane tile that keeps each
    # program's unrolled tap loop small (see _kernel). 24 rows -> 20
    # programs at 480p.
    RB = 24
    Ho = _round_up(H, RB)
    Wo = _round_up(W, _LANE)
    Hp = _round_up(Ho + 2 * radius, _SUB)
    Wp = _round_up(Wo + 2 * radius, _LANE)
    pd = jnp.pad(
        d, ((radius, Hp - H - radius), (radius, Wp - W - radius))
    )

    out = pl.pallas_call(
        partial(
            _kernel,
            RB=RB, W=Wo, radius=radius, inv_sc2=inv_sc2, inv_ss2=inv_ss2,
        ),
        grid=(Ho // RB,),
        out_shape=jax.ShapeDtypeStruct((Ho, Wo), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (Hp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (RB, Wo), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        # the unrolled tap loop's live temporaries overflow the default
        # 16MB scoped-vmem cap (measured 23.85M at RB=40); v5e VMEM is
        # 128MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(pd)[0:H, 0:W]

    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out).astype(orig_dtype)
    else:
        out = out.astype(orig_dtype)
    return out
