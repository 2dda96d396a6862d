"""Bilateral depth filtering as a dense stencil.

TPU-native re-design of the reference's CPU ``BilateralFilter``
(ref: src/BilateralFilter.cpp:15-121): a (2r+1)^2 window of shifted
adds that XLA fuses — no LUTs needed on a vector machine.

The *intended* math is replicated (the reference's exact weight
formulas): spatial weight exp(-(dx^2+dy^2)/sigma_space^2), similarity
weight exp(-|dv|/sigma_colour^2) (ref: :38-41), radius
ceil(1.5*sigma_space) (ref: :17). Divergences from the reference, by
intent: its 256-entry similarity LUT caps |dv| at 255 — an 8-bit-image
artifact that would let a 2m depth edge bleed; here the same formula is
evaluated without the cap. Its kernel-index skew at clipped borders and
the byte-granular output write for 16bpp images (SURVEY.md §2.8) are
not replicated either.

Zero depth means "no data": such pixels contribute nothing and are left
zero, which the reference's raw intensity filtering does not handle —
the KinectFusion pre-smoother must not bleed values across holes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sigma_colour", "sigma_space"))
def bilateral_filter(
    depth: jnp.ndarray,
    sigma_colour: float = 20.0,
    sigma_space: float = 3.0,
) -> jnp.ndarray:
    """Filter a (H, W) depth image; returns the same dtype.

    Args:
      depth: (H, W) u16/f32 depth in mm; zero = no data.
    """
    orig_dtype = depth.dtype
    d = jnp.asarray(depth, jnp.float32)
    h, w = d.shape
    radius = math.ceil(sigma_space * 1.5)
    inv_sc2 = 1.0 / (sigma_colour * sigma_colour)
    inv_ss2 = 1.0 / (sigma_space * sigma_space)

    valid = d > 0
    num = jnp.zeros_like(d)
    den = jnp.zeros_like(d)
    padded = jnp.pad(d, radius)
    pvalid = jnp.pad(valid, radius)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            w_s = math.exp(-(dx * dx + dy * dy) * inv_ss2)
            tap = padded[
                radius + dy : radius + dy + h, radius + dx : radius + dx + w
            ]
            tval = pvalid[
                radius + dy : radius + dy + h, radius + dx : radius + dx + w
            ]
            w_c = jnp.exp(-jnp.abs(tap - d) * inv_sc2)
            wgt = jnp.where(tval, w_s * w_c, 0.0)
            num = num + tap * wgt
            den = den + wgt
    out = jnp.where(valid, num / jnp.maximum(den, 1e-12), 0.0)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out).astype(orig_dtype)
    else:
        out = out.astype(orig_dtype)
    return out
