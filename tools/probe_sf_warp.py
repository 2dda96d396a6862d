#!/usr/bin/env python
"""Measure actual x-warp magnitudes on a large-deformation SceneFusion
sequence (round-3 verdict item 4: "no measurement exists of how large
real warps get").

Runs the fused SceneFusion step for N frames with a strong, spatially
varying scene flow, and per frame reports:

  * dev_abs_max / p99  — max & p99 of |round(px_warped) - round(line(py_warped))|
    over in-image voxels: the OLD kernel's requirement was
    dev_abs_max <= (nk-1)/2 (so nk=5 tolerated 2 px);
  * col_range_max / p99 — per-(z, x) voxel-column max-min of the same
    deviation: the ROUND-4 banded kernel's requirement is
    col_range_max <= nk - 1;
  * miss — the kernel's own exact-or-skip counter (0 = every in-image
    voxel fused by the Pallas path; no lax fallback frame).

Usage:
  python tools/probe_sf_warp.py            # 255^3 on the TPU
  python tools/probe_sf_warp.py --grid 64 --cpu --frames 4
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=255)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--flow-px", type=float, default=8.0,
                    help="approx image-space flow magnitude in pixels")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--uniform", action="store_true",
                    help="uniform flow (the banded window's exact case)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )

    import jax.numpy as jnp
    import numpy as np

    from tsdf_tpu import Camera
    from tsdf_tpu.ops.raycast import render_to_depth_image
    from tsdf_tpu.pipelines.scenefusion import (
        SceneFusionConfig,
        _sf_step_pallas,
    )
    from tsdf_tpu.utils import fixtures

    g = args.grid
    cfg = SceneFusionConfig(
        volume_size=(g, g, g),
        physical_size_mm=2550.0,
        max_cubes=1 << (18 if g >= 200 else 14),
    )
    vol = fixtures.sphere_tsdf(
        cfg.make_volume(), 500.0, centre=(0.0, 0.0, 1300.0)
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, 100.0])
        .look_at([0.0, 0.0, 1300.0])
    )
    W, H = 640, 480
    depth = jnp.asarray(
        render_to_depth_image(vol, cam, width=W, height=H), jnp.float32
    )

    # Strong spatially-varying flow in mm: the image-space magnitude is
    # ~ fx * flow_mm / Z; at Z ~ 1300 and fx = 591, flow_px px needs
    # flow_mm ~ flow_px * 1300 / 591.
    flow_mm = args.flow_px * 1300.0 / 591.1
    ys = jnp.linspace(0.0, 2 * np.pi, H)[:, None]
    xs = jnp.linspace(0.0, 2 * np.pi, W)[None, :]
    ones = jnp.ones((H, W), jnp.float32)
    if args.uniform:
        flow = jnp.stack(
            [flow_mm * ones, 0.3 * flow_mm * ones, 0.0 * ones], axis=-1
        ).astype(jnp.float32)
    else:
        flow = jnp.stack(
            [
                flow_mm * (0.6 + 0.4 * jnp.sin(ys) * jnp.cos(xs)) * ones,
                0.5 * flow_mm * jnp.cos(ys * 2.0) * ones,
                0.3 * flow_mm * jnp.sin(xs) * ones,
            ],
            axis=-1,
        ).astype(jnp.float32)

    @jax.jit
    def warp_stats(v):
        """Mirror the kernel's deviation math over the whole volume."""
        dz_, dy_, dx_ = v.tsdf.shape
        k = cam.k
        fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
        pi = cam.pose_inv
        # deformed centres (the deform field stores absolute positions)
        wx, wy, wz = (v.deform[..., i] for i in range(3))
        Xc = pi[0, 0] * wx + pi[0, 1] * wy + pi[0, 2] * wz + pi[0, 3]
        Yc = pi[1, 0] * wx + pi[1, 1] * wy + pi[1, 2] * wz + pi[1, 3]
        Zc = pi[2, 0] * wx + pi[2, 1] * wy + pi[2, 2] * wz + pi[2, 3]
        px = fx * Xc / Zc + cx
        py = fy * Yc / Zc + cy
        # rigid line per (z, x) column from undeformed first/last row
        vs = v.voxel_size
        off = v.offset
        zs = off[2] + (jnp.arange(dz_, dtype=jnp.float32) + 0.5) * vs[2]
        xs_ = off[0] + (jnp.arange(dx_, dtype=jnp.float32) + 0.5) * vs[0]
        ysA = off[1] + 0.5 * vs[1]
        ysB = off[1] + (dy_ - 0.5) * vs[1]

        def proj(wxc, wyc, wzc):
            X = pi[0, 0] * wxc + pi[0, 1] * wyc + pi[0, 2] * wzc + pi[0, 3]
            Y = pi[1, 0] * wxc + pi[1, 1] * wyc + pi[1, 2] * wzc + pi[1, 3]
            Z = pi[2, 0] * wxc + pi[2, 1] * wyc + pi[2, 2] * wzc + pi[2, 3]
            return fx * X / Z + cx, fy * Y / Z + cy

        zz = zs[:, None]
        xx = xs_[None, :]
        pxA, pyA = proj(xx, ysA, zz)  # (Z, X)
        pxB, pyB = proj(xx, ysB, zz)
        beta = (pxB - pxA) / jnp.where(
            jnp.abs(pyB - pyA) < 1e-12, 1e-12, pyB - pyA
        )
        alpha = pxA - beta * pyA
        line_px = alpha[:, None, :] + beta[:, None, :] * py
        dev = jnp.round(px) - jnp.round(line_px)
        valid = (
            (jnp.round(px) >= 0) & (jnp.round(px) < W)
            & (jnp.round(py) >= 0) & (jnp.round(py) < H) & (Zc > 0)
        )
        adev = jnp.where(valid, jnp.abs(dev), 0.0)
        big = 1e9
        lo = jnp.min(jnp.where(valid, dev, big), axis=1)
        hi = jnp.max(jnp.where(valid, dev, -big), axis=1)
        col_ok = jnp.any(valid, axis=1)
        rng = jnp.where(col_ok, hi - lo, 0.0)
        return adev, rng, jnp.sum(valid)

    tpu_safe = jax.default_backend() == "tpu"
    for f in range(args.frames):
        t0 = time.perf_counter()
        vol, miss, _mask, n_corr, ovf = _sf_step_pallas(
            vol, depth, flow, cam,
            max_cubes=cfg.max_cubes, nk=cfg.integrate_nk,
            threshold_mm=cfg.threshold_mm, tpu_safe=tpu_safe,
        )
        adev, rng, nvalid = warp_stats(vol)
        adev_np = np.asarray(adev).ravel()
        rng_np = np.asarray(rng).ravel()
        adev_np = adev_np[adev_np > 0] if (adev_np > 0).any() else adev_np
        dt = time.perf_counter() - t0
        print(
            f"frame {f}: miss={int(miss)} corr={int(n_corr)} "
            f"ovf={bool(ovf)} in_img={int(nvalid)} "
            f"dev_abs max={adev_np.max():.0f} p99={np.percentile(adev_np, 99):.0f} | "
            f"col_range max={rng_np.max():.0f} p99={np.percentile(rng_np, 99):.0f} "
            f"(banded nk needs range<=nk-1={cfg.integrate_nk - 1}) "
            f"[{dt:.1f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
