"""Decompose the banded-ICP level-0 iteration cost on the chip.

The tracked KinectFusion frame (bench `kinfu_tracked_ms_256`, ~27 ms) is
dominated by the ICP share (~21 ms across the 10/5/4 pyramid). This
probe times the pieces of one level-0 iteration in isolation, each as a
x10 fori_loop inside ONE jit (so tunnel dispatch overhead is amortized
exactly like the production pyramid):

  a. full icp_step_banded iteration (the baseline);
  b. everything but the roll/gather sweep (adaptive bounds forced to an
     empty range by claiming no correspondences);
  c. the roll/gather sweep alone (fixed k range, no residual build);
  d. the residual-row build + A/b reduction alone (fake d00/d10/d01).

Run AFTER bench.py (one compile experiment at a time through the remote
compile service — CLAUDE.md).
"""

import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu.tracking.icp import (
    icp_step_banded, vertex_map, normal_map,
)
from tsdf_tpu.utils.se3 import se3_exp

W, H = 640, 480
FX, FY, CX, CY = 591.1, 590.1, 331.0, 234.6


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


ys, xs = np.mgrid[0:H, 0:W]
d_prev = (1500 + 200 * np.sin(xs / 80.0) + 150 * np.cos(ys / 60.0)).astype(
    np.float32
)
d_curr = np.roll(d_prev, 2, axis=0) + 1.0
dp = jnp.asarray(d_prev)
dc = jnp.asarray(d_curr)


def bench(fn, *args, label=""):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {np.median(ts)*1e3:7.2f} ms (x100 iters)", flush=True)
    return np.median(ts)


def pose_update(A, b, pose):
    A = A + 1e-6 * jnp.eye(6)
    up = jnp.linalg.solve(A, b)
    up = jnp.where(jnp.isfinite(up), up, 0.0)
    return se3_exp(jnp.concatenate([up[3:6], up[0:3]])) @ pose


# ---- a. full iteration ---------------------------------------------------
@jax.jit
def full10(dc, dp):
    vc = vertex_map(dc, FX, FY, CX, CY)
    nc = normal_map(vc)

    def body(i, pose):
        A, b, _r, _n = icp_step_banded(
            pose[0:3, 0:3], pose[0:3, 3], vc, nc, dp,
            FX, FY, CX, CY, band=32, adaptive=True,
        )
        return pose_update(A, b, pose)

    return jax.lax.fori_loop(0, 100, body, jnp.eye(4, dtype=jnp.float32))


# ---- b. no-sweep iteration (dist_thresh <= 0 kills `found`? no —
# force the adaptive range empty by an out-of-band row_offset) -------------
@jax.jit
def nosweep10(dc, dp):
    vc = vertex_map(dc, FX, FY, CX, CY)
    nc = normal_map(vc)

    def body(i, pose):
        A, b, _r, _n = icp_step_banded(
            pose[0:3, 0:3], pose[0:3, 3], vc, nc, dp,
            FX, FY, CX, CY, band=32, adaptive=True,
            row_offset=100000,  # dy out of band -> zero roll passes
        )
        return pose_update(A, b, pose)

    return jax.lax.fori_loop(0, 100, body, jnp.eye(4, dtype=jnp.float32))


# ---- c. the sweep alone (4 fixed passes, gathers + selects) --------------
from tsdf_tpu.kernels.gather import lane_gather_any


@jax.jit
def sweep10(dp, px_s, dy):
    def body(i, acc):
        d00, d10, d01 = acc

        def roll_pass(k, carry):
            d00, d10, d01 = carry
            rolled = jnp.roll(dp, -k, axis=0)
            c0 = lane_gather_any(rolled, px_s)
            c1 = lane_gather_any(rolled, jnp.minimum(px_s + 1, W - 1))
            d00 = jnp.where(dy == k, c0, d00)
            d10 = jnp.where(dy == k, c1, d10)
            d01 = jnp.where(dy == k - 1, c0, d01)
            return d00, d10, d01

        return jax.lax.fori_loop(0, 4, roll_pass, (d00, d10, d01))

    z = jnp.zeros((H, W), jnp.float32)
    out = jax.lax.fori_loop(0, 100, body, (z, z, z))
    return out[0] + out[1] + out[2]



# ---- d. OLD formulation (point-list (N,3)/(N,6) + rows.T @ rows) ---------
def icp_step_banded_old(
    rot, trans, vmap_curr, nmap_curr, depth_prev, fx, fy, cx, cy,
    band=32, dist_thresh=100.0, angle_thresh=0.342, cutoff=20000.0,
):
    h, w = depth_prev.shape
    hc, wc = vmap_curr.shape[0], vmap_curr.shape[1]
    v_curr = vmap_curr.reshape(-1, 3)
    n_curr = nmap_curr.reshape(-1, 3)
    v_in_prev = v_curr @ rot.T + trans
    n_in_prev = n_curr @ rot.T
    pxf = v_in_prev[:, 0] * fx / v_in_prev[:, 2] + cx
    pyf = v_in_prev[:, 1] * fy / v_in_prev[:, 2] + cy
    pxf = jnp.where(jnp.isfinite(pxf), pxf, -1.0)
    pyf = jnp.where(jnp.isfinite(pyf), pyf, -1.0)
    px = jnp.round(jnp.clip(pxf, -1e6, 1e6)).astype(jnp.int32).reshape(hc, wc)
    py = jnp.round(jnp.clip(pyf, -1e6, 1e6)).astype(jnp.int32).reshape(hc, wc)
    in_img = (px >= 0) & (px < w - 1) & (py >= 0) & (py < h - 1)
    yy = jnp.arange(hc, dtype=jnp.int32)[:, None]
    dy = py - yy
    found = in_img & (jnp.abs(dy) <= band)
    px_s = jnp.clip(px, 0, w - 1)
    d00 = jnp.zeros((hc, wc), jnp.float32)
    d10 = jnp.zeros((hc, wc), jnp.float32)
    d01 = jnp.zeros((hc, wc), jnp.float32)
    dp = jnp.asarray(depth_prev, jnp.float32)

    def roll_pass(k, carry):
        d00, d10, d01 = carry
        rolled = jnp.roll(dp, -k, axis=0)
        c0 = lane_gather_any(rolled, px_s)
        c1 = lane_gather_any(rolled, jnp.minimum(px_s + 1, w - 1))
        d00 = jnp.where(dy == k, c0, d00)
        d10 = jnp.where(dy == k, c1, d10)
        d01 = jnp.where(dy == k - 1, c0, d01)
        return d00, d10, d01

    k_lo = jnp.min(jnp.where(found, dy, band + 1))
    k_hi = jnp.max(jnp.where(found, dy, -band - 1))
    d00, d10, d01 = jax.lax.fori_loop(k_lo, k_hi + 2, roll_pass, (d00, d10, d01))
    pxf2 = px.astype(jnp.float32)
    pyf2 = py.astype(jnp.float32)

    def backproj(d, a, b):
        return jnp.stack([d * (a - cx) / fx, d * (b - cy) / fy, d], axis=-1)

    v00 = backproj(d00, pxf2, pyf2)
    v10 = backproj(d10, pxf2 + 1.0, pyf2)
    v01 = backproj(d01, pxf2, pyf2 + 1.0)
    nrm = jnp.cross(v10 - v00, v01 - v00)
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.where(nn == 0, 1.0, nn)
    dvalid = ((d00 > 0) & (d00 < cutoff) & (d10 > 0) & (d10 < cutoff)
              & (d01 > 0) & (d01 < cutoff))
    v_prev = v00.reshape(-1, 3)
    n_prev = nrm.reshape(-1, 3)
    ok = (found & dvalid).reshape(-1)
    diff = v_prev - v_in_prev
    dist_ok = jnp.linalg.norm(diff, axis=-1) < dist_thresh
    angle_ok = jnp.linalg.norm(jnp.cross(n_in_prev, n_prev), axis=-1) < angle_thresh
    finite = jnp.isfinite(v_curr[:, 2]) & jnp.isfinite(n_curr[:, 0])
    front = (v_curr[:, 2] > 0) & (v_in_prev[:, 2] > 0)
    mask = ok & dist_ok & angle_ok & finite & front
    n_prev_s = jnp.where(mask[:, None], n_prev, 0.0)
    v_ip_s = jnp.where(mask[:, None], v_in_prev, 0.0)
    r = jnp.where(mask, jnp.sum(n_prev * diff, axis=-1), 0.0)
    r = jnp.where(jnp.isfinite(r), r, 0.0)
    rows = jnp.concatenate([n_prev_s, jnp.cross(v_ip_s, n_prev_s)], axis=-1)
    rows = jnp.where(jnp.isfinite(rows), rows, 0.0)
    A = rows.T @ rows
    b = rows.T @ r
    return A, b, jnp.sum(r * r), jnp.sum(mask.astype(jnp.float32))


@jax.jit
def old100(dc, dp):
    vc = vertex_map(dc, FX, FY, CX, CY)
    nc = normal_map(vc)

    def body(i, pose):
        A, b, _r, _n = icp_step_banded_old(
            pose[0:3, 0:3], pose[0:3, 3], vc, nc, dp, FX, FY, CX, CY,
        )
        return pose_update(A, b, pose)

    return jax.lax.fori_loop(0, 100, body, jnp.eye(4, dtype=jnp.float32))


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    ta = bench(full10, dc, dp, label="a. full banded iteration x100")
    tb = bench(nosweep10, dc, dp, label="b. no-sweep iteration   x100")
    px_s = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
    dyv = jnp.full((H, W), 2, jnp.int32)
    tc = bench(sweep10, dp, px_s, dyv, label="c. 4-pass sweep alone   x100")
    td = bench(old100, dc, dp, label="d. OLD point-list iter  x100")
    print(
        f"implied sweep share {1e3*(ta-tb):.2f} ms, fixed share "
        f"{1e3*tb:.2f} ms per x1000",
        flush=True,
    )