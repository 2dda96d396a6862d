"""Amortized decomposition of the fused tracked-fusion frame at 256^3.

Each component runs x20 inside ONE jit (fori_loop) so the ~25 ms tunnel
round-trip amortizes to ~1 ms — the earlier per-dispatch component
numbers (ICP "~21 ms") were RTT-dominated and misleading. Run after
bench.py (one compile experiment at a time)."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels.bilateral import bilateral_filter_pallas
from tsdf_tpu.kernels.integrate import integrate_pallas
from tsdf_tpu.kernels.raycast import raycast_pallas
from tsdf_tpu.tracking.icp import get_incremental_transformation
from tsdf_tpu.utils import fixtures

W, H = 640, 480
N_IT = 20


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def bench(fn, *args, label=""):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(
        f"{label}: {med*1e3:7.2f} ms/x{N_IT} = {med*1e3/N_IT:6.2f} ms/it",
        flush=True,
    )
    return med


scene = fixtures.sphere_tsdf(
    make_volume((256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)), 600.0
)
wall = fixtures.wall_tsdf(scene, 2500.0)
scene = scene.replace(
    tsdf=jnp.minimum(scene.tsdf, wall.tsdf),
    weight=jnp.ones_like(scene.weight),
)
cam = (
    Camera.default_depth_camera()
    .move_to([0.0, 0.0, -500.0])
    .look_at([0.0, 0.0, 1500.0])
)
kvol = make_volume((256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))

verts0, _ = raycast_pallas(scene, cam, W, H)
pi = cam.pose_inv
camz = (
    pi[2, 0] * jnp.where(jnp.isfinite(verts0[..., 0]), verts0[..., 0], 0.0)
    + pi[2, 1] * jnp.where(jnp.isfinite(verts0[..., 1]), verts0[..., 1], 0.0)
    + pi[2, 2] * jnp.where(jnp.isfinite(verts0[..., 2]), verts0[..., 2], 0.0)
    + pi[2, 3]
)
depth = jnp.where(jnp.isfinite(verts0).all(-1), camz, 0.0).astype(jnp.float32)
sync(depth)

K = cam.k
FX, FY, CX, CY = K[0, 0], K[1, 1], K[0, 2], K[1, 2]


@jax.jit
def ray20(vol, cam):
    def body(i, acc):
        v, _ = raycast_pallas(vol, cam, W, H)
        return acc + jnp.where(jnp.isfinite(v[..., 2]), v[..., 2], 0.0)

    return jax.lax.fori_loop(0, N_IT, body, jnp.zeros((H, W), jnp.float32))


@jax.jit
def bilat20(d):
    def body(i, acc):
        return acc + bilateral_filter_pallas(d + i * 0.0, 30.0, 4.5)

    return jax.lax.fori_loop(0, N_IT, body, jnp.zeros((H, W), jnp.float32))


@jax.jit
def icp20(dc, dp):
    def body(i, acc):
        r = get_incremental_transformation(
            dc, dp, FX, FY, CX, CY, band=32
        )
        return acc + r.pose

    return jax.lax.fori_loop(0, N_IT, body, jnp.zeros((4, 4), jnp.float32))


@jax.jit
def integ20(vol, d, cam):
    def body(i, vol):
        out, _ = integrate_pallas(vol, d, cam, mode="line")
        return out

    return jax.lax.fori_loop(0, N_IT, body, vol).weight


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    bench(ray20, scene, cam, label="raycast 256^3 model render")
    bench(bilat20, depth, label="bilateral 640x480          ")
    bench(icp20, depth, depth, label="ICP full 10/5/4 pyramid    ")
    bench(integ20, kvol, depth, cam, label="integrate 256^3 line mode  ")
