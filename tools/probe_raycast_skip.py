"""A/B the run-jump raycast skip at 512^3 (chained-loop timing).

Scenes: sphere (bench raycast section), deep wall (raycast_deep), and
the 256^3 sphere+wall tracked-model render. Equality vs the lax path is
covered by tests; here we assert hit-mask equality vs the pre-skip
in-body-min behaviour via _sweep_bricks(brick_live=None).

Run: PYTHONPATH=. timeout 1800 python tools/probe_raycast_skip.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels.raycast import raycast_pallas
from tsdf_tpu.utils import fixtures

W, H = 640, 480
N = 10


def sync(x):
    x = jnp.asarray(x, jnp.float32)
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(N):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    dt = (time.time() - t0) / N * 1e3
    print(f"[{name}] compile={tc:.1f}s loop={dt:.1f}ms/iter", flush=True)
    return out


t0 = time.time()
sync(jnp.ones((8, 128)))
print(f"[claim] {time.time()-t0:.1f}s", flush=True)

grid = 512
vol = fixtures.sphere_tsdf(
    make_volume((grid,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)),
    600.0,
)
cam = (
    Camera.default_depth_camera()
    .move_to([0.0, 0.0, -900.0])
    .look_at([0.0, 0.0, 1500.0])
)

ray = jax.jit(
    lambda v, c: raycast_pallas(v, c, width=W, height=H)[0]
)
v_sphere = timeit("raycast sphere 512", ray, vol, cam)

wall = fixtures.wall_tsdf(vol, 2500.0)
deep = vol.replace(
    tsdf=jnp.minimum(vol.tsdf, wall.tsdf),
    weight=jnp.ones_like(vol.weight),
)
v_deep = timeit("raycast deep 512", ray, deep, cam)

# deep scene but wall-only (pure empty sweep until the wall)
wall_only = fixtures.wall_tsdf(
    make_volume((grid,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)),
    2500.0,
)
wall_only = wall_only.replace(weight=jnp.ones_like(wall_only.weight))
timeit("raycast wall-only 512", ray, wall_only, cam)

# tracked-model shape: 256^3 sphere+wall
scene = fixtures.sphere_tsdf(
    make_volume((256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)), 600.0
)
wall3 = fixtures.wall_tsdf(scene, 2500.0)
scene = scene.replace(
    tsdf=jnp.minimum(scene.tsdf, wall3.tsdf),
    weight=jnp.ones_like(scene.weight),
)
timeit("raycast tracked-model 256", ray, scene, cam)

# hit-mask equality vs the in-body-min path (brick_live=None)
from tsdf_tpu.kernels import raycast as rk


def ray_noskip(v, c):
    m = c.rotation @ c.k_inv
    origin = c.position
    fwd = c.pose[0:3, 2]
    perm = rk._SWEEP_PERMS[0]
    p = jnp.asarray(perm)
    ip = jnp.asarray(rk._inv_perm(perm))
    tsdf_p = jnp.transpose(v.tsdf, rk._array_perm(perm))

    def provider(p0, zb):
        return jax.lax.dynamic_slice_in_dim(tsdf_p, p0, zb, axis=0)

    verts_p = rk._sweep_bricks(
        provider, tsdf_p.shape[0], tsdf_p.shape[1], tsdf_p.shape[2],
        m[p, :], origin[p], v.offset[p], v.physical_size[p],
        v.voxel_size[p], fwd[perm[2]], W, H, False,
    )
    return verts_p[..., ip]


v_ref = jax.jit(ray_noskip)(deep, cam)
agree = float(
    jnp.mean(
        (jnp.isfinite(v_deep).all(-1) == jnp.isfinite(v_ref).all(-1))
        .astype(jnp.float32)
    )
)
err = float(
    jnp.nanmax(
        jnp.where(
            jnp.isfinite(v_deep) & jnp.isfinite(v_ref),
            jnp.abs(v_deep - v_ref),
            0.0,
        )
    )
)
print(f"[check] deep hit-mask agreement={agree*100:.3f}% max|dv|={err:.4f}mm",
      flush=True)
