"""BASELINE config 5: brick-sharded 768^3 volume + marching-cubes export.

No multi-host hardware exists in this environment (the sharded paths —
integrate_sharded / raycast_sharded_bricked / extract_surface_sharded —
are validated for equality on the virtual 8-device CPU mesh in
tests/test_parallel*.py, and the driver dry-runs the full sharded step).
What CAN be measured honestly here is the per-chip work of one host of
a brick-sharded run, on the real v5e:

  1. integrate a 640x480 frame into the full 768^3 volume (Pallas line
     kernel — the same kernel integrate_sharded launches per brick);
  2. extract the mesh brick-by-brick exactly the way
     extract_surface_sharded does on a mesh: 8 z-bricks of 96+1 halo
     slabs, each through the chunked on-device compaction with a
     voxel_index_base / n_cube_z cut, merged on host, written as PLY.

Per-brick buffers stay O(brick), so this is the memory shape of the
multi-host path, just executed sequentially on one chip.

Run: PYTHONPATH=. timeout 570 python tools/run_config5.py
Env: GRID (default 768), BRICKS (default 8).
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels import integrate_pallas
from tsdf_tpu.ops.marching_cubes import _extract_arrays
from tsdf_tpu.utils import fixtures

W, H = 640, 480
GRID = int(os.environ.get("GRID", "768"))
BRICKS = int(os.environ.get("BRICKS", "8"))


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


# --- part 1: integrate at 768^3 (the sharded kernel's per-brick work) --
vol = make_volume((GRID,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
camera = (
    Camera.default_depth_camera()
    .move_to([300.0, -200.0, -500.0])
    .look_at([50.0, 80.0, 1500.0])
)
depth = jnp.asarray(fixtures.sphere_depth_map(W, H, 150.0, 1000.0, 2500.0))

interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret mode
v, miss = integrate_pallas(vol, depth, camera, mode="line", interpret=interp)
sync(v.weight)
iters = 5
t0 = time.time()
for _ in range(iters):
    v, miss = integrate_pallas(v, depth, camera, mode="line", interpret=interp)
sync(v.weight)
dt_int = (time.time() - t0) / iters
assert int(miss) == 0
print(
    f"[config5] integrate {GRID}^3 line mode: {dt_int*1e3:.1f} ms/frame = "
    f"{GRID**3/dt_int/1e9:.1f} G voxel-updates/s",
    flush=True,
)

# --- part 2: brick-wise marching cubes export --------------------------
# free part 1's state: ~7 GB of 768^3 tsdf+weight pairs; sphere_tsdf's
# centre computation transiently needs several more volume-sized
# buffers and the 16 GB chip OOMs if part 1 stays alive
del v, miss, vol
sphere = fixtures.sphere_tsdf(
    make_volume((GRID,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)),
    900.0,
    centre=(0.0, 0.0, 1500.0),
)

Z, Y, X = sphere.tsdf.shape
zl = Z // BRICKS
vs = sphere.voxel_size
max_cubes, max_verts = 1 << 19, 1 << 21

jit_extract = jax.jit(
    lambda t, loff, ncz, base: _extract_arrays(
        t,
        vs,
        loff,
        max_cubes=max_cubes,
        max_vertices=max_verts,
        n_cube_z=ncz,
        voxel_index_base=base,
        tpu_safe=jax.default_backend() == "tpu",
    ),
    static_argnames=(),
)

parts = []
t0 = time.time()
n_total = 0
for b in range(BRICKS):
    z0 = b * zl
    hi = min(z0 + zl + 1, Z)  # +1 halo slab except on the last brick
    tsdf_loc = jax.lax.slice_in_dim(sphere.tsdf, z0, hi, axis=0)
    if hi - z0 < zl + 1:  # pad the last brick to the common shape
        tsdf_loc = jnp.pad(
            tsdf_loc,
            ((0, zl + 1 - (hi - z0)), (0, 0), (0, 0)),
            constant_values=sphere.truncation_distance,
        )
    loff = sphere.offset + jnp.array([0.0, 0.0, 1.0], jnp.float32) * (
        z0 * vs[2]
    )
    ncz = jnp.int32(zl if b < BRICKS - 1 else zl - 1)
    soup = jit_extract(tsdf_loc, loff, ncz, jnp.int32(z0) * (Y * X))
    n = int(soup.n_vertices)
    assert not bool(soup.overflowed), f"brick {b} overflowed"
    # slice ON DEVICE before D2H: pulling the full 2M-slot static cap
    # through the remote tunnel cost ~12 s/brick (the bulk of the
    # round-5 first measurement's 143 s)
    parts.append(np.asarray(soup.vertices[:n]))
    n_total += n
dt_mc = time.time() - t0
verts = np.concatenate(parts, axis=0)
n = len(verts) - len(verts) % 3
print(
    f"[config5] brick-wise MC at {GRID}^3 ({BRICKS} z-bricks of {zl}+1 "
    f"slabs, O(brick) memory): {n_total} vertices in {dt_mc*1e3:.0f} ms "
    f"(incl. per-brick host sync)",
    flush=True,
)

out = "/tmp/config5_mesh.ply"
from tsdf_tpu.io.ply import write_ply

write_ply(out, verts[:n], np.arange(n, dtype=np.int32).reshape(-1, 3))
print(f"[config5] mesh written: {out} ({n} vertices)", flush=True)

# sanity: vertex radius error against the analytic sphere
r = np.linalg.norm(verts[:n] - np.array([0.0, 0.0, 1500.0]), axis=-1)
print(
    f"[config5] sphere radius error: mean {np.abs(r-900.0).mean():.2f} mm "
    f"(p95 {np.percentile(np.abs(r-900.0), 95):.2f}) at "
    f"{float(vs[0]):.1f} mm voxels",
    flush=True,
)
