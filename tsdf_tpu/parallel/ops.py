"""shard_map'd fusion ops: brick-sharded integrate, ray-tiled raycast.

TPU-native replacements for the reference's single-GPU kernel launches
(SURVEY.md §2.9): the CUDA grid/block decomposition becomes the XLA device
mesh, and the H<->D memcpy boundaries become ICI collectives.

  * integrate: each device owns a z-slab ("brick") of the volume; the depth
    frame is replicated, so the update is embarrassingly parallel — zero
    collectives, perfect weak scaling (replaces integrate_kernel's
    (y,z)-thread decomposition, ref: src/TSDF/TSDFVolume.cu:889-892).
  * raycast: ray tiles are sharded over the whole mesh while each device
    all-gathers the volume over the brick axis once per frame (rays cross
    brick boundaries freely; one tiled all_gather over ICI replaces the
    reference's per-pixel global-memory traversal, ref:
    src/RayCaster/GPURaycaster.cu:479-481).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 moved shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..camera import Camera
from ..volume import TSDFVolume
from ..ops.integrate import integrate
from ..ops.raycast import (
    REFERENCE_MAX_STEPS,
    march_rays,
    ray_directions,
    compute_normals_from_vertices,
)
from .mesh import volume_sharding, replicated


def shard_volume(vol: TSDFVolume, mesh: Mesh) -> TSDFVolume:
    """Place a volume on the mesh: dense arrays z-sharded, metadata
    replicated. The volume's Z extent must divide the "b" axis size."""
    vs = volume_sharding(mesh)
    rep = replicated(mesh)

    def place(arr, sharded):
        if arr is None:
            return None
        return jax.device_put(arr, vs if sharded else rep)

    return TSDFVolume(
        tsdf=place(vol.tsdf, True),
        weight=place(vol.weight, True),
        color=place(vol.color, True),
        deform=place(vol.deform, True),
        deform_rot=place(vol.deform_rot, True),
        physical_size=place(vol.physical_size, False),
        offset=place(vol.offset, False),
        truncation_distance=place(vol.truncation_distance, False),
        max_weight=place(vol.max_weight, False),
        global_rotation=place(vol.global_rotation, False),
        global_translation=place(vol.global_translation, False),
    )


def _local_slab_volume(
    tsdf, weight, deform, physical_size, offset, trunc, max_weight, nb
):
    """Reconstruct a TSDFVolume describing this device's z-slab.

    The slab keeps the global voxel size; its world offset shifts by
    brick_index * slab_thickness along z.
    """
    bi = jax.lax.axis_index("b")
    sz_local = tsdf.shape[0]
    slab_phys_z = physical_size[2] / nb
    local_offset = offset + jnp.array([0.0, 0.0, 1.0], jnp.float32) * (
        bi.astype(jnp.float32) * slab_phys_z
    )
    local_phys = physical_size * jnp.array(
        [1.0, 1.0, 1.0 / nb], jnp.float32
    )
    return TSDFVolume(
        tsdf=tsdf,
        weight=weight,
        color=None,
        deform=deform,
        deform_rot=None,
        physical_size=local_phys,
        offset=local_offset,
        truncation_distance=trunc,
        max_weight=max_weight,
        global_rotation=jnp.zeros(3, jnp.float32),
        global_translation=jnp.zeros(3, jnp.float32),
    )


def integrate_sharded(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    mesh: Mesh,
    cap_weight: bool = False,
    use_pallas: bool | None = None,
    nk: int = 3,
    interpret: bool | None = None,
    return_miss: bool = False,
):
    """Brick-parallel depth integration. No collectives in the update
    itself (one psum folds the per-brick miss counters).

    The rigid path composes the line-warp Pallas kernel
    (kernels/integrate.py) inside the shard_map — the brick decomposition
    of the reference's ``integrate_kernel`` launch (ref:
    src/TSDF/TSDFVolume.cu:889-892) carried onto the device mesh at full
    single-chip kernel speed per brick. Deformed volumes use the lax
    path (also the gradient path).

    Requires vol.tsdf.shape[0] % mesh.shape["b"] == 0.

    Returns the updated volume, or (volume, miss_count) when
    ``return_miss`` (Pallas path only; the lax path misses nothing).
    """
    has_deform = vol.deform is not None
    if use_pallas is None:
        use_pallas = not has_deform
    if use_pallas and has_deform:
        raise ValueError(
            "the Pallas integrate is the rigid path; deformed volumes "
            "integrate through the lax path (use_pallas=False)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out, miss = _integrate_sharded_jit(
        vol, jnp.asarray(depth, jnp.float32), camera, mesh=mesh,
        cap_weight=cap_weight, use_pallas=use_pallas, nk=nk,
        interpret=interpret,
    )
    return (out, miss) if return_miss else out


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "cap_weight", "use_pallas", "nk", "interpret",
    ),
)
def _integrate_sharded_jit(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    camera: Camera,
    *,
    mesh: Mesh,
    cap_weight: bool,
    use_pallas: bool,
    nk: int,
    interpret: bool,
):
    # One jit around the whole shard_map: without it every frame re-trace
    # + eager per-op dispatch through the remote tunnel made the sharded
    # path ~1000x slower than the kernel it wraps (measured round 2).
    nb = mesh.shape["b"]
    has_deform = vol.deform is not None

    def local(tsdf, weight, deform, depth, k, pose, pose_inv,
              physical_size, offset, trunc, max_weight):
        lvol = _local_slab_volume(
            tsdf, weight, deform, physical_size, offset, trunc, max_weight,
            nb,
        )
        cam = Camera(
            k=k, k_inv=jnp.linalg.inv(k), pose=pose, pose_inv=pose_inv
        )
        if use_pallas:
            from ..kernels.integrate import integrate_pallas

            out, miss = integrate_pallas(
                lvol, depth, cam, cap_weight=cap_weight, nk=nk,
                interpret=interpret,
            )
            miss = jax.lax.psum(miss, "b")
        else:
            out = integrate(lvol, depth, cam, cap_weight=cap_weight)
            miss = jnp.int32(0)
        return out.tsdf, out.weight, miss

    if has_deform:
        deform_arg = vol.deform
        deform_spec = P("b")
    else:
        # None is an empty pytree: its spec subtree must be empty too.
        deform_arg = None
        deform_spec = None

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("b"), P("b"), deform_spec, P(), P(), P(), P(), P(), P(),
            P(), P(),
        ),
        out_specs=(P("b"), P("b"), P()),
        # pallas_call emits ShapeDtypeStructs without vma annotations;
        # varying-mesh-axis checking cannot see through it
        check_vma=False,
    )
    new_tsdf, new_weight, miss = fn(
        vol.tsdf,
        vol.weight,
        deform_arg,
        depth,
        camera.k,
        camera.pose,
        camera.pose_inv,
        vol.physical_size,
        vol.offset,
        vol.truncation_distance,
        vol.max_weight,
    )
    return vol.replace(tsdf=new_tsdf, weight=new_weight), miss


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "mode", "max_steps"),
)
def raycast_sharded(
    vol: TSDFVolume,
    camera: Camera,
    mesh: Mesh,
    width: int = 640,
    height: int = 480,
    mode: str = "sphere",
    max_steps: int = REFERENCE_MAX_STEPS,
    step_scale: float = 0.75,
):
    """Ray-tiled raycast: rays sharded over every device, volume
    all-gathered over the brick axis (one tiled ICI all_gather).

    Returns (vertices, normals) as in ops.raycast.
    """
    n_dev = mesh.shape["b"] * mesh.shape["r"]
    dirs = ray_directions(camera, width, height).reshape(-1, 3)
    n = dirs.shape[0]
    pad = (-n) % n_dev
    if pad:
        dirs = jnp.concatenate(
            [dirs, jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (pad, 1))], axis=0
        )

    def local(tsdf_slab, dirs_tile, physical_size, offset, trunc, origin):
        full = jax.lax.all_gather(tsdf_slab, "b", axis=0, tiled=True)
        lvol = TSDFVolume(
            tsdf=full,
            weight=full,
            color=None,
            deform=None,
            deform_rot=None,
            physical_size=physical_size,
            offset=offset,
            truncation_distance=trunc,
            max_weight=trunc,
            global_rotation=jnp.zeros(3, jnp.float32),
            global_translation=jnp.zeros(3, jnp.float32),
        )
        return march_rays(
            lvol, origin, dirs_tile,
            mode=mode, max_steps=max_steps, step_scale=step_scale,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("b"), P(("b", "r")), P(), P(), P(), P()),
        out_specs=P(("b", "r")),
    )
    verts = fn(
        vol.tsdf,
        dirs,
        vol.physical_size,
        vol.offset,
        vol.truncation_distance,
        camera.position,
    )
    verts = verts[: height * width].reshape(height, width, 3)
    normals = compute_normals_from_vertices(verts)
    return verts, normals


def icp_step_sharded(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    vmap_prev: jnp.ndarray,
    nmap_prev: jnp.ndarray,
    intrinsics: tuple,
    mesh: Mesh,
    dist_thresh: float = 100.0,
    angle_thresh: float = 0.342,
):
    """ICP normal equations with the residual reduction psum'd over the
    mesh — the TPU-native replacement for estimate.cu's 29-vector
    warp-shuffle reduction tree (ref: estimate.cu:26-85, 264-281).

    Current-frame pixel rows are sharded over every device; the model
    (previous) maps are replicated since projective association crosses
    row boundaries. Requires H % n_devices == 0.
    """
    from ..tracking.icp import icp_step

    fx, fy, cx, cy = intrinsics

    def local(vc, nc, vp, np_, rot, trans):
        a, b, res, inl = icp_step(
            rot, trans, vc, nc, vp, np_, fx, fy, cx, cy,
            dist_thresh, angle_thresh,
        )
        axes = ("b", "r")
        return (
            jax.lax.psum(a, axes),
            jax.lax.psum(b, axes),
            jax.lax.psum(res, axes),
            jax.lax.psum(inl, axes),
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(("b", "r")), P(("b", "r")), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P(), P()),
    )
    return fn(vmap_curr, nmap_curr, vmap_prev, nmap_prev, rot, trans)


def extract_surface_sharded(
    vol: TSDFVolume,
    mesh: Mesh,
    max_cubes_per_brick: int = 1 << 16,
    max_vertices_per_brick: int = 1 << 18,
):
    """Brick-parallel marching cubes.

    Each brick extracts the cubes whose base voxel it owns, reading its
    +z neighbour's first slab via halo exchange (the reference needs a
    host-side scan between its two kernels, SURVEY.md §2.3; here the
    whole thing stays on device and parallel over bricks).

    Returns a TriangleSoup-like tuple of stacked per-brick buffers:
      vertices:      (nb, max_vertices_per_brick, 3) world mm
      vertex_voxels: (nb, max_vertices_per_brick, 2) GLOBAL voxel indices
      n_vertices:    (nb,)
      overflowed:    (nb,)
    Merge on host with ``merge_brick_soups``.
    """
    from ..ops.marching_cubes import _extract_arrays
    from .halo import halo_exchange_z

    nb = mesh.shape["b"]
    Z, Y, X = vol.tsdf.shape
    zl = Z // nb
    ext = halo_exchange_z(vol.tsdf, mesh, halo=1)  # (Z + 2nb, Y, X)

    def local(ext_block, physical_size, offset, voxel_size):
        bi = jax.lax.axis_index("b")
        # block = [prev halo | own zl slabs | next halo]; cubes rooted in
        # own slabs need slabs [1 .. zl+1] of the block
        tsdf_loc = ext_block[1:]
        z0 = bi * zl
        local_offset = offset + jnp.array(
            [0.0, 0.0, 1.0], jnp.float32
        ) * (z0.astype(jnp.float32) * voxel_size[2])
        # last brick owns one fewer cube row (no z+1 neighbour)
        n_cube_z = jnp.where(bi == nb - 1, zl - 1, zl)
        soup = _extract_arrays(
            tsdf_loc,
            voxel_size,
            local_offset,
            max_cubes=max_cubes_per_brick,
            max_vertices=max_vertices_per_brick,
            n_cube_z=n_cube_z,
            voxel_index_base=z0 * (Y * X),
        )
        return (
            soup.vertices[None],
            soup.vertex_voxels[None],
            soup.n_vertices[None],
            soup.overflowed[None],
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("b"), P(), P(), P()),
        out_specs=(P("b"), P("b"), P("b"), P("b")),
    )
    return fn(ext, vol.physical_size, vol.offset, vol.voxel_size)


def merge_brick_soups(brick_soups):
    """Host-side: concatenate per-brick triangle soups into
    (verts (n, 3), tris (n/3, 3)) numpy arrays."""
    import numpy as np

    verts_b, _voxels_b, n_b, overflow_b = brick_soups
    if bool(np.asarray(overflow_b).any()):
        raise ValueError(
            "a brick overflowed; raise max_cubes/max_vertices_per_brick"
        )
    parts = []
    for b in range(np.asarray(verts_b).shape[0]):
        n = int(np.asarray(n_b)[b])
        parts.append(np.asarray(verts_b)[b, :n])
    verts = np.concatenate(parts, axis=0)
    n = len(verts) - len(verts) % 3
    verts = verts[:n]
    tris = np.arange(n, dtype=np.int32).reshape(-1, 3)
    return verts, tris
