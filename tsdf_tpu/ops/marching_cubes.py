"""Marching-cubes surface extraction as a fused JAX computation.

TPU-native re-design of the reference's mark-and-sweep marching cubes
(ref: src/MarchingCubes/MarkAndSweepMC.cu:133-551). The reference runs a
classify kernel, copies counts to the HOST for a sequential prefix-sum,
then launches a scatter kernel (SURVEY.md §2.3). Here the three phases
are one jit graph with static shapes:

  1. classify every cube from 8 shifted sign slices (pure VPU, no
     gather);
  2. compact occupied cubes on-device: `jnp.cumsum` ranks + scatter into
     a fixed-size cube list (replacing the host scan);
  3. sweep the occupied cubes: look up the triangulation
     (ops/mc_tables.py), interpolate edge zero-crossings, and scatter
     vertices to their cumsum offsets.

Outputs are fixed-size padded buffers + counts (jit-friendly); triangle
soup semantics match the reference (every 3 consecutive vertices = one
triangle, vertices ordered so normals point toward positive TSDF).
Per-vertex bracketing-voxel indices are emitted for SceneFusion's
deformation-field update (ref: generate_vertices
MarkAndSweepMC.cu:290-301).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..volume import TSDFVolume
from .mc_tables import (
    CORNER_OFFSETS,
    EDGE_CORNERS,
    MAX_TRIS,
    TRI_TABLE,
    VERT_COUNTS,
)

_MAX_V = MAX_TRIS * 3


class TriangleSoup(NamedTuple):
    """Fixed-size triangle soup; every 3 consecutive valid vertices form
    one triangle."""

    vertices: jnp.ndarray  # (max_vertices, 3) f32 world mm; garbage past n
    vertex_voxels: jnp.ndarray  # (max_vertices, 2) i32 flat voxel indices
    n_vertices: jnp.ndarray  # () i32 — number of valid vertices
    overflowed: jnp.ndarray  # () bool — buffers were too small


def extract_surface(
    vol: TSDFVolume,
    max_cubes: int = 1 << 18,
    max_vertices: int = 1 << 20,
    on_cpu: bool | None = None,
) -> TriangleSoup:
    """Extract the zero isosurface as a triangle soup.

    Args:
      vol: the volume; tsdf < 0 is inside (ref: calculate_cube_type
        MarkAndSweepMC.cu:110-124).
      max_cubes: static capacity for occupied cubes.
      max_vertices: static capacity for emitted vertices.
      on_cpu: run the extraction on the host CPU backend. Default: auto
        — True whenever the default backend is an accelerator, because
        XLA:TPU's lowering of the compaction scatters/gathers here has
        pathological compile times (mesh extraction is a cold path whose
        output goes to host PLY writers anyway; the brick-sharded
        on-device variant is parallel/ops.extract_surface_sharded).

    Returns:
      TriangleSoup. If ``overflowed`` is set, re-run with larger caps.
    """
    if on_cpu is None:
        on_cpu = jax.default_backend() != "cpu"
    if on_cpu and jax.default_backend() != "cpu":
        cpu = jax.devices("cpu")[0]
        tsdf = jax.device_put(jax.device_get(vol.tsdf), cpu)
        voxel_size = jax.device_put(jax.device_get(vol.voxel_size), cpu)
        offset = jax.device_put(jax.device_get(vol.offset), cpu)
        with jax.default_device(cpu):
            return _extract_jit(
                tsdf, voxel_size, offset, max_cubes, max_vertices
            )
    return _extract_jit(
        vol.tsdf, vol.voxel_size, vol.offset, max_cubes, max_vertices
    )


@partial(jax.jit, static_argnames=("max_cubes", "max_vertices"))
def _extract_jit(tsdf, voxel_size, offset, max_cubes, max_vertices):
    return _extract_arrays(
        tsdf, voxel_size, offset,
        max_cubes=max_cubes, max_vertices=max_vertices,
    )


def _extract_arrays(
    d: jnp.ndarray,
    voxel_size: jnp.ndarray,
    offset: jnp.ndarray,
    max_cubes: int,
    max_vertices: int,
    n_cube_z=None,
    voxel_index_base=None,
) -> TriangleSoup:
    """Core extraction over raw arrays.

    Args:
      n_cube_z: number of valid cube z-rows (traced ok); cubes at or
        beyond it are masked out. Defaults to Z-1. Used by the sharded
        path where a brick's halo row must not emit duplicates.
      voxel_index_base: added to emitted flat voxel indices (sharded
        path: convert brick-local to global indices).
    """
    Z, Y, X = d.shape
    d = jnp.asarray(d, jnp.float32)  # bf16 storage: interpolate in f32
    inside = d < 0.0

    # --- phase 1: classify -------------------------------------------------
    # corner k of cube (z, y, x) is voxel (z + dz, y + dy, x + dx)
    cz, cy, cx = Z - 1, Y - 1, X - 1
    cube_type = jnp.zeros((cz, cy, cx), jnp.int32)
    for k in range(8):
        dx, dy, dz = (int(v) for v in CORNER_OFFSETS[k])
        bit = inside[dz : dz + cz, dy : dy + cy, dx : dx + cx]
        cube_type = cube_type | (bit.astype(jnp.int32) << k)
    cube_type = cube_type.ravel()

    vert_counts = jnp.asarray(VERT_COUNTS, jnp.int32)[cube_type]
    occupied = vert_counts > 0
    if n_cube_z is not None:
        zrow = (
            jnp.arange(cz * cy * cx, dtype=jnp.int32) // (cy * cx)
        )
        occupied = occupied & (zrow < n_cube_z)

    # --- phase 2: compact occupied cubes on-device -------------------------
    occ_rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    n_occ = occ_rank[-1] + 1
    scatter_to = jnp.where(occupied, occ_rank, max_cubes)
    cube_ids = (
        jnp.zeros(max_cubes, jnp.int32)
        .at[scatter_to]
        .set(jnp.arange(cube_type.shape[0], dtype=jnp.int32), mode="drop")
    )
    # per-cube vertex write offsets (exclusive cumsum over occupied only)
    occ_counts = jnp.where(occupied, vert_counts, 0)
    offsets_all = jnp.cumsum(occ_counts) - occ_counts
    cube_offsets = (
        jnp.zeros(max_cubes, jnp.int32)
        .at[scatter_to]
        .set(offsets_all, mode="drop")
    )
    n_verts = jnp.sum(occ_counts)

    cube_valid = jnp.arange(max_cubes) < n_occ

    # --- phase 3: sweep ----------------------------------------------------
    # geometry of the occupied cubes
    cid = cube_ids
    cub_z = cid // (cy * cx)
    rem = cid - cub_z * (cy * cx)
    cub_y = rem // cx
    cub_x = rem - cub_y * cx

    vs = voxel_size
    flat_d = d.ravel()

    def corner_data(k):
        dx, dy, dz = (int(v) for v in CORNER_OFFSETS[k])
        vx = cub_x + dx
        vy = cub_y + dy
        vz = cub_z + dz
        lin = (vz * Y + vy) * X + vx
        w = jnp.take(flat_d, lin, axis=0)
        centre = (
            jnp.stack(
                [
                    vx.astype(jnp.float32) + 0.5,
                    vy.astype(jnp.float32) + 0.5,
                    vz.astype(jnp.float32) + 0.5,
                ],
                axis=-1,
            )
            * vs[None, :]
            + offset[None, :]
        )
        return w, centre, lin

    ws, centres, lins = zip(*(corner_data(k) for k in range(8)))
    ws = jnp.stack(ws, axis=-1)  # (max_cubes, 8)
    centres = jnp.stack(centres, axis=-2)  # (max_cubes, 8, 3)
    lins = jnp.stack(lins, axis=-1)  # (max_cubes, 8)

    # per-edge interpolated vertices (max_cubes, 12, 3)
    ec = jnp.asarray(EDGE_CORNERS, jnp.int32)
    w0 = ws[:, ec[:, 0]]
    w1 = ws[:, ec[:, 1]]
    v0 = centres[:, ec[:, 0]]
    v1 = centres[:, ec[:, 1]]
    denom = w1 - w0
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    ratio = jnp.clip(-w0 / denom, 0.0, 1.0)[..., None]
    edge_verts = v0 + ratio * (v1 - v0)  # ref: interpolate MC.cu:47-63
    edge_vox = jnp.stack(
        [lins[:, ec[:, 0]], lins[:, ec[:, 1]]], axis=-1
    )  # (max_cubes, 12, 2)
    if voxel_index_base is not None:
        edge_vox = edge_vox + voxel_index_base

    # triangulation lookup + scatter to offsets
    types = cube_type[cid]  # (max_cubes,)
    tri_edges = jnp.asarray(TRI_TABLE, jnp.int32)[types]  # (max_cubes, _MAX_V)
    slot_valid = (tri_edges >= 0) & cube_valid[:, None]
    edge_idx = jnp.maximum(tri_edges, 0)

    vert = jnp.take_along_axis(edge_verts, edge_idx[..., None], axis=1)
    vvox = jnp.take_along_axis(edge_vox, edge_idx[..., None], axis=1)

    dest = cube_offsets[:, None] + jnp.arange(_MAX_V, dtype=jnp.int32)[None, :]
    dest = jnp.where(slot_valid, dest, max_vertices)

    vertices = (
        jnp.zeros((max_vertices, 3), jnp.float32)
        .at[dest.ravel()]
        .set(vert.reshape(-1, 3), mode="drop")
    )
    vertex_voxels = (
        jnp.zeros((max_vertices, 2), jnp.int32)
        .at[dest.ravel()]
        .set(vvox.reshape(-1, 2), mode="drop")
    )

    overflowed = (n_occ > max_cubes) | (n_verts > max_vertices)
    return TriangleSoup(
        vertices=vertices,
        vertex_voxels=vertex_voxels,
        n_vertices=jnp.minimum(n_verts, max_vertices),
        overflowed=overflowed,
    )


def soup_to_numpy(soup: TriangleSoup):
    """Host-side: (n, 3) vertices f32 + (n/3, 3) triangle index array."""
    import numpy as np

    n = int(soup.n_vertices)
    verts = np.asarray(soup.vertices)[:n]
    tris = np.arange(n - n % 3, dtype=np.int32).reshape(-1, 3)
    return verts, tris
