"""SceneFusion: non-rigid fusion with a per-voxel deformation field.

TPU-native re-design of the reference's SceneFusion orchestrator + kernel
chain (ref: src/SceneFusion/SceneFusion.cpp:46-185,
SceneFusion_krnl.cu:236-401). Per frame:

  1. extract the current isosurface mesh with per-vertex bracketing
     voxel indices (ops/marching_cubes.py, the reference's
     extract_surface_ms);
  2. find correspondences: project each mesh vertex into the depth
     frame, accept when the reprojected depth agrees within 10 mm
     (ref: find_mesh_vertex_correspondences SceneFusion_krnl.cu:74-114,
     threshold :15);
  3. update the deformation field: every corresponding vertex adds
     flow(pixel)/usage(voxel) to BOTH its bracketing voxels'
     translations. The reference does this with racy non-atomic adds
     (ref: update_deformation_field SceneFusion_krnl.cu:211-232,
     SURVEY.md §5 'known race'); here the adds are deterministic sums —
     XLA ``.at[].add`` on CPU, the sorted matmul scatter
     (ops/scatter.py) on TPU;
  4. integrate the new depth frame into the (now deformed) volume
     (ref: SceneFusion.cpp:139).

The reference's host-side compaction scan (SceneFusion_krnl.cu:126-167)
disappears: masking does the same work without leaving the device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera
from ..ops.integrate import integrate
from ..ops.marching_cubes import (
    TriangleSoup,
    _extract_arrays,
    extract_surface,
)
from ..ops.scatter import scatter_add_flat
from ..volume import TSDFVolume, make_volume

# ref: SceneFusion_krnl.cu:15
CORRESPONDENCE_THRESHOLD_MM = 10.0

# Slot-correspondence walk block size: each block pays one gather_flat
# (whose internal sort dominates; XLA:TPU sort cost is super-linear in
# length). Module-level so probes can A/B it.
_CORR_BLK = 1 << 16


@dataclasses.dataclass(frozen=True)
class SceneFusionConfig:
    volume_size: tuple[int, int, int] = (255, 255, 255)  # ref: SceneFusion.cpp:49
    physical_size_mm: float = 2550.0
    offset_mm: tuple[float, float, float] = (-1275.0, -1275.0, 0.0)
    threshold_mm: float = CORRESPONDENCE_THRESHOLD_MM
    max_cubes: int = 1 << 18
    max_vertices: int = 1 << 20
    # First-rung cube cap for the fused TPU step (round 4): the
    # compaction streams, window walks and the order-restoring 262k
    # lax.sort all scale with the STATIC cap, not the live cube count —
    # measured 100.6 -> 80.0 ms/frame at the 255^3 default scene
    # (47k live cubes) by capping at 1<<16. On overflow the frame is
    # re-run at the ``max_cubes`` ceiling (one extra cached compile),
    # then through the unchunked exact fallback — nothing is ever
    # truncated. Set equal to max_cubes to disable the ladder.
    max_cubes_fast: int = 1 << 16
    # TPU path for the deformed-volume integrate: the warped line-sweep
    # kernel (kernels/integrate.py:integrate_warped_pallas). The window
    # base adapts per voxel column (round-4 banded window), so smooth /
    # uniform x-warps of any magnitude are exact; nk bounds only the
    # warp's pixel VARIATION within one voxel column (range <= nk - 1)
    # AROUND the per-column linear band fit. Frames whose exact-or-skip
    # miss counter still fires run the sorted-gather miss top-up (and
    # only past its cap the lax path), so no observation is ever lost.
    # Round 5: default 3 (was 5) — the linear band fit absorbs smooth
    # warps, so the wider window bought nothing on every measured
    # sequence while costing ~4 ms/frame at 255^3; pathological frames
    # pay the top-up instead.
    use_pallas: bool = True
    integrate_nk: int = 3
    # AOT-compile the use_chunked=False overflow-fallback step variant
    # in a BACKGROUND thread after the first frame's compile (lower +
    # compile, no execution; the remote compile is an HTTP wait, so the
    # fusion loop keeps running). The first chunk-cap overflow otherwise
    # traces and remote-compiles a second full fused-step graph MID-RUN
    # — with an RGBD observer attached, frames back up for the
    # (erratic, seconds-to-minutes) compile. On by default since
    # round 4 (the compile is cached across runs; the only cost is one
    # background compile the first time).
    prewarm_fallback: bool = True

    def make_volume(self) -> TSDFVolume:
        return make_volume(
            self.volume_size,
            self.physical_size_mm,
            offset=self.offset_mm,
            with_deformation=True,
        )


def _slot_correspondence(
    verts: jnp.ndarray,
    slot_valid: jnp.ndarray,
    depth: jnp.ndarray,
    camera: Camera,
    flow: jnp.ndarray,
    threshold_mm: float,
):
    """Project mesh vertices into the frame; accept when the reprojected
    depth agrees within the threshold (ref: SceneFusion_krnl.cu:74-114).
    Returns (corr mask, per-vertex flow zeroed on non-corresponding)."""
    h, w = depth.shape
    # one world_to_camera for both the projection and the depth gate
    # (bit-identical to camera.world_to_pixel, which is cam @ K.T +
    # perspective divide + round)
    cam_pts = camera.world_to_camera(verts)  # (N, 3)
    img_h = cam_pts @ camera.k.T
    pix = jnp.round(img_h[..., 0:2] / img_h[..., 2:3])  # (N, 2)
    px = pix[..., 0].astype(jnp.int32)
    py = pix[..., 1].astype(jnp.int32)
    in_img = (px >= 0) & (px < w) & (py >= 0) & (py < h) & slot_valid
    lin = jnp.clip(py, 0, h - 1) * w + jnp.clip(px, 0, w - 1)

    # one fused image gather: [depth, flow] as 4 channels per pixel.
    # The slot buffer is a static cap (max_cubes * 24 slots, ~6.3M at
    # the 255^3 default) but live cubes are a compacted prefix, so the
    # walk covers 64k-slot blocks and stops at the last live slot —
    # cost tracks the actual surface, not the cap. Each block goes
    # through gather_flat (the sorted-window matmul gather,
    # ops/scatter.py) instead of jnp.take: the XLA:TPU gather lowering
    # of a 64k-element stream alone took >15 minutes to COMPILE (the
    # dominant share of the fused SceneFusion step's ~30-minute
    # compile) and ran at ~0.11 G lookups/s. Per-block sorting keeps
    # the sort cost at 64k elements (whole-stream sorting of the 6.3M
    # cap would cost more than the gather it replaces); dead slots map
    # to an off-the-end sentinel that gather_flat zero-fills.
    img = jnp.concatenate(
        [
            depth.reshape(-1, 1),
            jnp.asarray(flow, jnp.float32).reshape(-1, 3),
        ],
        axis=-1,
    )
    N = lin.shape[0]
    if N <= (1 << 16):
        g = jnp.take(img, lin, axis=0, mode="clip")  # (N, 4)
    else:
        from ..ops.scatter import gather_flat

        n_live = jnp.max(
            jnp.where(slot_valid, jnp.arange(N, dtype=jnp.int32) + 1, 0)
        )
        BLK = _CORR_BLK
        nb = -(-N // BLK)
        linp = jnp.pad(
            jnp.where(slot_valid, lin, img.shape[0]),
            (0, nb * BLK - N),
            constant_values=img.shape[0],
        )

        def cond(st):
            b, _ = st
            return b * BLK < n_live

        def body(st):
            b, out = st
            lw = jax.lax.dynamic_slice(linp, (b * BLK,), (BLK,))
            gb = gather_flat(img, lw, fill_mode="zero")
            return b + 1, jax.lax.dynamic_update_slice(
                out, gb, (b * BLK, 0)
            )

        _, gp = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((nb * BLK, 4), jnp.float32))
        )
        g = gp[:N]
    d = g[:, 0]
    # Compare CAMERA-space depth (the reference's depth-only distance,
    # ref: SceneFusion_krnl.cu:100-105, where the camera frame is the
    # world frame). Comparing world z would only be correct for an
    # identity rotation; and a vertex BEHIND the camera mirror-projects
    # into the image (both pixel signs flip back in range), so gate on
    # cam_z > 0 — the same behind-camera gate ops/integrate.py applies
    # to the ungated reference projection.
    cam_z = cam_pts[..., 2]
    corr = (
        in_img
        & (d > 0)
        & (cam_z > 0)
        & (jnp.abs(d - cam_z) < threshold_mm)
    )
    return corr, jnp.where(corr[:, None], g[:, 1:], 0.0)


def update_deformation(
    vol: TSDFVolume,
    soup: TriangleSoup,
    depth: jnp.ndarray,
    camera: Camera,
    flow: jnp.ndarray,
    threshold_mm: float = CORRESPONDENCE_THRESHOLD_MM,
    tpu_safe: bool | None = None,
) -> tuple[TSDFVolume, jnp.ndarray]:
    """Apply one scene-flow observation to the deformation field.

    Args:
      soup: current surface mesh (vertices + bracketing voxel pairs),
        dense or masked layout.
      depth: (H, W) mm.
      flow: (H, W, 3) mm scene flow per pixel.
      tpu_safe: route the per-voxel accumulation through the sorted
        matmul scatter (ops/scatter.py) instead of XLA scatter-add —
        XLA:TPU's scatter lowering took 26-39 s/frame on the 16.6M-voxel
        field at 255³ (round-2 measurement); the matmul scatter runs the
        same update in tens of ms. Default: auto by backend.

    Returns (updated volume, number of corresponding vertices).
    """
    if tpu_safe is None:
        tpu_safe = jax.default_backend() == "tpu"
    depth = jnp.asarray(depth, jnp.float32)
    slot_valid = soup.valid
    verts = soup.vertices
    corr, flow_at_vert = _slot_correspondence(
        verts, slot_valid, depth, camera, flow, threshold_mm
    )

    # per-voxel accumulation: mesh-usage counts over ALL mesh vertices
    # (ref: atomicIncUint8 during generate_vertices MC.cu:297-298) and
    # flow sums over corresponding vertices — both bracketing voxels of
    # each vertex receive the contribution (SceneFusion_krnl.cu:211-232;
    # the reference's adds race, here they are deterministic sums).
    n_vox = vol.tsdf.size
    vox = soup.vertex_voxels  # (N, 2)
    if tpu_safe:
        vox2 = vox.ravel()  # (2N,) — vertex i contributes at 2i, 2i+1
        sv2 = jnp.repeat(slot_valid, 2)
        flow2 = jnp.repeat(flow_at_vert, 2, axis=0)  # already corr-masked
        lin2 = jnp.where(sv2, vox2, -1)  # out of range -> dropped
        payload = jnp.concatenate(
            [sv2.astype(jnp.float32)[None, :], flow2.T], axis=0
        )  # (4, 2N)
        acc = scatter_add_flat(n_vox, lin2, payload)
        counts = acc[0]
        flow_sum = acc[1:4].T
    else:
        vox_safe = jnp.where(slot_valid[:, None], vox, n_vox)
        counts = jnp.zeros(n_vox + 1, jnp.float32).at[
            vox_safe.ravel()
        ].add(1.0, mode="drop")[:n_vox]
        vox_corr = jnp.where(corr[:, None], vox, n_vox)  # drop non-corr
        flow_sum = (
            jnp.zeros((n_vox + 1, 3), jnp.float32)
            .at[vox_corr.ravel()]
            .add(jnp.repeat(flow_at_vert, 2, axis=0), mode="drop")[:n_vox]
        )
    delta = flow_sum / jnp.maximum(counts, 1.0)[:, None]
    new_deform = vol.deform + delta.reshape(vol.deform.shape)
    return vol.replace(deform=new_deform), jnp.sum(corr.astype(jnp.int32))


def _cube_corner_scatter(
    contrib: jnp.ndarray,
    cid: jnp.ndarray,
    edge_idx: jnp.ndarray,
    cube_valid: jnp.ndarray,
    shape: tuple[int, int, int],
) -> jnp.ndarray:
    """Fold per-slot contributions onto cube corners and scatter.

    Args:
      contrib: (C, _MAX_V, D) per-slot payload (already masked).
      cid: (C,) ascending cube ids over the (Z-1, Y-1, X-1) cube grid of
        a volume of ``shape`` voxels.
      edge_idx: (C, _MAX_V) MC edge per slot.
      cube_valid: (C,) live-cube prefix mask.
      shape: (Z, Y, X) of the TARGET voxel grid — the sharded caller
        passes its local-slab-plus-one-halo shape so corner taps that
        cross the brick boundary land in the halo slab.

    Returns (D, Z*Y*X) f32 accumulated per voxel.
    """
    from ..ops.marching_cubes import CORNER_OFFSETS

    Z, Y, X = shape

    # Dead slots carry edge 0 but a zero contribution.
    payload = _slot_corner_fold(contrib, edge_idx)

    cy, cx = Y - 1, X - 1
    cz_ = cid // (cy * cx)
    rem = cid - cz_ * (cy * cx)
    cy_ = rem // cx
    cx_ = rem - cy_ * cx
    n_vox = Z * Y * X

    offs = []
    for k in range(8):
        dx, dy, dz = (int(v) for v in CORNER_OFFSETS[k])
        offs.append((dz * Y + dy) * X + dx)
    lin0 = (cz_ * Y + cy_) * X + cx_  # cube-base voxel id (corner 3)
    # invalid cubes sit at the tail (cube_valid is a prefix); point
    # them past the end so the sorted scatter stops there
    lin0 = jnp.where(cube_valid, lin0, n_vox)
    # one window walk + one matmul per window for all 8 corners, folded
    # into a D-channel accumulator via the static corner offsets (a
    # dense 8*D-channel accumulator would be 8x the bytes — ~2 GB at
    # 255^3 and an OOM at 512^3)
    # "trusted": cid is ascending by construction (compaction emits
    # sorted ids) and cube_valid is a prefix, so the sentinel remap
    # keeps the stream monotone — skipping the checked hint's lax.cond
    # sort branch, whose XLA:TPU compile is pathological at volume
    # scale (a (1+32)-operand sort under a cond).
    return scatter_add_flat(
        n_vox,
        lin0,
        jnp.concatenate(payload, axis=0),
        is_sorted="trusted",
        fold_offsets=tuple(offs),
        # round-4 on-chip sweep (tools/tpu_logs + BASELINE.md): the
        # walk's per-window cost scales with window x rows_per_patch
        # (one-hot build), so for this ~47k-live-cube stream the
        # optimum sits at small windows — 57 ms at the (2048, 256)
        # default vs ~35 ms here (broad plateau over 256-512 x 128)
        window=512,
        rows_per_patch=128,
    )  # (D, n_vox)


def _edge_correspondence(
    soup: TriangleSoup,
    edge_idx: jnp.ndarray,
    edge_verts: jnp.ndarray,
    depth: jnp.ndarray,
    camera: Camera,
    flow: jnp.ndarray,
    threshold_mm: float,
    tpu_safe: bool,
):
    """Per-EDGE correspondence (round 5): the 24 soup slots repeat the
    ≤12 distinct edge vertices, so the depth/flow image gather runs once
    per edge and a width-12 lane gather distributes values back to
    slots — identical math to the per-slot `_slot_correspondence` at
    half the gather stream. Shared by the fused single-device step and
    the brick-parallel sharded frame. Returns (corr (N,), flow (N, 3))
    in slot layout."""
    from ..ops.marching_cubes import _MAX_V, _slot_gather

    C = edge_idx.shape[0]
    slot_valid = soup.valid.reshape(C, _MAX_V)
    ei = edge_idx  # (C, _MAX_V) in [0, 12)
    edge_used = jnp.stack(
        [jnp.any(slot_valid & (ei == e), axis=1) for e in range(12)],
        axis=1,
    )  # (C, 12)
    corr_e, flow_e = _slot_correspondence(
        edge_verts.reshape(C * 12, 3),
        edge_used.reshape(-1),
        depth, camera, flow, threshold_mm,
    )
    fe = flow_e.reshape(C, 12, 3)
    flow_slot = jnp.stack(
        [_slot_gather(fe[:, :, d], ei, tpu_safe) for d in range(3)],
        axis=-1,
    )  # (C, _MAX_V, 3)
    corr_slot = (
        _slot_gather(
            corr_e.astype(jnp.float32).reshape(C, 12), ei, tpu_safe
        )
        > 0.5
    )
    corr = (corr_slot & slot_valid).reshape(-1)
    return corr, jnp.where(corr[:, None], flow_slot.reshape(-1, 3), 0.0)


def _slot_corner_fold(contrib: jnp.ndarray, edge_idx: jnp.ndarray):
    """Fold per-slot contributions onto the 8 cube corners.

    Each corner k is incident to exactly 3 of the 12 MC edges, so the
    per-slot weight for corner k is the sum of 3 edge-equality masks —
    pure VPU compares, no table gather (ref: the per-vertex bracketing
    pair writes, MarkAndSweepMC.cu:290-301). Returns a list of 8
    (D, C) payload blocks, corner order = CORNER_OFFSETS.
    """
    from ..ops.marching_cubes import EDGE_CORNERS

    ec = np.asarray(EDGE_CORNERS)  # (12, 2) static
    edge_mask = [
        (edge_idx == i).astype(jnp.float32) for i in range(12)
    ]  # 12 x (C, _MAX_V)
    corner_edges = [
        [i for i in range(12) if k in (int(ec[i, 0]), int(ec[i, 1]))]
        for k in range(8)
    ]
    assert all(len(v) == 3 for v in corner_edges)
    payload = []
    for k in range(8):
        a, b, c = corner_edges[k]
        w_k = edge_mask[a] + edge_mask[b] + edge_mask[c]  # (C, _MAX_V)
        payload.append(jnp.einsum("cs,csd->dc", w_k, contrib))  # (D, C)
    return payload


def update_deformation_cubes(
    vol: TSDFVolume,
    soup: TriangleSoup,
    cid: jnp.ndarray,
    edge_idx: jnp.ndarray,
    cube_valid: jnp.ndarray,
    depth: jnp.ndarray,
    camera: Camera,
    flow: jnp.ndarray,
    threshold_mm: float = CORRESPONDENCE_THRESHOLD_MM,
    edge_verts: jnp.ndarray | None = None,
) -> tuple[TSDFVolume, jnp.ndarray]:
    """TPU fast path of ``update_deformation`` over cube slots.

    Same math, different factoring: every bracketing voxel of a mesh
    vertex is a corner of its cube, so the (count, flow) contributions
    fold per cube onto its 8 corners with a static edge→corner table
    (pure VPU compares + reductions over the _MAX_V=24 slots), and all
    8 corner streams ride ONE 32-channel ``scatter_add_flat`` targeted
    at the cube-base voxel (z, y, x) (cid is id-sorted, so the stream
    is pre-sorted and there is a single window walk); corner k's dense
    result is then shifted into place by its static voxel offset
    (out[lin+off] += v == shift(scatter(lin, v), off)) — ~48× fewer
    matmul windows than scattering the raw 2·24·max_cubes slot stream,
    and 8× fewer than one scatter per corner.

    With ``edge_verts`` (round 5): the depth/flow image gather runs per
    EDGE (the ≤12 distinct vertices each cube can own) instead of per
    slot (24, which repeat edges) — the gather stream halves, and the
    per-slot values come back through a narrow width-12 lane gather.
    Identical math: a slot's pixel is its edge's pixel.
    """
    from ..ops.marching_cubes import _MAX_V

    depth = jnp.asarray(depth, jnp.float32)
    C = cid.shape[0]
    if edge_verts is not None:
        corr, flow_at_vert = _edge_correspondence(
            soup, edge_idx, edge_verts, depth, camera, flow,
            threshold_mm, True,
        )
    else:
        corr, flow_at_vert = _slot_correspondence(
            soup.vertices, soup.valid, depth, camera, flow, threshold_mm
        )
    n_corr = jnp.sum(corr.astype(jnp.int32))

    # (C, _MAX_V, 4) contributions: count channel over all valid slots,
    # flow channels over corresponding slots (already corr-masked)
    contrib = jnp.concatenate(
        [
            soup.valid.astype(jnp.float32)[:, None],
            flow_at_vert,
        ],
        axis=-1,
    ).reshape(C, _MAX_V, 4)

    acc = _cube_corner_scatter(
        contrib, cid, edge_idx, cube_valid, vol.tsdf.shape
    )  # (4, n_vox)

    counts = acc[0]
    flow_sum = acc[1:4].T
    delta = flow_sum / jnp.maximum(counts, 1.0)[:, None]
    new_deform = vol.deform + delta.reshape(vol.deform.shape)
    return vol.replace(deform=new_deform), n_corr


@partial(
    jax.jit,
    static_argnames=(
        "max_cubes", "nk", "threshold_mm", "tpu_safe", "use_chunked",
        "chunk_major",
    ),
)
def _sf_step_pallas(
    vol: TSDFVolume,
    depth: jnp.ndarray,
    flow: jnp.ndarray,
    camera: Camera,
    *,
    max_cubes: int,
    nk: int,
    threshold_mm: float,
    tpu_safe: bool,
    use_chunked: bool = True,
    chunk_major: bool = True,
):
    """One fused SceneFusion frame: masked-layout surface extraction ->
    deformation-field update -> warped-volume Pallas integrate, all in
    ONE jit so the host never syncs mid-frame (the same fusion that took
    tracked KinectFusion from 83 to 36.6 ms/frame through the remote
    tunnel; ref loop: SceneFusion.cpp:84-185).

    Returns (volume, integrate-miss count, miss mask, correspondence
    count, extraction-overflow flag). A non-zero miss means some
    voxel's warp deviation fell outside the kernel's dual-band window;
    the caller hands the mask to ``warped_miss_topup`` (kernels/
    integrate.py), which fuses exactly those voxels — the full-volume
    lax fallback is needed only if misses exceed the top-up cap. A set
    overflow means the chunked compaction's active-chunk cap (or
    max_cubes itself) truncated the mesh; the caller re-runs the frame
    with ``use_chunked=False`` (exact-or-skip — no observation is ever
    silently lost).
    """
    from ..kernels.integrate import integrate_warped_pallas

    if tpu_safe:
        soup, (cid, edge_idx, cube_valid, edge_verts) = _extract_arrays(
            vol.tsdf,
            vol.voxel_size,
            vol.offset,
            max_cubes=max_cubes,
            max_vertices=1,  # unused by the masked layout
            layout="masked",
            tpu_safe=True,
            return_cube_slots=True,
            use_chunked=use_chunked,
            # round-5: the chunk-major compaction (cost bound by the
            # compacted stream, not the million-slot chunk space — same
            # ascending-cid contract, ~2x faster extraction)
            chunk_major=use_chunked and chunk_major,
            # round-5: per-EDGE correspondence gather (2x fewer image
            # lookups than per-slot; identical math)
            return_edge_verts=True,
        )
        vol, n_corr = update_deformation_cubes(
            vol, soup, cid, edge_idx, cube_valid, depth, camera, flow,
            threshold_mm, edge_verts=edge_verts,
        )
    else:
        soup = _extract_arrays(
            vol.tsdf,
            vol.voxel_size,
            vol.offset,
            max_cubes=max_cubes,
            max_vertices=1,  # unused by the masked layout
            layout="masked",
            tpu_safe=False,
        )
        vol, n_corr = update_deformation(
            vol, soup, depth, camera, flow, threshold_mm, tpu_safe=False
        )
    out, miss, mask = integrate_warped_pallas(
        vol, depth, camera, nk=nk, interpret=not tpu_safe,
        return_mask=True,
    )
    return out, miss, mask, n_corr, soup.overflowed


class SceneFusion:
    """Orchestrator wiring an RGBD device to a scene-flow provider.

    ref: SceneFusion.cpp:46-185 — observer-callback driven; per frame
    pair, update the warp field from scene flow and integrate.
    """

    def __init__(
        self,
        scene_flow_provider,
        device,
        config: SceneFusionConfig = SceneFusionConfig(),
        camera: Optional[Camera] = None,
        dump_every: int = 0,
        dump_dir: str = ".",
        mesh=None,
    ):
        self.config = config
        self.sfa = scene_flow_provider
        self.device = device
        self.camera = camera or Camera.default_depth_camera()
        self.volume = config.make_volume()
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.ops import shard_volume

            self.volume = shard_volume(self.volume, mesh)
        self.last_depth = None
        self.frame_index = 0
        self.dump_every = dump_every
        self.dump_dir = dump_dir
        self._fallback_warmed = False
        device.add_observer(self.process_frames)

    def process_frames(self, depth, colour=None):
        """Observer callback (ref: SceneFusion::process_frames :84-185)."""
        depth = jnp.asarray(depth)
        cfg = self.config
        if self.mesh is not None:
            # brick-parallel path: sharded deformation update + warped
            # integrate per brick (parallel/ops.py)
            from ..parallel.ops import integrate_sharded
            from ..parallel.ops import scenefusion_frame_sharded

            if self.last_depth is not None:
                _t, _r, flow = self.sfa.compute_scene_flow(depth, colour)
                self.volume, _n = scenefusion_frame_sharded(
                    self.volume,
                    jnp.asarray(depth, jnp.float32),
                    self.camera,
                    jnp.asarray(flow, jnp.float32),
                    self.mesh,
                    max_cubes_per_brick=cfg.max_cubes,
                    threshold_mm=cfg.threshold_mm,
                    nk=cfg.integrate_nk,
                )
            else:
                out, miss = integrate_sharded(
                    self.volume, depth, self.camera, self.mesh,
                    use_pallas=True, nk=cfg.integrate_nk,
                    return_miss=True,
                )
                if int(miss) > 0:
                    out = integrate_sharded(
                        self.volume, depth, self.camera, self.mesh
                    )
                self.volume = out
        elif self.last_depth is not None and cfg.use_pallas:
            _t, _r, flow = self.sfa.compute_scene_flow(depth, colour)
            tpu_safe = jax.default_backend() == "tpu"
            if cfg.prewarm_fallback and not self._fallback_warmed:
                # AOT lower+compile (no execution) of the overflow
                # fallback so a mid-run chunk-cap overflow swaps to an
                # already-compiled graph instead of stalling the loop.
                # Runs on a daemon thread: the compile is a remote HTTP
                # wait here, so the fusion loop proceeds while it
                # drains. The result lands in the persistent compile
                # cache (enable jax_compilation_cache_dir!), so the
                # mid-run overflow call pays tracing + a disk cache hit
                # instead of the full remote compile.
                self._fallback_warmed = True
                # both escalation rungs: chunked at the max_cubes
                # ceiling (cap-ladder overflow) and the unchunked exact
                # compaction (chunk-cap overflow)
                rungs = [
                    dict(use_chunked=True),
                    dict(use_chunked=False),
                ] if cfg.max_cubes_fast < cfg.max_cubes else [
                    dict(use_chunked=False),
                ]
                lowereds = [
                    _sf_step_pallas.lower(
                        self.volume,
                        jnp.asarray(depth, jnp.float32),
                        jnp.asarray(flow, jnp.float32),
                        self.camera,
                        max_cubes=cfg.max_cubes,
                        nk=cfg.integrate_nk,
                        threshold_mm=cfg.threshold_mm,
                        tpu_safe=tpu_safe,
                        **r,
                    )
                    for r in rungs
                ]
                import threading

                def _compile_all(ls=lowereds):
                    for low in ls:  # serial: one remote compile at a time
                        low.compile()

                threading.Thread(target=_compile_all, daemon=True).start()
            # Cap ladder (round 4): run at the fast cube cap first —
            # the compaction streams and the order-restoring sort scale
            # with the STATIC cap, not live cubes (100.6 -> 80.0 ms at
            # the 255^3 default) — escalating on overflow to the
            # max_cubes ceiling, then to the unchunked exact fallback.
            fast_cap = min(cfg.max_cubes_fast, cfg.max_cubes)
            vol, miss, mask, _n, overflow = _sf_step_pallas(
                self.volume,
                jnp.asarray(depth, jnp.float32),
                jnp.asarray(flow, jnp.float32),
                self.camera,
                max_cubes=fast_cap,
                nk=cfg.integrate_nk,
                threshold_mm=cfg.threshold_mm,
                tpu_safe=tpu_safe,
            )
            # ONE blocking D2H for both per-frame scalars — each read
            # through the remote tunnel costs a full round-trip, so the
            # miss/overflow pair must not sync twice
            miss_h, overflow_h = jax.device_get((miss, overflow))
            if bool(overflow_h) and fast_cap < cfg.max_cubes:
                vol, miss, mask, _n, overflow = _sf_step_pallas(
                    self.volume,
                    jnp.asarray(depth, jnp.float32),
                    jnp.asarray(flow, jnp.float32),
                    self.camera,
                    max_cubes=cfg.max_cubes,
                    nk=cfg.integrate_nk,
                    threshold_mm=cfg.threshold_mm,
                    tpu_safe=tpu_safe,
                )
                miss_h, overflow_h = jax.device_get((miss, overflow))
            if tpu_safe and bool(overflow_h):
                # The chunked compaction's active-chunk cap truncated
                # the mesh: redo the frame through the full-volume sort
                # compaction (slower, but its only cap is max_cubes).
                vol, miss, mask, _n, overflow = _sf_step_pallas(
                    self.volume,
                    jnp.asarray(depth, jnp.float32),
                    jnp.asarray(flow, jnp.float32),
                    self.camera,
                    max_cubes=cfg.max_cubes,
                    nk=cfg.integrate_nk,
                    threshold_mm=cfg.threshold_mm,
                    tpu_safe=tpu_safe,
                    use_chunked=False,
                )
                miss_h, overflow_h = jax.device_get((miss, overflow))
            if bool(overflow_h):
                import warnings

                warnings.warn(
                    f"SceneFusion frame {self.frame_index}: occupied "
                    f"cubes exceed max_cubes={cfg.max_cubes}; mesh (and "
                    "the deformation update) truncated — raise "
                    "SceneFusionConfig.max_cubes",
                    stacklevel=2,
                )
            if int(miss_h) == 0:
                self.volume = vol
            else:
                # fuse exactly the skipped voxels through the sorted
                # matmul gather/scatter top-up — no full-volume lax
                # fallback unless misses exceed the top-up cap
                from ..kernels.integrate import warped_miss_topup

                vol2, remaining = warped_miss_topup(
                    vol, mask, jnp.asarray(depth, jnp.float32),
                    self.camera,
                )
                if int(remaining) == 0:
                    self.volume = vol2
                else:
                    # truly pathological frame: redo through the lax
                    # path on the post-deformation volume (deform is
                    # untouched by the integrate, so it can be lifted
                    # off the step output)
                    self.volume = integrate(
                        self.volume.replace(deform=vol.deform),
                        depth,
                        self.camera,
                    )
        elif self.last_depth is not None:
            _t, _r, flow = self.sfa.compute_scene_flow(depth, colour)
            soup = extract_surface(
                self.volume,
                max_cubes=cfg.max_cubes,
                max_vertices=cfg.max_vertices,
            )
            self.volume, _n = update_deformation(
                self.volume,
                soup,
                depth,
                self.camera,
                jnp.asarray(flow),
                cfg.threshold_mm,
            )
            self.volume = self._integrate(depth)
        else:
            self.volume = self._integrate(depth)
        self.last_depth = depth
        if self.dump_every and self.frame_index % self.dump_every == 0:
            self.dump(self.frame_index)
        self.frame_index += 1

    def _integrate(self, depth: jnp.ndarray) -> TSDFVolume:
        """Deformed-volume integrate: warped Pallas kernel with lax
        fallback when the exact-or-skip miss counter fires (accumulated
        warps can exceed the kernel's horizontal pixel budget)."""
        cfg = self.config
        if cfg.use_pallas:
            from ..kernels.integrate import (
                integrate_warped_pallas,
                warped_miss_topup,
            )

            interpret = jax.default_backend() != "tpu"
            out, miss, mask = integrate_warped_pallas(
                self.volume, depth, self.camera,
                nk=cfg.integrate_nk, interpret=interpret,
                return_mask=True,
            )
            if int(miss) == 0:
                return out
            out2, remaining = warped_miss_topup(
                out, mask, jnp.asarray(depth, jnp.float32), self.camera
            )
            if int(remaining) == 0:
                return out2
        return integrate(self.volume, depth, self.camera)

    def dump(self, index: int) -> None:
        """Periodic checkpoint + canonical and warped meshes
        (ref: SceneFusion.cpp:142-181)."""
        import os

        import numpy as np

        from ..io.ply import write_ply
        from ..io.tsdf_file import save_tsdf
        from ..ops.deform import deform_points
        from ..ops.marching_cubes import soup_to_numpy

        os.makedirs(self.dump_dir, exist_ok=True)
        save_tsdf(
            self.volume,
            os.path.join(self.dump_dir, f"frame_{index:03d}.tsdf"),
        )
        soup = self.extract_mesh()
        verts, tris = soup_to_numpy(soup)
        write_ply(
            os.path.join(self.dump_dir, f"mesh_canonical_{index:03d}.ply"),
            verts,
            tris,
        )
        warped, _valid = deform_points(self.volume, jnp.asarray(verts))
        write_ply(
            os.path.join(self.dump_dir, f"mesh_warped_{index:03d}.ply"),
            np.asarray(warped),
            tris,
        )

    def extract_mesh(self) -> TriangleSoup:
        return extract_surface(
            self.volume,
            max_cubes=self.config.max_cubes,
            max_vertices=self.config.max_vertices,
        )
