"""KinectFusion pipelines: GT-pose fusion and tracked fusion.

ref: src/Tools/kinfu.cpp:150-222 (GT-pose fuse + render + mesh) and the
full KinectFusion loop (bilateral -> ICP against raycast model ->
integrate) that the reference ships components for (BilateralFilter,
ICP_CUDA, TSDFVolume) but never wires together (SURVEY.md §2.8 note on
the unused filter; BASELINE config 3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..ops.bilateral import bilateral_filter
from ..ops.integrate import integrate
from ..ops.raycast import render_to_depth_image
from ..tracking.icp import get_incremental_transformation
from ..volume import TSDFVolume, make_volume


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """The reference's scattered compile-time constants, in one place
    (SURVEY.md §5 'Config / flag system: no framework')."""

    volume_size: tuple[int, int, int] = (200, 200, 200)  # ref: kinfu.cpp:23
    physical_size_mm: float = 3000.0
    offset_mm: Optional[tuple[float, float, float]] = None
    cap_weight: bool = False
    use_bilateral_filter: bool = False  # ref default: compiled, unused
    sigma_colour: float = 20.0
    sigma_space: float = 3.0
    width: int = 640
    height: int = 480
    use_pallas: bool = False  # Pallas kernels (TPU); lax path otherwise
    icp_band: int = 32  # banded ICP lookup when use_pallas (0 = exact)
    # Pallas integrate pixel-selection mode (kernels/integrate.py):
    # "line" (default) samples the column's exact image line at the
    # rounded row — nk=1 speed for ANY upright-ish pose, zero misses,
    # differing from reference rounding by <= 1 px only at f32
    # half-pixel slivers; "exact" reproduces the reference's
    # round(project(voxel)) bit-for-bit via nk candidate matching.
    integrate_mode: str = "line"
    # Candidate columns for mode="exact". 3 covers camera roll
    # (|beta| <= 1) and the ~0.2% of f32 rounding slivers; the miss
    # counters are checked after the run either way — never silently
    # wrong, skipped voxels just lose that frame's observation.
    integrate_nk: int = 3
    # Banded ICP drops correspondences displaced vertically by more than
    # icp_band pixels (fast motion). If the final inlier count falls
    # below this fraction of the image, the frame is re-tracked with the
    # exact full-image association before accepting the pose.
    icp_min_inliers_frac: float = 0.02
    # ICP convergence early-exit: stop a pyramid level once the SE3
    # update magnitude |v|_mm + 1000*|w|_rad falls below this. 0.0 (the
    # default) runs the reference's full 10/5/4 schedule
    # (ref: ICPOdometry.cpp:99-134); ~0.01 keeps sub-0.01 mm tracking
    # while skipping the identity tail iterations on slow motion.
    icp_conv_eps: float = 0.0
    # GT-pose fusion: lax.scan this many frames per dispatch. Through
    # the remote tunnel each dispatch costs ~1 ms and un-pipelined
    # per-frame dispatches were measured at 30 ms/frame for a 3.7 ms
    # integrate (config-2 probe); a 16-frame scan is one dispatch.
    fuse_chunk: int = 16
    # Tracked fusion: scan this many tracked frames per dispatch
    # (use_pallas only; 1 = one dispatch per frame). Chunk tails are
    # padded with zero-depth frames, which the lost-tracking gate makes
    # exact no-ops; per-frame stats are still returned per frame.
    # Default 1: through the remote tunnel the per-frame dispatches
    # already pipeline (12.8 ms/frame vs 14.9 for an 11-frame scan at
    # 256^3, tools/probe_tracked_chunk.py) — the scan carries a small
    # loop overhead and buys nothing unless dispatch latency is the
    # bottleneck (it is not here; it may be on a setup where the host
    # enqueue thread saturates).
    track_chunk: int = 1

    def make_volume(self) -> TSDFVolume:
        return make_volume(
            self.volume_size, self.physical_size_mm, offset=self.offset_mm
        )


def _integrate(vol, depth, camera, config: FusionConfig, miss_log=None,
               rgb=None):
    if config.use_pallas and vol.deform is None:
        if rgb is not None:
            from ..kernels.integrate import integrate_color_pallas

            vol, miss = integrate_color_pallas(
                vol, depth, rgb, camera,
                cap_weight=config.cap_weight, nk=config.integrate_nk,
                mode=config.integrate_mode,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            from ..kernels.integrate import integrate_pallas

            vol, miss = integrate_pallas(
                vol, depth, camera,
                cap_weight=config.cap_weight, nk=config.integrate_nk,
                mode=config.integrate_mode,
                interpret=jax.default_backend() != "tpu",
            )
        if miss_log is not None:
            miss_log.append(miss)  # left on device; sync'd by the caller
        return vol
    return integrate(
        vol, depth, camera, cap_weight=config.cap_weight, rgb=rgb
    )


@partial(jax.jit, static_argnames=("config",))
def _fuse_chunk_pallas(
    vol: TSDFVolume,
    camera: Camera,
    depths: jnp.ndarray,  # (N, H, W) f32 mm
    poses: jnp.ndarray,  # (N, 4, 4) camera->world
    reals: jnp.ndarray,  # (N,) 1.0 for real frames, 0.0 for tail padding
    *,
    config: FusionConfig,
):
    """Scan-fuse a chunk of GT-pose frames in ONE dispatch.

    The per-frame loop costs one host->device dispatch per frame; the
    scan compiles the Pallas integrate once and runs the whole chunk
    device-side. Returns (volume, summed miss counter). ``reals`` masks
    the miss counters of zero-depth tail-pad frames: a pad frame never
    updates a voxel (depth_val > 0 gate) but its miss counter is
    geometry-only and would re-count the padded pose's misses.
    """
    from ..kernels.integrate import integrate_pallas

    interpret = jax.default_backend() != "tpu"

    def body(vol, inp):
        depth, pose, real = inp
        if config.use_bilateral_filter:
            depth = bilateral_filter(
                depth, config.sigma_colour, config.sigma_space
            )
        out, miss = integrate_pallas(
            vol, depth, camera.set_pose(pose),
            cap_weight=config.cap_weight, nk=config.integrate_nk,
            mode=config.integrate_mode, interpret=interpret,
        )
        return out, miss * real.astype(miss.dtype)

    vol, misses = jax.lax.scan(body, vol, (depths, poses, reals))
    return vol, jnp.sum(misses)


def fuse_frames(
    vol: TSDFVolume,
    camera: Camera,
    frames: Iterable[tuple[jnp.ndarray, jnp.ndarray]],
    config: FusionConfig = FusionConfig(),
) -> tuple[TSDFVolume, Camera]:
    """Fuse (depth, pose) frames with ground-truth poses.

    ref: kinfu.cpp:33-56 — the reference uses TUM ground-truth poses,
    no tracking. With ``use_bilateral_filter`` the fused depth is
    pre-smoothed (opt-in denoising for raw sensor data; the tracked
    pipeline instead filters only the tracker's input and always fuses
    raw depth).

    Args:
      frames: iterable of (depth (H, W) mm, pose (4, 4) camera->world).

    Returns (volume, camera-at-last-pose).
    """
    miss_log: list = []
    if config.use_pallas and vol.deform is None and config.fuse_chunk > 1:
        # chunked device-side scan (see _fuse_chunk_pallas); streaming
        # semantics preserved — at most fuse_chunk frames are resident
        buf_d: list = []
        buf_p: list = []
        last_pose = None

        def flush():
            nonlocal vol
            if not buf_d:
                return
            # pad the tail to the full chunk with zero-depth frames (a
            # zero depth never passes the depth_val > 0 gate, so padding
            # is an exact no-op — miss counters are masked per frame) —
            # ONE compiled scan shape for any N
            n_real = len(buf_d)
            while len(buf_d) < config.fuse_chunk:
                buf_d.append(jnp.zeros_like(jnp.asarray(buf_d[0])))
                buf_p.append(buf_p[-1])
            depths = jnp.stack(
                [jnp.asarray(d, jnp.float32) for d in buf_d]
            )
            poses = jnp.stack(
                [jnp.asarray(p, jnp.float32) for p in buf_p]
            )
            reals = (
                jnp.arange(config.fuse_chunk) < n_real
            ).astype(jnp.float32)
            vol, miss = _fuse_chunk_pallas(
                vol, camera, depths, poses, reals, config=config
            )
            miss_log.append(miss)
            buf_d.clear()
            buf_p.clear()

        for depth, pose in frames:
            buf_d.append(depth)
            buf_p.append(pose)
            last_pose = pose
            if len(buf_d) == config.fuse_chunk:
                flush()
        flush()
        if last_pose is not None:
            camera = camera.set_pose(last_pose)
        _check_misses(miss_log, config)
        return vol, camera

    for depth, pose in frames:
        camera = camera.set_pose(pose)
        if config.use_bilateral_filter:
            depth = bilateral_filter(
                depth, config.sigma_colour, config.sigma_space
            )
        vol = _integrate(vol, depth, camera, config, miss_log)
    _check_misses(miss_log, config)
    return vol, camera


def _check_misses(miss_log, config: FusionConfig) -> None:
    """One deferred sync over the run's miss counters (exact-or-skip):
    nonzero means some voxels lost observations under integrate_nk and
    the run should use a larger candidate count."""
    if not miss_log:
        return
    # ONE device-side reduction + ONE scalar read: per-entry int(m)
    # reads are sequential D2H round trips (~25 ms each through the
    # remote tunnel) and were measured DOMINATING the tracked loop
    # (~20 ms/frame of a 33 ms frame — tools/probe_tracked_ablate.py)
    total = int(jnp.sum(jnp.stack([jnp.asarray(m) for m in miss_log])))
    if total:
        import warnings

        if config.integrate_mode in ("line", "fast"):
            remedy = (
                "FusionConfig(integrate_mode='exact', integrate_nk=5), "
                "or use_pallas=False (ops.integrate) — line/fast modes "
                "skip columns steeper than |beta| = 1 (extreme camera "
                "roll)"
            )
        elif config.integrate_nk < 3:
            remedy = "FusionConfig(integrate_nk=3)"
        else:
            remedy = (
                "FusionConfig(integrate_nk=5), or use_pallas=False "
                "(ops.integrate) for extreme camera roll"
            )
        # line/fast modes always run nk=1 (integrate_pallas overrides it)
        eff_nk = (
            1 if config.integrate_mode in ("line", "fast")
            else config.integrate_nk
        )
        warnings.warn(
            f"{total} voxel observations skipped by the line-warp "
            f"integrate (mode={config.integrate_mode}, nk={eff_nk}); "
            f"re-run with {remedy}."
        )


def track_and_fuse_frames(
    vol: TSDFVolume,
    camera: Camera,
    frames: Iterable[jnp.ndarray],
    config: FusionConfig = FusionConfig(),
):
    """Full KinectFusion: bilateral -> ICP vs raycast model -> integrate.

    The first frame is integrated at the camera's current pose; each
    later frame is tracked against a model render from the previous
    pose (frame-to-model tracking).

    Args:
      frames: iterable of depth images (H, W) mm, or of (depth, rgb)
        pairs — rgb (H, W, 3) u8 frames fuse per-voxel colour into a
        with_color volume (tracked colour reconstruction; the tracker
        itself stays depth-only).

    Returns:
      (volume, camera at final pose, list of (4,4) per-frame poses,
       list of (error_mm, inliers) tracking stats).
    """
    if config.use_pallas and vol.deform is not None:
        # fail fast: _tracked_step_pallas routes through the rigid
        # integrate kernel, which rejects deformed volumes mid-loop (and
        # _integrate would silently fall back to lax for frame 0 only).
        # Non-rigid fusion is pipelines/scenefusion.py.
        raise ValueError(
            "track_and_fuse_frames(use_pallas=True) does not support "
            "deformation-enabled volumes; use use_pallas=False or the "
            "SceneFusion pipeline for non-rigid fusion"
        )
    if config.track_chunk > 1 and not config.use_pallas:
        # fail fast: the chunked scan body is the Pallas tracked step;
        # silently falling back to per-frame dispatches would hide the
        # requested batching with no signal.
        raise ValueError(
            "FusionConfig(track_chunk>1) requires use_pallas=True; the "
            "lax path dispatches per frame"
        )
    k = camera.k
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]

    poses = []
    stats = []
    miss_log: list = []

    if config.use_pallas and config.track_chunk > 1:
        # chunked device-side scan (_tracked_chunk_pallas): one dispatch
        # per track_chunk frames instead of per frame; at most one chunk
        # of frames is host-resident (streaming preserved)
        band = config.icp_band if config.icp_band > 0 else None
        buf_d: list = []
        buf_r: list = []
        has_rgb: bool | None = None

        def flush():
            nonlocal vol, camera
            if not buf_d:
                return
            n_real = len(buf_d)
            # pad the tail to the full chunk with zero-depth frames
            # (exact no-ops under the lost-tracking gate) so only ONE
            # scan shape ever compiles
            while len(buf_d) < config.track_chunk:
                buf_d.append(jnp.zeros_like(buf_d[0]))
                if has_rgb:
                    buf_r.append(jnp.zeros_like(buf_r[0]))
            depths = jnp.stack(buf_d)
            rgbs = jnp.stack(buf_r) if has_rgb else None
            vol, camera, cposes, errs, inls, misses = (
                _tracked_chunk_pallas(
                    vol, camera, depths, rgbs, config=config, band=band
                )
            )
            for i in range(n_real):
                poses.append(cposes[i])
                stats.append((errs[i], inls[i]))
                miss_log.append(misses[i])
            buf_d.clear()
            buf_r.clear()

        first = True
        for frame in frames:
            if isinstance(frame, tuple):
                depth, rgb = frame
                rgb = None if rgb is None else jnp.asarray(rgb)
            else:
                depth, rgb = frame, None
            depth = jnp.asarray(depth, jnp.float32)
            if first:
                stats.append((jnp.array(0.0), jnp.array(0.0)))
                first = False
                vol = _integrate(
                    vol, depth, camera, config, miss_log, rgb=rgb
                )
                poses.append(camera.pose)
                has_rgb = rgb is not None
                continue
            if (rgb is not None) != has_rgb:
                raise ValueError(
                    "track_and_fuse_frames(track_chunk>1) needs a "
                    "consistent rgb presence across frames"
                )
            buf_d.append(depth)
            if has_rgb:
                buf_r.append(rgb)
            if len(buf_d) == config.track_chunk:
                flush()
        flush()
        _check_misses(miss_log, config)
        return vol, camera, poses, stats

    first = True
    for frame in frames:
        if isinstance(frame, tuple):
            depth, rgb = frame
            rgb = None if rgb is None else jnp.asarray(rgb)
        else:
            depth, rgb = frame, None
        depth = jnp.asarray(depth, jnp.float32)
        if first:
            # raw depth is fused; the filter only feeds the tracker
            # (see _tracked_step_pallas)
            stats.append((jnp.array(0.0), jnp.array(0.0)))
            first = False
            vol = _integrate(vol, depth, camera, config, miss_log, rgb=rgb)
            poses.append(camera.pose)
            continue

        if config.use_pallas:
            # whole per-frame step (bilateral -> render -> ICP ->
            # banded-fallback -> pose -> integrate) in ONE jit with NO
            # host sync: the host loop enqueues frames asynchronously and
            # the tunnel's ~25 ms round-trip latency is pipelined away
            # (a per-frame host read of the inlier count was measured at
            # +27 ms/frame through the remote tunnel)
            band = config.icp_band if config.icp_band > 0 else None
            vol, camera, err, inl, miss = _tracked_step_pallas(
                vol, camera, depth, rgb, config=config, band=band,
            )
            miss_log.append(miss)
            stats.append((err, inl))
            poses.append(camera.pose)
            continue

        if config.use_bilateral_filter:
            depth_icp = bilateral_filter(
                depth, config.sigma_colour, config.sigma_space
            )
        else:
            depth_icp = depth
        model_depth = render_to_depth_image(
            vol, camera, width=config.width, height=config.height
        )
        res = get_incremental_transformation(
            depth_icp, model_depth, fx, fy, cx, cy, band=None,
            conv_eps=config.icp_conv_eps,
        )
        # res.pose maps current-cam -> previous-cam coords;
        # new camera->world = prev pose o T_prev_curr
        camera = camera.set_pose(camera.pose @ res.pose)
        stats.append((res.error, res.inliers))
        vol = _integrate(vol, depth, camera, config, miss_log, rgb=rgb)
        poses.append(camera.pose)
    _check_misses(miss_log, config)
    return vol, camera, poses, stats


def _tracked_step_body(
    vol: TSDFVolume,
    camera: Camera,
    depth: jnp.ndarray,
    rgb: jnp.ndarray | None,
    config: FusionConfig,
    band: int | None,
):
    """One fused tracked-fusion frame (Pallas path): bilateral ->
    model render -> ICP (banded, with on-device exact fallback) ->
    pose update -> integrate. Traced either as its own jit
    (_tracked_step_pallas, one dispatch per frame) or as the body of
    the chunked scan (_tracked_chunk_pallas, one dispatch per chunk —
    per-frame dispatch latency through the remote tunnel is ~2x the
    frame's actual compute, the same economics as _fuse_chunk_pallas).

    The banded lookup drops correspondences displaced vertically by
    more than ``band`` pixels (fast motion; r1 verdict weak 5). If its
    inlier count falls below ``config.icp_min_inliers_frac`` of the
    image, a lax.cond re-runs the exact full-image association — on
    device, so the host never reads a scalar mid-loop (a per-frame
    host read serializes the async dispatch pipeline and was measured
    at +27 ms/frame through the remote tunnel). The integrate is then
    gated on the final inlier count: a frame whose tracking is lost
    even under exact association is not fused. A zero depth frame is
    an exact no-op under these gates (0 inliers -> lost -> identity
    pose, no fusion), which is what makes chunk tail-padding safe.
    """
    from ..kernels.integrate import integrate_pallas
    from ..kernels.raycast import raycast_pallas

    interpret = jax.default_backend() != "tpu"
    k = camera.k
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    min_inl = (
        config.icp_min_inliers_frac * config.width * config.height
    )

    # Classic KinectFusion composition: the bilateral-smoothed depth
    # feeds the TRACKER only; the raw depth is fused. Fusing the
    # filtered frame bakes smoothing bias into the model the next frame
    # tracks against, and the TSDF's weighted average is itself the
    # noise filter. The Pallas stencil is bit-equal to ops.bilateral
    # and keeps the whole (2r+1)^2 tap loop in VMEM (one HBM pass).
    if config.use_bilateral_filter:
        from ..kernels.bilateral import bilateral_filter_pallas

        depth_icp = bilateral_filter_pallas(
            depth, config.sigma_colour, config.sigma_space,
            interpret=interpret,
        )
    else:
        depth_icp = depth

    verts, _ = raycast_pallas(
        vol, camera, config.width, config.height, interpret=interpret
    )
    # camera-space z as (H, W) planes: a (N, 3) point-list matmul tiles
    # as 3-of-128 lanes on TPU (42x vreg waste); only row 2 of pose_inv
    # is needed anyway
    pi = camera.pose_inv
    wx = jnp.where(jnp.isfinite(verts[..., 0]), verts[..., 0], 0.0)
    wy = jnp.where(jnp.isfinite(verts[..., 1]), verts[..., 1], 0.0)
    wz = jnp.where(jnp.isfinite(verts[..., 2]), verts[..., 2], 0.0)
    camz = pi[2, 0] * wx + pi[2, 1] * wy + pi[2, 2] * wz + pi[2, 3]
    # NB: unlike camera.world_to_camera this skips the homogeneous
    # w-divide; pose_inv comes from jnp.linalg.inv so its bottom row is
    # only approximately [0,0,0,1] — using row 2 directly is the
    # (slightly more correct) intended math, not an oversight.
    model_depth = jnp.where(jnp.isfinite(verts).all(-1), camz, 0.0)

    res = get_incremental_transformation(
        depth_icp, model_depth, fx, fy, cx, cy, band=band,
        conv_eps=config.icp_conv_eps,
    )
    if band is not None:

        def exact(_):
            r = get_incremental_transformation(
                depth_icp, model_depth, fx, fy, cx, cy, band=None,
                conv_eps=config.icp_conv_eps,
            )
            return r.pose, r.error, r.inliers

        pose_inc, err, inl = jax.lax.cond(
            res.inliers < min_inl,
            exact,
            lambda _: (res.pose, res.error, res.inliers),
            None,
        )
    else:
        pose_inc, err, inl = res.pose, res.error, res.inliers
    # Tracking lost (too few inliers even under the final association):
    # keep the previous pose — applying the garbage increment would
    # corrupt every subsequent frame's frame-to-model tracking.
    lost = inl < min_inl
    # Select, don't multiply: on TPU `pose @ I` at default matmul
    # precision rounds through bf16 operands, so a lost (or padded
    # zero-depth) frame would perturb the carried pose by ~2^-9
    # relative — lost frames must be EXACTLY pose-preserving (this also
    # keeps chunk-tail padding an exact no-op on the chip).
    camera = camera.set_pose(
        jnp.where(lost, camera.pose, camera.pose @ pose_inc)
    )

    def fuse(vol):
        if rgb is not None:
            from ..kernels.integrate import integrate_color_pallas

            return integrate_color_pallas(
                vol, depth, rgb, camera,
                cap_weight=config.cap_weight, nk=config.integrate_nk,
                mode=config.integrate_mode, interpret=interpret,
            )
        out, miss = integrate_pallas(
            vol, depth, camera,
            cap_weight=config.cap_weight, nk=config.integrate_nk,
            mode=config.integrate_mode, interpret=interpret,
        )
        return out, miss

    # A lost frame must not be fused either (see docstring); the gate
    # applies to BOTH association paths (banded + exact fallback, or
    # exact-only when icp_band=0).
    vol, miss = jax.lax.cond(
        jnp.logical_not(lost),
        fuse,
        lambda v: (v, jnp.int32(0)),
        vol,
    )
    return vol, camera, err, inl, miss


@partial(
    jax.jit,
    static_argnames=("config", "band"),
)
def _tracked_step_pallas(
    vol: TSDFVolume,
    camera: Camera,
    depth: jnp.ndarray,
    rgb: jnp.ndarray | None = None,
    *,
    config: FusionConfig,
    band: int | None,
):
    """One tracked frame as its own dispatch (see _tracked_step_body)."""
    return _tracked_step_body(vol, camera, depth, rgb, config, band)


@partial(
    jax.jit,
    static_argnames=("config", "band"),
)
def _tracked_chunk_pallas(
    vol: TSDFVolume,
    camera: Camera,
    depths: jnp.ndarray,  # (K, H, W) f32 mm; zero frames = tail padding
    rgbs: jnp.ndarray | None = None,  # (K, H, W, 3) u8 or None
    *,
    config: FusionConfig,
    band: int | None,
):
    """Scan a chunk of tracked frames in ONE dispatch.

    The per-frame tracked loop costs one host->device dispatch per
    frame; through the remote tunnel that latency (~20 ms) is ~2x the
    frame's actual compute (~11 ms at 256^3 — tools/
    probe_tracked_parts.py). The scan runs the whole chunk device-side:
    same economics as _fuse_chunk_pallas, same single compiled shape
    (tails are padded with zero-depth frames, which the lost-tracking
    gate makes an exact no-op — no pose update, no fusion, zero miss).

    Returns (vol, camera, poses (K,4,4) camera->world after each frame,
    errs (K,), inls (K,), misses (K,)).
    """

    def body(carry, inp):
        vol, camera = carry
        if rgbs is None:
            depth, rgb = inp, None
        else:
            depth, rgb = inp
        vol, camera, err, inl, miss = _tracked_step_body(
            vol, camera, depth, rgb, config, band
        )
        return (vol, camera), (camera.pose, err, inl, miss)

    xs = depths if rgbs is None else (depths, rgbs)
    (vol, camera), (poses, errs, inls, misses) = jax.lax.scan(
        body, (vol, camera), xs
    )
    return vol, camera, poses, errs, inls, misses
