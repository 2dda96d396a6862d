#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: voxel-updates/s per chip for TSDF depth-frame integration at
512^3 with 640x480 frames (BASELINE.json metric), plus rays/s for the
sphere-traced raycast and pipeline frame times as auxiliary fields.

The reference publishes no performance numbers (SURVEY.md §6) and its
README calls itself unoptimized and not real-time; ``vs_baseline`` is
therefore measured against this repo's own first recorded numbers
(BENCH_BASELINE.json) as a COMPOSITE: the geometric mean of
per-section speedups, where a section that was skipped or failed
contributes ratio 1.0 (no-gain) so partial runs are visibly worse than
complete ones (round-3 verdict items 1 and 8). Skipped sections also
appear in ``aux.sections_skipped`` and emit ``aux[<key>] = null``.

Robustness history:
  * round 2: the driver run died rc=124 with NO json — a pathological
    Mosaic compile jammed past the driver timeout. -> watchdog thread
    that force-prints the JSON and hard-exits.
  * round 3: every aux section was SKIPPED — the FIRST DEVICE OP of the
    process stalled ~250-330 s (reproduced on a trivial ``jnp.sum``
    with a fully warm compile cache, so it is a remote
    claim/provisioning stall in the axon pool, not a compile and not
    this repo's code; it grew from ~30 s to ~5 min during round 3).
    -> the stall is now measured FIRST, attributed in
    ``aux.first_op_stall_s``, and the deadline is extended by it (the
    budget pays for measurement work, not for the environment), capped
    at BENCH_HARD_CAP_S to stay inside any plausible driver timeout.
Keep `.jax_cache` warm (run bench.py after any kernel change) so the
driver's run recompiles nothing.
"""

import json
import math
import os
import sys
import threading
import time

import numpy as np

# Wall-clock budget for measurement work (excludes the first-op stall,
# which is measured and added, see module docstring). The watchdog
# fires slightly after the effective deadline and force-prints the
# JSON; sections stop starting once less than their expected cost
# remains.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "360"))
# Absolute ceiling on the effective deadline (stall included). The
# round-3 driver run was healthy at ~345 s; round 2's died somewhere
# past ~600 s. 560 keeps a margin under the shortest plausible driver
# timeout while letting a ~300 s environment stall still yield a
# complete warm-cache run (~110 s of measurement work).
HARD_CAP_S = float(os.environ.get("BENCH_HARD_CAP_S", "560"))

_T0 = time.perf_counter()
_RESULT = {"aux": {}}
_PRINTED = threading.Event()
_DEADLINE = [DEADLINE_S]  # effective; extended after the stall probe

# Section registry: aux keys each section is expected to fill, with the
# direction and the first-recorded baseline used for the composite
# vs_baseline (values from BENCH_BASELINE.json "sections"; these are
# the fallbacks if that file predates the composite scheme).
SECTION_KEYS = {
    "integrate": [
        ("integrate_ms", "lower", 22.7),
        # first measured round 4 (opt-in decimated mode): 7.44 ms
        ("integrate_fast_ms", "lower", None),
    ],
    "raycast": [("raycast_ms", "lower", 28.7)],
    "kinfu": [("kinfu_tracked_ms_256", "lower", 58.6)],
    # round 5: scenefusion_ms_255 switched to the chained-frames
    # convention every other section uses (baseline re-recorded in the
    # same convention); the legacy per-step-sync number (which charged
    # each frame a ~28 ms tunnel round-trip) is kept alongside
    "scenefusion": [
        ("scenefusion_ms_255", "lower", 57.9),
        ("scenefusion_sync_ms_255", "lower", 210.6),
    ],
    # first measured round 4 (the dual-band warped kernel at the
    # headline grid; no earlier number exists — ratio starts at 1.0);
    # the nk=3 variant is the round-5 shipped default
    "scenefusion-512": [
        ("integrate_warped_ms_512", "lower", None),
        ("integrate_warped_nk3_ms_512", "lower", None),
    ],
    "pose-adjoint": [("integrate_pose_bwd_ms", "lower", 57.3)],
    "raycast-deep": [("raycast_deep_ms", "lower", 51.1)],
    "colour-integrate": [("integrate_color_ms", "lower", 24.6)],
    "bilateral": [("bilateral_ms", "lower", 3.1)],
}
_SKIPPED: list = []


def _elapsed():
    return time.perf_counter() - _T0


def _remaining():
    return _DEADLINE[0] - _elapsed()


def _baseline_sections():
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    head_value, sections = None, {}
    try:
        with open(path) as f:
            data = json.load(f)
        head_value = data.get("value")
        sections = data.get("sections", {})
    except Exception:
        pass
    return head_value, sections


def _composite_vs_baseline():
    """Geomean of per-section speedups vs the first recorded numbers.

    A section whose aux key is missing/None (skipped or failed)
    contributes 1.0, so a partial run scores strictly worse than the
    same run complete. Per-key ratios are exposed for attribution."""
    _, file_sections = _baseline_sections()
    ratios = {}
    for _name, keys in SECTION_KEYS.items():
        for key, direction, fallback in keys:
            base = file_sections.get(key, {}).get("value", fallback)
            cur = _RESULT["aux"].get(key)
            if cur is None or not base:
                ratios[key] = 1.0
                continue
            ratios[key] = base / cur if direction == "lower" else cur / base
    geo = math.exp(sum(math.log(max(r, 1e-9)) for r in ratios.values())
                   / len(ratios))
    return geo, ratios


def _emit():
    """Print the JSON line exactly once (normal path or watchdog)."""
    if _PRINTED.is_set():
        return
    _PRINTED.set()
    for _name, keys in SECTION_KEYS.items():
        for key, _d, _f in keys:
            _RESULT["aux"].setdefault(key, None)
    _RESULT["aux"]["sections_skipped"] = sorted(_SKIPPED)
    composite, ratios = _composite_vs_baseline()
    _RESULT["aux"]["vs_baseline_sections"] = {
        k: round(v, 4) for k, v in ratios.items()
    }
    out = {
        "metric": _RESULT.get(
            "metric", "voxel-updates/s per chip (integrate)"
        ),
        "value": _RESULT.get("value"),
        "unit": "voxel-updates/s",
        # composite across ALL sections (geomean; skipped = 1.0), per
        # round-3 verdict item 8 — the old integrate-only ratio is in
        # aux.vs_baseline_integrate for continuity
        "vs_baseline": round(composite, 4),
        "aux": _RESULT["aux"],
    }
    print(json.dumps(out), flush=True)


def _watchdog():
    while _elapsed() < _DEADLINE[0] + 10.0:
        if _PRINTED.is_set():
            return
        time.sleep(1.0)
    if not _PRINTED.is_set():
        _RESULT["aux"]["watchdog_fired_at_s"] = round(_elapsed(), 1)
        _note("WATCHDOG: deadline hit, emitting JSON and exiting")
        _emit()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


def _sync(out):
    """Force real completion: block_until_ready does not reliably block
    through remote-execution tunnels, so reduce one leaf to a host float."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _note(msg):
    print(f"[bench +{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def _relay_reachable() -> bool:
    """The axon TPU backend here tunnels through a local relay; if the
    relay process is down, the first device op hangs indefinitely.
    Probe its port so bench degrades to a fast CPU run (with a marker in
    the JSON) instead of hanging the driver."""
    import socket

    for port in (8083, 8082):
        try:
            s = socket.socket()
            s.settimeout(4)
            s.connect(("127.0.0.1", port))
            s.close()
            return True
        except OSError:
            continue
    return False


def _main_cpu_fallback():
    """Relay-down degraded run: time the lax integrate at 64^3 on CPU so
    the driver records a JSON line (marked tpu_unreachable) instead of
    hanging on the first device op. The Pallas kernels only lower on
    TPU (interpret mode is orders slower), so this times the semantics
    path; the value is NOT comparable to chip numbers."""
    import jax
    import jax.numpy as jnp

    from tsdf_tpu import Camera, make_volume
    from tsdf_tpu.ops.integrate import integrate
    from tsdf_tpu.utils import fixtures

    grid = 64
    width, height = 640, 480
    vol = make_volume(
        (grid,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)
    )
    camera = (
        Camera.default_depth_camera()
        .move_to([300.0, -200.0, -500.0])
        .look_at([50.0, 80.0, 1500.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(width, height, 150.0, 1000.0, 2500.0)
    )

    def f(v):
        return integrate(v, depth, camera)

    dt = _bench(f, vol, iters=3, warmup=1)
    _RESULT["metric"] = (
        f"voxel-updates/s per chip (integrate, {grid}^3, 640x480)"
    )
    _RESULT["value"] = grid**3 / dt
    _RESULT["aux"].update(
        {
            "integrate_ms": dt * 1e3,
            "grid": grid,
            "device": str(jax.devices()[0]),
            "tpu_unreachable": True,
        }
    )
    _emit()


def main():
    import jax

    threading.Thread(target=_watchdog, daemon=True).start()

    if os.environ.get("PALLAS_AXON_POOL_IPS") and not _relay_reachable():
        _note("axon relay unreachable: falling back to CPU at a tiny grid")
        jax.config.update("jax_platforms", "cpu")
        return _main_cpu_fallback()

    # Compiles route through a remote service here and can take minutes
    # cold; the persistent cache makes bench reruns cheap. Anchor it to
    # this file so the cache is shared regardless of the caller's cwd.
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from tsdf_tpu import Camera, make_volume
    from tsdf_tpu.kernels import integrate_pallas
    from tsdf_tpu.kernels.raycast import raycast_pallas
    from tsdf_tpu.utils import fixtures

    # ---- First-op stall probe (round-3 post-mortem): the axon pool's
    # claim/provision of the chip stalls the process's FIRST device op
    # for up to ~5 minutes, independent of this repo's code (reproduced
    # on this trivial op with a warm cache). Measure it, report it,
    # and extend the measurement budget by it so one environment stall
    # cannot erase every section.
    _note("first-op stall probe (axon claim)")
    t0 = time.perf_counter()
    _sync(jnp.ones((8, 128)) * 2.0)
    stall = time.perf_counter() - t0
    _RESULT["aux"]["first_op_stall_s"] = round(stall, 1)
    _DEADLINE[0] = min(DEADLINE_S + stall, HARD_CAP_S)
    _note(
        f"first op synced in {stall:.1f}s; effective deadline "
        f"{_DEADLINE[0]:.0f}s"
    )

    grid = int(os.environ.get("BENCH_GRID", "512"))
    width, height = 640, 480

    vol = make_volume(
        (grid, grid, grid), 3000.0, offset=(-1500.0, -1500.0, 0.0)
    )
    # GENERIC off-axis pose — the shipped default configuration, not the
    # axis-aligned best case (round-1 verdict: bench the default).
    camera = (
        Camera.default_depth_camera()
        .move_to([300.0, -200.0, -500.0])
        .look_at([50.0, 80.0, 1500.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(width, height, 150.0, 1000.0, 2500.0)
    )

    # ---- HEADLINE: chained integrate (volume fed back) — the real
    # fusion-loop shape, in the pipeline-default "line" mode (nk=1 speed
    # for any upright-ish pose). The exact-or-skip miss counters are
    # collected asynchronously and verified ONCE after timing (a
    # per-frame readback would serialize on the device sync), so every
    # timed frame is proven loss-free.
    _note("integrate warmup/compile")
    iters = 10

    def _median_loops(mode, n_loops=3):
        # median of 3 x 10-frame chained loops (round-4 verdict item 5:
        # the integrate headline was effectively single-capture and the
        # tunnel adds multi-ms jitter; kinfu/SF already median)
        v, miss = integrate_pallas(vol, depth, camera, mode=mode)
        _sync(v.weight)
        misses = [miss]
        loop_ms = []
        for _ in range(n_loops):
            t0 = time.perf_counter()
            for _ in range(iters):
                v, miss = integrate_pallas(v, depth, camera, mode=mode)
                misses.append(miss)
            _sync(v.weight)
            loop_ms.append((time.perf_counter() - t0) / iters * 1e3)
        return float(np.median(loop_ms)), misses, loop_ms

    int_ms, misses, loops = _median_loops("line")
    dt_int = int_ms / 1e3
    assert float(jnp.sum(jnp.stack(misses))) == 0.0
    voxel_updates_per_s = grid**3 / dt_int
    _note(f"integrate done: {int_ms:.1f} ms (loops {loops})")

    # the opt-in decimated fast mode (lane-span compression, round 4):
    # measured alongside the exact-convention headline, never replacing
    # it (the convention is approximate by design)
    try:
        fast_ms, _m, loops_f = _median_loops("fast")
        _RESULT["aux"]["integrate_fast_ms"] = fast_ms
        _note(f"integrate fast done: {fast_ms:.1f} ms (loops {loops_f})")
    except Exception as e:
        _note(f"integrate fast failed: {type(e).__name__}: {e}")

    head_baseline, _ = _baseline_sections()

    _RESULT["metric"] = (
        f"voxel-updates/s per chip (integrate, {grid}^3, 640x480)"
    )
    _RESULT["value"] = voxel_updates_per_s
    _RESULT["aux"].update(
        {
            "integrate_ms": dt_int * 1e3,
            "vs_baseline_integrate": (
                round(voxel_updates_per_s / head_baseline, 4)
                if head_baseline else 1.0
            ),
            "grid": grid,
            "device": str(jax.devices()[0]),
            "tpu_unreachable": False,
        }
    )

    # ---- Aux sections, most important first. Each checks the remaining
    # budget before starting; a hung remote compile is caught by the
    # watchdog, which prints whatever landed so far. Skips/failures are
    # recorded so a partial run is visible in the JSON (null aux keys +
    # sections_skipped + composite vs_baseline counting them as 1.0).
    def section(name, min_budget_s):
        if _remaining() < min_budget_s:
            _note(f"SKIP {name}: {_remaining():.0f}s left < {min_budget_s}s")
            _SKIPPED.append(name)
            return False
        return True

    def failed(name, e):
        _note(f"{name} failed: {type(e).__name__}: {e}")
        _SKIPPED.append(f"{name} (failed)")

    # Raycast a fused sphere volume (sphere mode, the production path).
    if section("raycast", 45):
        try:
            vol2 = fixtures.sphere_tsdf(
                make_volume(
                    (grid, grid, grid), 3000.0,
                    offset=(-1500.0, -1500.0, 0.0),
                ),
                600.0,
            )
            cam2 = (
                Camera.default_depth_camera()
                .move_to([0.0, 0.0, -900.0])
                .look_at([0.0, 0.0, 1500.0])
            )

            def ray_fn(v, c):
                verts, normals = raycast_pallas(
                    v, c, width=width, height=height
                )
                return verts

            _note("raycast warmup/compile")
            dt_ray = _bench(ray_fn, vol2, cam2)
            _RESULT["aux"]["raycast_ms"] = dt_ray * 1e3
            _RESULT["aux"]["rays_per_s"] = width * height / dt_ray
            _note(f"raycast done: {dt_ray*1e3:.1f} ms")
        except Exception as e:
            failed("raycast", e)

    # Full tracked KinectFusion loop (bilateral + banded ICP vs model
    # render + integrate) at 256^3 — the BASELINE config-3 shape.
    if section("kinfu", 100):
        try:
            from tsdf_tpu.pipelines import FusionConfig, track_and_fuse_frames

            scene = fixtures.sphere_tsdf(
                make_volume(
                    (256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)
                ),
                600.0,
            )
            wall = fixtures.wall_tsdf(scene, 2500.0)
            scene = scene.replace(
                tsdf=jnp.minimum(scene.tsdf, wall.tsdf),
                weight=jnp.ones_like(scene.weight),
            )
            n_kf = 12  # enough frames that the mean is stable (r1
            # verdict: driver-visible number must match the curated one)
            cams = [
                Camera.default_depth_camera()
                .move_to([30.0 * t, -20.0 * t, -500.0])
                .look_at([0.0, 0.0, 1500.0])
                for t in [i / (n_kf - 1.0) for i in range(n_kf)]
            ]

            def depth_of(c):
                verts, _ = raycast_pallas(scene, c, width, height)
                camz = c.world_to_camera(
                    jnp.where(jnp.isfinite(verts), verts, 0.0).reshape(-1, 3)
                ).reshape(height, width, 3)[..., 2]
                return jnp.where(
                    jnp.isfinite(verts).all(-1), camz, 0.0
                ).astype(jnp.float32)

            _note("kinfu frame generation")
            frames = [depth_of(c) for c in cams]
            _sync(frames[-1])
            _note("kinfu warmup")
            kvol = make_volume(
                (256,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)
            )
            cfg = FusionConfig(
                width=width, height=height, use_pallas=True,
                use_bilateral_filter=True,
            )
            v2, *_ = track_and_fuse_frames(kvol, cams[0], frames[:2], cfg)
            _sync(v2.weight)  # warm the compiles
            # median of 3 full-loop runs: the tunnel adds multi-ms jitter
            # per dispatch, so single-run numbers swung 2x in round 1
            _note("kinfu timed runs")
            per_frame = []
            for _ in range(3):
                t0 = time.perf_counter()
                vfin, *_ = track_and_fuse_frames(kvol, cams[0], frames, cfg)
                _sync(vfin.weight)
                per_frame.append(
                    (time.perf_counter() - t0) / len(frames) * 1e3
                )
            _RESULT["aux"]["kinfu_tracked_ms_256"] = float(
                np.median(per_frame)
            )
            _note(f"kinfu done: {per_frame}")

            # A/B: the ICP convergence early-exit (conv_eps) — slow
            # motion converges in a few Gauss-Newton iterations, the
            # rest of the 10/5/4 schedule is identity updates
            if section("kinfu-eps", 45):
                cfg_eps = FusionConfig(
                    width=width, height=height, use_pallas=True,
                    use_bilateral_filter=True, icp_conv_eps=0.02,
                )
                v2, *_ = track_and_fuse_frames(
                    kvol, cams[0], frames[:2], cfg_eps
                )
                _sync(v2.weight)
                per_frame_eps = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    vfin, *_ = track_and_fuse_frames(
                        kvol, cams[0], frames, cfg_eps
                    )
                    _sync(vfin.weight)
                    per_frame_eps.append(
                        (time.perf_counter() - t0) / len(frames) * 1e3
                    )
                _RESULT["aux"]["kinfu_tracked_eps_ms_256"] = float(
                    np.median(per_frame_eps)
                )
                _note(f"kinfu eps done: {per_frame_eps}")
        except Exception as e:
            failed("kinfu", e)



    # Differentiable-fusion backward: the analytic pose adjoint (three
    # tables through the shared line-warp lookup) at the headline grid.
    if section("pose-adjoint", 45):
        try:
            from tsdf_tpu.kernels.integrate import _pose_grad_pallas

            gbar = jnp.ones((grid, grid, grid), jnp.float32)
            gz = jnp.zeros((grid, grid, grid), jnp.float32)

            def pgrad_fn(v):
                dd, dw, dxi = _pose_grad_pallas(
                    v, depth, camera, gbar, gz,
                    nk=3, cap_weight=False, image_term=True,
                    interpret=False,
                )
                return dxi

            _note("pose-adjoint warmup/compile")
            dt_pgrad = _bench(pgrad_fn, vol)
            _RESULT["aux"]["integrate_pose_bwd_ms"] = dt_pgrad * 1e3
            _note(f"pose-adjoint done: {dt_pgrad*1e3:.1f} ms")
            del gbar, gz  # 1 GB of cotangent planes
        except Exception as e:
            failed("pose-adjoint", e)

    # Deep-scene raycast (config-1-like: far wall at z=2500, rays sweep
    # most of the volume): exercises the exact empty-brick skip.
    if section("raycast-deep", 40):
        try:
            wall2 = fixtures.wall_tsdf(vol2, 2500.0)
            deep = vol2.replace(
                tsdf=jnp.minimum(vol2.tsdf, wall2.tsdf),
                weight=jnp.ones_like(vol2.weight),
            )
            _note("raycast deep-scene warmup/compile")
            dt_deep = _bench(ray_fn, deep, cam2)
            _RESULT["aux"]["raycast_deep_ms"] = dt_deep * 1e3
            _note(f"raycast deep done: {dt_deep*1e3:.1f} ms")
        except Exception as e:
            failed("raycast-deep", e)

    # Colour integrate (depth + packed-RGB two-table kernel).
    if section("colour-integrate", 40):
        try:
            from tsdf_tpu.kernels.integrate import integrate_color_pallas

            volc = make_volume(
                (grid, grid, grid), 3000.0, offset=(-1500.0, -1500.0, 0.0),
                with_color=True,
            )
            ys = jnp.arange(height, dtype=jnp.uint8)[:, None]
            xs = jnp.arange(width, dtype=jnp.uint8)[None, :]
            rgb = jnp.stack(
                [
                    jnp.broadcast_to(ys, (height, width)),
                    jnp.broadcast_to(xs, (height, width)),
                    jnp.full((height, width), 128, jnp.uint8),
                ],
                axis=-1,
            )

            def cint_fn(v):
                out, _m = integrate_color_pallas(v, depth, rgb, camera)
                return out.weight

            _note("colour integrate warmup/compile")
            dt_cint = _bench(cint_fn, volc)
            _RESULT["aux"]["integrate_color_ms"] = dt_cint * 1e3
            _note(f"colour integrate done: {dt_cint*1e3:.1f} ms")
            del volc
        except Exception as e:
            failed("colour-integrate", e)

    # Bilateral pre-filter: lax stencil vs the VMEM-resident Pallas
    # kernel (bit-equal outputs; the kernel makes one HBM pass).
    if section("bilateral", 40):
        try:
            from tsdf_tpu.kernels.bilateral import bilateral_filter_pallas
            from tsdf_tpu.ops.bilateral import bilateral_filter

            _note("bilateral warmup/compile")
            dt_bilat = _bench(bilateral_filter_pallas, depth, iters=20)
            dt_bilat_lax = _bench(bilateral_filter, depth, iters=20)
            _RESULT["aux"]["bilateral_ms"] = dt_bilat * 1e3
            _RESULT["aux"]["bilateral_lax_ms"] = dt_bilat_lax * 1e3
            _note(
                f"bilateral done: pallas {dt_bilat*1e3:.2f} ms, "
                f"lax {dt_bilat_lax*1e3:.2f} ms"
            )
        except Exception as e:
            failed("bilateral", e)

    # The two SceneFusion sections run LAST: the fused step's
    # per-process warm-start alone is ~130 s (cache-hit executable
    # load, see BASELINE.md) — after a large first-op stall the cheap
    # sections above must not be starved behind it.
    # Non-rigid warped integrate at the HEADLINE grid (512^3): the
    # dual-band warped kernel + deform field at production scale
    # (round-3 verdict item 4 asked for a 512^3 non-rigid number).
    if section("scenefusion-512", 60):
        try:
            from tsdf_tpu.kernels.integrate import integrate_warped_pallas

            wvol = make_volume(
                (grid,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0),
                with_deformation=True,
            )
            # large uniform warp: the dual-band window's exact case
            wvol = wvol.replace(
                deform=wvol.deform
                + jnp.array([80.0, 0.0, 0.0], jnp.float32)
            )

            def warped_fn(v):
                out, miss, _mask = integrate_warped_pallas(
                    v, depth, camera, nk=5, return_mask=True
                )
                return out.weight

            _note("warped-integrate-512 warmup/compile")
            dt_warp = _bench(warped_fn, wvol, iters=5)
            _RESULT["aux"]["integrate_warped_ms_512"] = dt_warp * 1e3
            _note(f"warped integrate 512 done: {dt_warp*1e3:.1f} ms")

            # the round-5 shipped default (SceneFusionConfig.integrate_nk
            # = 3, no mask output): the nk=5+mask number above stays for
            # baseline continuity
            def warped_fn3(v):
                out, miss = integrate_warped_pallas(v, depth, camera, nk=3)
                return out.weight

            dt_warp3 = _bench(warped_fn3, wvol, iters=5)
            _RESULT["aux"]["integrate_warped_nk3_ms_512"] = dt_warp3 * 1e3
            _note(f"warped integrate 512 nk=3 done: {dt_warp3*1e3:.1f} ms")
            # free ~2.6 GB (tsdf+weight+deform at 512^3): later
            # sections each allocate their own 512^3 volumes and the
            # chip OOMs if every section's state stays alive
            del wvol
        except Exception as e:
            failed("scenefusion-512", e)

    # Fused non-rigid SceneFusion frame (masked-soup extract ->
    # matmul-scatter deformation update -> warped Pallas integrate, one
    # jit) at the reference's 255^3 default (SceneFusion.cpp:49).
    if section("scenefusion", 150):
        try:
            from tsdf_tpu.ops.raycast import render_to_depth_image
            from tsdf_tpu.pipelines.scenefusion import (
                SceneFusionConfig,
                _sf_step_pallas,
            )

            sf_cfg = SceneFusionConfig()
            sf_vol = fixtures.sphere_tsdf(
                sf_cfg.make_volume(), 500.0, centre=(0.0, 0.0, 1300.0)
            )
            sf_cam = (
                Camera.default_depth_camera()
                .move_to([0.0, 0.0, 100.0])
                .look_at([0.0, 0.0, 1300.0])
            )
            _note("scenefusion depth render")
            sf_depth = jnp.asarray(
                render_to_depth_image(
                    sf_vol, sf_cam, width=width, height=height
                ),
                jnp.float32,
            )
            sf_flow = jnp.broadcast_to(
                jnp.array([4.0, 0.0, 0.0], jnp.float32),
                (height, width, 3),
            )

            def sf_fn(v):
                # the pipeline's first-rung cap (see SceneFusionConfig
                # .max_cubes_fast): static-cap-bound streams make this
                # ~20% faster than the ceiling at the default scene
                out, _miss, _mask, _n, _ovf = _sf_step_pallas(
                    v, sf_depth, sf_flow, sf_cam,
                    max_cubes=min(sf_cfg.max_cubes_fast, sf_cfg.max_cubes),
                    nk=sf_cfg.integrate_nk,
                    threshold_mm=sf_cfg.threshold_mm,
                    tpu_safe=jax.default_backend() == "tpu",
                )
                return out

            _note("scenefusion warmup/compile")
            v3 = sf_fn(sf_vol)
            _sync(v3.tsdf)
            # chained frames, one sync per loop (round 5): the per-step
            # sync convention charged every frame a full ~25 ms tunnel
            # round-trip — pure remote-harness latency a local consumer
            # (and this same bench's integrate/kinfu sections) never
            # pays. The old per-step number is kept alongside.
            sf_loops = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(4):
                    v3 = sf_fn(v3)
                _sync(v3.tsdf)
                sf_loops.append((time.perf_counter() - t0) / 4)
            _RESULT["aux"]["scenefusion_ms_255"] = (
                float(np.median(sf_loops)) * 1e3
            )
            sf_times = []
            for _ in range(3):
                t0 = time.perf_counter()
                v3 = sf_fn(v3)
                _sync(v3.tsdf)
                sf_times.append(time.perf_counter() - t0)
            _RESULT["aux"]["scenefusion_sync_ms_255"] = (
                float(np.median(sf_times)) * 1e3
            )
            _note(
                f"scenefusion done: chained {np.median(sf_loops)*1e3:.1f}"
                f" ms, per-step-sync {np.median(sf_times)*1e3:.1f} ms"
            )
        except Exception as e:
            failed("scenefusion", e)

    _emit()


if __name__ == "__main__":
    main()
