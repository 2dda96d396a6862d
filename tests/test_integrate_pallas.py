"""Pallas integrate kernel (interpret mode) == lax reference path.

The kernel's exact-or-skip contract: every updated voxel gets exactly the
depth sample the reference math would fetch, and the miss counter is zero
for normal camera poses.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import Camera, integrate, make_volume
from tsdf_tpu.kernels import integrate_pallas
from tsdf_tpu.utils import fixtures


def _check(vol, cam, depth, nk=3):
    ref = integrate(vol, depth, cam)
    out, miss = integrate_pallas(vol, depth, cam, nk=nk, interpret=True)
    assert int(miss) == 0
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), atol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )


def test_matches_lax_forward_camera():
    vol = make_volume((64, 64, 64), 2000.0, offset=(-1000.0, -1000.0, 0.0))
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -500.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    depth = jnp.asarray(fixtures.sphere_depth_map(640, 480, 120.0, 800.0, 1600.0))
    _check(vol, cam, depth)


def test_matches_lax_offaxis_camera():
    vol = make_volume((64, 64, 64), 2000.0, offset=(-1000.0, -1000.0, 0.0))
    cam = (
        Camera.default_depth_camera()
        .move_to([400.0, -250.0, -600.0])
        .look_at([-100.0, 150.0, 1200.0])
    )
    depth = jnp.asarray(fixtures.sphere_depth_map(640, 480, 120.0, 800.0, 1600.0))
    _check(vol, cam, depth)


def test_matches_lax_nonaligned_grid():
    # 50^3: exercises X/Y padding to lane multiples
    vol = make_volume((50, 50, 50), 1500.0, offset=(-750.0, -750.0, 0.0))
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -400.0])
        .look_at([50.0, -30.0, 800.0])
    )
    depth = jnp.asarray(fixtures.sphere_depth_map(320, 200, 60.0, 500.0, 1200.0))
    _check(vol, cam, depth)


def test_accumulates_over_frames():
    vol = make_volume((32, 32, 32), 1000.0, offset=(-500.0, -500.0, 0.0))
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -300.0])
        .look_at([0.0, 0.0, 500.0])
    )
    depth = jnp.asarray(fixtures.sphere_depth_map(64, 48, 12.0, 400.0, 800.0))
    ref = vol
    out = vol
    for _ in range(3):
        ref = integrate(ref, depth, cam)
        out, miss = integrate_pallas(out, depth, cam, interpret=True)
        assert int(miss) == 0
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), atol=5e-3
    )


def test_rejects_deformed_volume():
    vol = make_volume(
        (16, 16, 16), 1000.0, offset=(0.0, 0.0, 0.0), with_deformation=True
    )
    cam = Camera.default_depth_camera()
    depth = jnp.zeros((48, 64), jnp.uint16)
    with pytest.raises(ValueError):
        integrate_pallas(vol, depth, cam, interpret=True)


def test_adaptive_escalation_on_rolled_camera():
    """A ~60-degree-rolled camera makes |beta| > 0.5: nk=1 must report
    misses and integrate_auto must escalate to an exact result."""
    import math

    from tsdf_tpu.kernels.integrate import integrate_auto

    vol = make_volume((32, 32, 32), 1500.0, offset=(-750.0, -750.0, 0.0))
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -400.0])
        .look_at([0.0, 0.0, 750.0])
    )
    a = math.radians(60.0)
    roll = jnp.array(
        [
            [math.cos(a), -math.sin(a), 0, 0],
            [math.sin(a), math.cos(a), 0, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        jnp.float32,
    )
    cam = cam.set_pose(cam.pose @ roll)
    depth = jnp.asarray(
        fixtures.sphere_depth_map(640, 480, 150.0, 500.0, 1200.0)
    )

    _, miss1 = integrate_pallas(vol, depth, cam, nk=1, interpret=True)
    assert int(miss1) > 0  # nk=1 genuinely insufficient here

    out, miss = integrate_auto(vol, depth, cam, interpret=True)
    assert int(miss) == 0
    ref = integrate(vol, depth, cam)
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), atol=5e-3
    )


def test_pallas_bf16_storage_matches_lax():
    import jax.numpy as jnp
    from tsdf_tpu import Camera, integrate, make_volume
    from tsdf_tpu.kernels.integrate import integrate_pallas
    from tsdf_tpu.utils import fixtures

    vol = make_volume(
        (32, 32, 32), 2000.0, offset=(-1000, -1000, 0)
    ).astype(jnp.bfloat16)
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -500.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    depth = fixtures.sphere_depth_map(64, 48, 20.0, 800.0, 1200.0)
    ref = integrate(vol, depth, cam)
    out, miss = integrate_pallas(vol, depth, cam, nk=3, interpret=True)
    assert int(miss) == 0
    assert out.tsdf.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out.weight, np.float32),
        np.asarray(ref.weight, np.float32),
    )
    np.testing.assert_allclose(
        np.asarray(out.tsdf, np.float32),
        np.asarray(ref.tsdf, np.float32),
        rtol=0, atol=1.0,
    )


def _warp_test_setup(dx_mm, dy_mm):
    import jax.numpy as jnp
    from tsdf_tpu import Camera, make_volume
    from tsdf_tpu.utils import fixtures

    vol = make_volume(
        (32, 32, 32), 2000.0, offset=(-1000, -1000, 0),
        with_deformation=True,
    )
    # smooth displacement field: sinusoidal in z, bounded by (dx, dy) mm
    z = jnp.arange(32, dtype=jnp.float32)[:, None, None, None]
    disp = jnp.concatenate(
        [
            dx_mm * jnp.sin(z / 5.0) * jnp.ones(vol.deform.shape[:-1])[..., None],
            dy_mm * jnp.cos(z / 7.0) * jnp.ones(vol.deform.shape[:-1])[..., None],
            jnp.zeros(vol.deform.shape[:-1])[..., None],
        ],
        axis=-1,
    )
    vol = vol.replace(deform=vol.deform + disp)
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -500.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    depth = fixtures.sphere_depth_map(64, 48, 20.0, 800.0, 1200.0)
    return vol, depth, cam


def test_warped_pallas_matches_lax():
    # x-warp 1.5mm stays under the nk=5 pixel budget (fx*dx/Zc <= 2px at
    # Zc >= 450mm); y-warp 30mm is large (unbounded budget) — zero
    # misses, bit-for-bit weight equality
    from tsdf_tpu import integrate
    from tsdf_tpu.kernels.integrate import integrate_warped_pallas

    vol, depth, cam = _warp_test_setup(1.5, 30.0)
    ref = integrate(vol, depth, cam)
    out, miss = integrate_warped_pallas(
        vol, depth, cam, nk=5, interpret=True
    )
    assert int(miss) == 0
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), rtol=0, atol=5e-3
    )


def test_warped_pallas_counts_misses_on_excess_x_warp():
    # The banded window absorbs any per-column CONSTANT x-warp, so the
    # skip case needs x-warp VARIATION within a voxel column: +-60mm
    # alternating with voxel y (~50px of within-column range) cannot
    # fit nk=3 — the kernel must skip-and-count, never fuse a wrong
    # depth value
    import jax.numpy as jnp

    from tsdf_tpu import integrate
    from tsdf_tpu.kernels.integrate import integrate_warped_pallas

    vol, depth, cam = _warp_test_setup(0.0, 0.0)
    y = jnp.arange(32, dtype=jnp.float32)[None, :, None]
    dx = 60.0 * jnp.where(y % 2 == 0, 1.0, -1.0)
    disp = jnp.stack(
        [
            jnp.broadcast_to(dx, vol.deform.shape[:-1]),
            jnp.zeros(vol.deform.shape[:-1]),
            jnp.zeros(vol.deform.shape[:-1]),
        ],
        axis=-1,
    )
    vol = vol.replace(deform=vol.deform + disp)
    ref = integrate(vol, depth, cam)
    out, miss = integrate_warped_pallas(
        vol, depth, cam, nk=3, interpret=True
    )
    assert int(miss) > 0
    # every voxel the kernel DID update matches the lax result
    upd = np.asarray(out.weight) > np.asarray(vol.weight)
    np.testing.assert_allclose(
        np.asarray(out.tsdf)[upd], np.asarray(ref.tsdf)[upd],
        rtol=0, atol=5e-3,
    )


def test_warped_pallas_banded_absorbs_large_uniform_x_warp():
    # Round-4 banded window: a 60mm UNIFORM x-warp (~25-50px, far beyond
    # the old (nk-1)/2 budget) is absorbed entirely by the per-column
    # mid-range shift — zero misses at nk=3, results == lax
    import jax.numpy as jnp

    from tsdf_tpu import integrate
    from tsdf_tpu.kernels.integrate import integrate_warped_pallas

    vol, depth, cam = _warp_test_setup(0.0, 0.0)
    disp = jnp.broadcast_to(
        jnp.array([60.0, 0.0, 0.0], jnp.float32), vol.deform.shape
    )
    vol = vol.replace(deform=vol.deform + disp)
    ref = integrate(vol, depth, cam)
    out, miss = integrate_warped_pallas(
        vol, depth, cam, nk=3, interpret=True
    )
    assert int(miss) == 0
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), rtol=0, atol=5e-3
    )


def test_line_mode_generic_pose_zero_misses():
    # line mode: nk=1 with zero misses for a generic (off-axis) pose;
    # results match the exact mode except at f32 half-pixel slivers
    from tsdf_tpu import Camera, make_volume
    from tsdf_tpu.kernels.integrate import integrate_pallas
    from tsdf_tpu.utils import fixtures

    vol = make_volume((32, 32, 32), 2000.0, offset=(-1000, -1000, 0))
    cam = (
        Camera.default_depth_camera()
        .move_to([300.0, -200.0, -500.0])
        .look_at([50.0, 80.0, 1000.0])
    )
    depth = fixtures.sphere_depth_map(64, 48, 20.0, 800.0, 1200.0)

    exact, miss_e = integrate_pallas(vol, depth, cam, nk=3, interpret=True)
    line, miss_l = integrate_pallas(
        vol, depth, cam, mode="line", interpret=True
    )
    assert int(miss_e) == 0 and int(miss_l) == 0
    we = np.asarray(exact.weight)
    wl = np.asarray(line.weight)
    # the two rounding conventions agree on essentially every voxel
    agree = (we == wl).mean()
    assert agree > 0.995, agree
    both = (we > 0) & (wl > 0)
    np.testing.assert_allclose(
        np.asarray(line.tsdf)[both], np.asarray(exact.tsdf)[both],
        rtol=0, atol=5.0,  # a differing neighbour pixel moves sdf < 5mm here
    )


@pytest.mark.parametrize("mode", ["exact", "line"])
def test_color_pallas_matches_lax(mode):
    """integrate_color_pallas == ops.integrate(rgb=...): tsdf, weight
    and the u8 colour volume (floored-rate blend) bit-equal."""
    from tsdf_tpu.kernels.integrate import integrate_color_pallas

    vol = make_volume(
        (64, 64, 64), 2000.0, offset=(-1000.0, -1000.0, 0.0),
        with_color=True,
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([120.0, -80.0, -500.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(640, 480, 120.0, 800.0, 1600.0)
    )
    rng = np.random.default_rng(5)
    rgb = jnp.asarray(
        rng.integers(0, 256, size=(480, 640, 3)), jnp.uint8
    )
    ref = integrate(vol, depth, cam, rgb=rgb)
    out, miss = integrate_color_pallas(
        vol, depth, rgb, cam, interpret=True, mode=mode,
        nk=3,
    )
    assert int(miss) == 0
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), atol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )
    # colour u8: allow a 1-LSB band at exact .5 rounding boundaries
    dc = np.abs(
        np.asarray(out.color, np.int32) - np.asarray(ref.color, np.int32)
    )
    assert dc.max() <= 1
    assert (dc > 0).mean() < 1e-3


def test_color_pallas_accumulates_and_caps():
    """Colour converges toward the observed colour over frames with the
    floored rate; weight capping matches the lax path."""
    from tsdf_tpu.kernels.integrate import integrate_color_pallas

    vol = make_volume(
        (48, 48, 48), 1500.0, offset=(-750.0, -750.0, 0.0),
        with_color=True, max_weight=4.0,
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -300.0])
        .look_at([0.0, 0.0, 750.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(640, 480, 150.0, 700.0, 1200.0)
    )
    rgb = jnp.full((480, 640, 3), 200, jnp.uint8)
    ref = vol
    out = vol
    for _ in range(3):
        ref = integrate(ref, depth, cam, rgb=rgb, cap_weight=True)
        out, miss = integrate_color_pallas(
            out, depth, rgb, cam, cap_weight=True, interpret=True
        )
        assert int(miss) == 0
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )
    dc = np.abs(
        np.asarray(out.color, np.int32) - np.asarray(ref.color, np.int32)
    )
    assert dc.max() <= 1
    # fused voxels actually took colour
    w = np.asarray(out.weight) > 0
    band = np.abs(np.asarray(out.tsdf)) < float(vol.truncation_distance)
    assert (np.asarray(out.color)[w & band] > 150).any()


def test_warped_miss_topup_closes_the_fallback():
    # Pathological within-column warp (misses at nk=3) -> the top-up
    # fuses EXACTLY the skipped voxels: result == lax on the whole
    # volume, zero remaining; a full-frame lax fallback is never needed
    import jax.numpy as jnp

    from tsdf_tpu import integrate
    from tsdf_tpu.kernels.integrate import (
        integrate_warped_pallas,
        warped_miss_topup,
    )

    vol, depth, cam = _warp_test_setup(0.0, 0.0)
    y = jnp.arange(32, dtype=jnp.float32)[None, :, None]
    dx = 60.0 * jnp.where(y % 2 == 0, 1.0, -1.0)
    disp = jnp.stack(
        [
            jnp.broadcast_to(dx, vol.deform.shape[:-1]),
            jnp.zeros(vol.deform.shape[:-1]),
            jnp.zeros(vol.deform.shape[:-1]),
        ],
        axis=-1,
    )
    vol = vol.replace(deform=vol.deform + disp)
    ref = integrate(vol, depth, cam)
    out, miss, mask = integrate_warped_pallas(
        vol, depth, cam, nk=3, interpret=True, return_mask=True
    )
    assert int(miss) > 0
    assert float(jnp.sum(mask)) == float(miss)
    full, remaining = warped_miss_topup(out, mask, depth, cam)
    assert int(remaining) == 0
    np.testing.assert_array_equal(
        np.asarray(full.weight), np.asarray(ref.weight)
    )
    np.testing.assert_allclose(
        np.asarray(full.tsdf), np.asarray(ref.tsdf), rtol=0, atol=5e-3
    )


def test_warped_miss_topup_cap_overflow_reports_remaining():
    import jax.numpy as jnp

    from tsdf_tpu.kernels.integrate import (
        integrate_warped_pallas,
        warped_miss_topup,
    )

    vol, depth, cam = _warp_test_setup(0.0, 0.0)
    y = jnp.arange(32, dtype=jnp.float32)[None, :, None]
    dx = 60.0 * jnp.where(y % 2 == 0, 1.0, -1.0)
    disp = jnp.stack(
        [
            jnp.broadcast_to(dx, vol.deform.shape[:-1]),
            jnp.zeros(vol.deform.shape[:-1]),
            jnp.zeros(vol.deform.shape[:-1]),
        ],
        axis=-1,
    )
    vol = vol.replace(deform=vol.deform + disp)
    out, miss, mask = integrate_warped_pallas(
        vol, depth, cam, nk=3, interpret=True, return_mask=True
    )
    cap = max(int(miss) // 2, 1)
    _full, remaining = warped_miss_topup(
        out, mask, depth, cam, max_topup=cap
    )
    assert int(remaining) == int(miss) - cap


def test_fast_mode_decimated_convention():
    """mode="fast" (lane-span compression): sub-voxel agreement with
    the exact path under its documented <=~3 px resampling convention —
    >=99.9% identical update decisions, sub-voxel tsdf deltas."""
    vol = make_volume((64,) * 3, 2000.0, offset=(-1000.0, -1000.0, 0.0))
    cam = (
        Camera.default_depth_camera()
        .move_to([400.0, -250.0, -600.0])
        .look_at([-100.0, 150.0, 1200.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(640, 480, 120.0, 800.0, 1600.0)
    )
    ref = integrate(vol, depth, cam)
    out, miss = integrate_pallas(vol, depth, cam, mode="fast", interpret=True)
    assert int(miss) == 0
    rw, ow = np.asarray(ref.weight), np.asarray(out.weight)
    assert (rw == ow).mean() > 0.999
    both = (rw > 0) & (ow > 0)
    d = np.abs(np.asarray(ref.tsdf)[both] - np.asarray(out.tsdf)[both])
    voxel = 2000.0 / 64
    assert d.mean() < 0.1 * voxel
    assert np.percentile(d, 99) < 0.5 * voxel


def test_color_fast_mode_decimated_convention():
    """Colour mode="fast": same decimated line convention on both
    tables — >=99.9% identical update decisions, colour within ~1/255
    on locally-smooth imagery."""
    vol = make_volume(
        (64,) * 3, 2000.0, offset=(-1000.0, -1000.0, 0.0),
        with_color=True,
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([400.0, -250.0, -600.0])
        .look_at([-100.0, 150.0, 1200.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(640, 480, 120.0, 800.0, 1600.0)
    )
    ys = np.arange(480)[:, None]
    xs = np.arange(640)[None, :]
    rgb = jnp.asarray(
        np.stack(
            [
                np.broadcast_to(ys * 255 // 480, (480, 640)),
                np.broadcast_to(xs * 255 // 640, (480, 640)),
                (ys + xs) * 255 // 1120,
            ],
            axis=-1,
        ).astype(np.uint8)
    )
    from tsdf_tpu.kernels.integrate import integrate_color_pallas

    ref = integrate(vol, depth, cam, rgb=rgb)
    out, miss = integrate_color_pallas(
        vol, depth, rgb, cam, mode="fast", interpret=True
    )
    assert int(miss) == 0
    rw, ow = np.asarray(ref.weight), np.asarray(out.weight)
    assert (rw == ow).mean() > 0.999
    both = (rw > 0) & (ow > 0)
    d = np.abs(
        np.asarray(ref.color, np.int32)[both]
        - np.asarray(out.color, np.int32)[both]
    )
    assert d.mean() < 2.0
    assert np.percentile(d, 99) <= 4
