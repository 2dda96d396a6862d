"""Compiled-kernel == lax equality on the real TPU (small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, integrate, make_volume, raycast
from tsdf_tpu.kernels.gather import lane_gather_op
from tsdf_tpu.kernels.integrate import (
    integrate_pallas,
    integrate_warped_pallas,
)
from tsdf_tpu.kernels.raycast import raycast_pallas
from tsdf_tpu.ops.scatter import scatter_add_flat
from tsdf_tpu.utils import fixtures

W, H = 160, 120
FX, FY, CX, CY = 591.1 / 4, 590.1 / 4, 331.0 / 4, 234.6 / 4


def _cam(off=False):
    pos = [300.0, -200.0, -500.0] if off else [0.0, 0.0, -500.0]
    return (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to(pos)
        .look_at([0.0, 0.0, 1000.0])
    )


def _sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def test_integrate_compiled_matches_lax():
    vol = make_volume((64,) * 3, 2000.0, offset=(-1000, -1000, 0))
    depth = jnp.asarray(fixtures.sphere_depth_map(W, H, 40.0, 800.0, 1200.0))
    for mode, kw in (("exact", dict(nk=3)), ("line", dict(mode="line"))):
        out, miss = integrate_pallas(vol, depth, _cam(off=True), **kw)
        ref = integrate(vol, depth, _cam(off=True))
        assert int(miss) == 0, mode
        w_equal = (
            np.asarray(out.weight) == np.asarray(ref.weight)
        ).mean()
        # exact: bit-equal; line: a few half-pixel-sliver voxels differ
        assert w_equal >= (1.0 if mode == "exact" else 0.995), mode
        both = (np.asarray(out.weight) > 0) & (np.asarray(ref.weight) > 0)
        np.testing.assert_allclose(
            np.asarray(out.tsdf)[both], np.asarray(ref.tsdf)[both],
            rtol=0, atol=5.0,
        )


def test_integrate_warped_compiled_matches_lax():
    vol = make_volume(
        (32,) * 3, 2000.0, offset=(-1000, -1000, 0), with_deformation=True
    )
    z = jnp.arange(32, dtype=jnp.float32)[:, None, None, None]
    disp = jnp.concatenate(
        [
            1.5 * jnp.sin(z / 5.0)
            * jnp.ones(vol.deform.shape[:-1])[..., None],
            30.0 * jnp.cos(z / 7.0)
            * jnp.ones(vol.deform.shape[:-1])[..., None],
            jnp.zeros(vol.deform.shape[:-1])[..., None],
        ],
        axis=-1,
    )
    vol = vol.replace(deform=vol.deform + disp)
    depth = jnp.asarray(fixtures.sphere_depth_map(W, H, 40.0, 800.0, 1200.0))
    out, miss = integrate_warped_pallas(vol, depth, _cam(), nk=5)
    ref = integrate(vol, depth, _cam())
    assert int(miss) == 0
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), rtol=0, atol=5e-2
    )


def test_raycast_compiled_matches_lax():
    vol = fixtures.sphere_tsdf(
        make_volume((64,) * 3, 2000.0, offset=(-1000, -1000, 0)), 400.0
    )
    cam = (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([150.0, -100.0, -600.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    vp, _ = raycast_pallas(vol, cam, W, H)
    vr, _ = raycast(vol, cam, width=W, height=H)
    hp = np.isfinite(np.asarray(vp)).all(-1)
    hr = np.isfinite(np.asarray(vr)).all(-1)
    assert (hp == hr).mean() > 0.995
    both = hp & hr
    err = np.linalg.norm(np.asarray(vp)[both] - np.asarray(vr)[both], axis=-1)
    assert np.median(err) < 1.0


def test_lane_gather_compiled():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(64, 640).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 640, size=(64, 256)).astype(np.int32))
    out = lane_gather_op(table, idx)
    ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_scatter_add_compiled():
    n = 1 << 16
    rng = np.random.RandomState(1)
    lin = rng.randint(0, n, size=5000).astype(np.int32)
    val = rng.randn(5000).astype(np.float32)
    out = np.asarray(scatter_add_flat(n, jnp.asarray(lin), jnp.asarray(val)))
    ref = np.zeros(n, np.float32)
    np.add.at(ref, lin, val)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-4)


def test_gather_flat_compiled():
    """Sorted-window matmul gather on the chip == numpy indexing,
    incl. out-of-range zero fill and original stream order."""
    from tsdf_tpu.ops.scatter import gather_flat

    n, d, c = 307200, 4, 1 << 17
    rng = np.random.RandomState(2)
    tab = rng.randn(n, d).astype(np.float32)
    lin = rng.randint(-9, n + 9, size=c).astype(np.int32)
    out = np.asarray(
        gather_flat(jnp.asarray(tab), jnp.asarray(lin), fill_mode="zero")
    )
    ref = np.where(
        ((lin < 0) | (lin >= n))[:, None], 0.0, tab[np.clip(lin, 0, n - 1)]
    )
    np.testing.assert_array_equal(out, ref)


def test_extract_surface_on_device_matches_cpu():
    """On-device MC (sort compaction + lane-gather tables + matmul
    scatter) == the host-CPU XLA path, on a real chip."""
    from tsdf_tpu.ops.marching_cubes import extract_surface, soup_to_numpy

    vol = make_volume((64,) * 3, 2000.0, offset=(-1000.0, -1000.0, -1000.0))
    vol = fixtures.sphere_tsdf(vol, 600.0, centre=(0.0, 0.0, 0.0))
    dev = extract_surface(vol, max_cubes=1 << 15, max_vertices=1 << 17)
    host = extract_surface(
        vol, max_cubes=1 << 15, max_vertices=1 << 17, on_cpu=True
    )
    assert int(dev.n_vertices) == int(host.n_vertices)
    dv = np.asarray(dev.vertex_voxels)[: int(dev.n_vertices)]
    hv = np.asarray(host.vertex_voxels)[: int(host.n_vertices)]
    np.testing.assert_array_equal(dv, hv)
    vd, _ = soup_to_numpy(dev)
    vh, _ = soup_to_numpy(host)
    np.testing.assert_allclose(vd, vh, atol=1e-2)


def test_scenefusion_fused_step_on_device():
    """The fused SceneFusion step (masked extract -> matmul-scatter
    deformation update -> warped integrate) compiles and runs on the
    chip; deformation lands on surface voxels with the applied flow."""
    from tsdf_tpu.ops.raycast import render_to_depth_image
    from tsdf_tpu.pipelines.scenefusion import _sf_step_pallas

    vol = make_volume(
        (64,) * 3, 2000.0, offset=(-1000.0, -1000.0, 0.0),
        with_deformation=True,
    )
    vol = fixtures.sphere_tsdf(vol, 400.0, centre=(0.0, 0.0, 1000.0))
    cam = _cam()
    depth = render_to_depth_image(vol, cam, width=W, height=H)
    # 8 mm ≈ 1.2 px of x-warp at this geometry — within the warped
    # kernel's (nk-1)/2 = 2 px budget (larger flows correctly fire the
    # exact-or-skip miss counter and fall back to the lax path)
    flow = jnp.broadcast_to(
        jnp.array([8.0, 0.0, 0.0], jnp.float32), (H, W, 3)
    )
    out, miss, _mask, n_corr, overflow = _sf_step_pallas(
        vol, jnp.asarray(depth, jnp.float32), flow, cam,
        max_cubes=1 << 15, nk=5, threshold_mm=10.0, tpu_safe=True,
    )
    assert int(miss) == 0
    assert not bool(overflow)
    assert int(n_corr) > 100
    delta = np.asarray(out.deform - vol.deform)
    assert (np.abs(delta[..., 0]) > 1.0).sum() > 100
    assert delta[..., 0].max() <= 8.0 + 1e-3


def test_scatter_fold_offsets_compiled():
    """fold_offsets (static-rolled stencil taps) on the chip == naive."""
    rng = np.random.default_rng(3)
    n = 4096
    C = 512
    offs = (0, 1, 130, 300)
    lin = np.sort(rng.integers(0, n, size=C)).astype(np.int32)
    val = rng.normal(size=(8, C)).astype(np.float32)  # Dout = 2
    got = np.asarray(
        scatter_add_flat(
            n, jnp.asarray(lin), jnp.asarray(val),
            is_sorted=True, fold_offsets=offs,
        )
    )
    ref = np.zeros((2, n), np.float32)
    for g, off in enumerate(offs):
        for c in range(C):
            t = lin[c] + off
            if 0 <= t < n:
                ref[:, t] += val[2 * g : 2 * g + 2, c]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_raycast_empty_brick_skip_compiled():
    """Empty-brick skipping engages on the chip (deep scene: sphere in
    front of a far wall) and stays equal to the lax reference."""
    vol = make_volume((128,) * 3, 2000.0, offset=(-1000.0, -1000.0, 0.0))
    sph = fixtures.sphere_tsdf(vol, 300.0, centre=(0.0, 0.0, 800.0))
    wall = fixtures.wall_tsdf(vol, 1900.0)
    vol = vol.replace(
        tsdf=jnp.minimum(sph.tsdf, wall.tsdf),
        weight=jnp.ones_like(vol.weight),
    )
    cam = _cam()
    vr, _ = raycast(vol, cam, width=W, height=H)
    vp, _ = raycast_pallas(vol, cam, width=W, height=H)
    hr = np.isfinite(np.asarray(vr)).all(-1)
    hp = np.isfinite(np.asarray(vp)).all(-1)
    # wall + sphere fill the frustum wherever it overlaps the volume:
    # ~0.77 from this camera (image corners exit the 2 m box laterally
    # before the wall depth)
    assert hp.mean() > 0.7
    assert (hr == hp).mean() > 0.999
    both = hr & hp
    err = np.linalg.norm(np.asarray(vr)[both] - np.asarray(vp)[both], axis=-1)
    assert np.median(err) < 1.0


def test_integrate_color_compiled_matches_lax():
    """Colour-fusing kernel on the chip == lax colour path."""
    from tsdf_tpu.kernels.integrate import integrate_color_pallas

    vol = make_volume(
        (64,) * 3, 2000.0, offset=(-1000.0, -1000.0, 0.0),
        with_color=True,
    )
    cam = _cam(off=True)
    depth = jnp.asarray(
        fixtures.sphere_depth_map(W, H, 60.0, 800.0, 1600.0)
    )
    rng = np.random.default_rng(9)
    rgb = jnp.asarray(rng.integers(0, 256, size=(H, W, 3)), jnp.uint8)
    ref = integrate(vol, depth, cam, rgb=rgb)
    # exact mode: the reference rounding convention, bit-comparable
    out, miss = integrate_color_pallas(vol, depth, rgb, cam, mode="exact")
    assert int(miss) == 0
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), atol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )
    dc = np.abs(
        np.asarray(out.color, np.int32) - np.asarray(ref.color, np.int32)
    )
    assert dc.max() <= 1
    # line mode (the production default): same projection evaluated on
    # the column's image line — a few half-pixel-sliver voxels may take
    # the adjacent pixel (as in test_integrate_compiled_matches_lax)
    outl, missl = integrate_color_pallas(vol, depth, rgb, cam)
    assert int(missl) == 0
    w_equal = (np.asarray(outl.weight) == np.asarray(ref.weight)).mean()
    assert w_equal >= 0.9999


def test_integrate_pose_adjoint_compiled():
    """The three-table pose-adjoint kernel compiles and matches the lax
    analytic gradient on the chip."""
    from tsdf_tpu.kernels.integrate import integrate_pose
    from tsdf_tpu.ops.integrate_diff import pose_gradient_lax

    vol = make_volume((64,) * 3, 2000.0, offset=(-1000.0, -1000.0, 0.0))
    vol = vol.replace(weight=jnp.full_like(vol.weight, 2.0))
    cam = _cam(off=True)
    depth = jnp.asarray(
        fixtures.sphere_depth_map(W, H, 60.0, 800.0, 1600.0), jnp.float32
    )
    rng = np.random.default_rng(11)
    gbar = jnp.asarray(rng.normal(size=vol.tsdf.shape), jnp.float32)

    def loss(delta):
        out, _ = integrate_pose(vol, depth, cam, delta)
        return jnp.sum(gbar * out.tsdf)

    g_k = np.asarray(jax.grad(loss)(jnp.zeros(6)))
    g_l = np.asarray(pose_gradient_lax(vol, depth, cam, gbar))
    np.testing.assert_allclose(g_k, g_l, rtol=2e-3, atol=1e-2)


def test_bilateral_compiled_matches_lax():
    """Compiled Mosaic bilateral stencil == the lax path on device."""
    from tsdf_tpu.kernels.bilateral import bilateral_filter_pallas
    from tsdf_tpu.ops.bilateral import bilateral_filter

    rng = np.random.default_rng(11)
    d = rng.uniform(400.0, 4000.0, (480, 640))
    d[rng.uniform(size=d.shape) < 0.1] = 0.0
    d = jnp.asarray(d, jnp.float32)
    a = np.asarray(bilateral_filter(d))
    b = np.asarray(bilateral_filter_pallas(d))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_pose_adjoint_line_mode_compiled():
    """mode='line' backward (nk=1, three tables on one candidate sweep)
    compiles and matches the exact-mode gradient on an agreeing pose."""
    from tsdf_tpu.camera import Camera
    from tsdf_tpu.kernels.integrate import integrate_pose

    vol = make_volume((48,) * 3, 1500.0, offset=(-750.0, -750.0, 0.0))
    vol = vol.replace(weight=jnp.full_like(vol.weight, 2.0))
    cam = (
        Camera.from_intrinsics(147.775, 147.525, 82.75, 58.65)
        .move_to([41.0, -33.0, -300.0])
        .look_at([0.0, 0.0, 750.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(W, H, 300.0, 600.0, 1200.0), jnp.float32
    )
    rng = np.random.default_rng(12)
    gbar = jnp.asarray(rng.normal(size=vol.tsdf.shape), jnp.float32)

    def loss(delta, mode):
        out, _ = integrate_pose(vol, depth, cam, delta, mode=mode)
        return jnp.sum(gbar * out.tsdf)

    g_line = np.asarray(jax.grad(lambda d: loss(d, "line"))(jnp.zeros(6)))
    g_exact = np.asarray(jax.grad(lambda d: loss(d, "exact"))(jnp.zeros(6)))
    np.testing.assert_allclose(g_line, g_exact, rtol=2e-4, atol=2e-3)


def test_pose_adjoint_full_spec_compiles():
    """The pose-adjoint kernel COMPILES at the full 512^3 / 640x480 spec
    (regression: round 2's kernel OOM'd the 16MB scoped-vmem cap at this
    size and the bench compile failed) and returns finite gradients.
    Warm-cache cheap; cold it is a few-second compile."""
    from tsdf_tpu.kernels.integrate import _pose_grad_pallas

    grid = 512
    vol = make_volume((grid,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
    cam = _cam(off=True)
    depth = jnp.asarray(
        fixtures.sphere_depth_map(640, 480, 150.0, 1000.0, 2500.0),
        jnp.float32,
    )
    gbar = jnp.ones((grid,) * 3, jnp.float32)
    gz = jnp.zeros((grid,) * 3, jnp.float32)
    dd, dw, dxi = _pose_grad_pallas(
        vol, depth, cam, gbar, gz,
        nk=3, cap_weight=False, image_term=True, interpret=False,
    )
    assert np.isfinite(np.asarray(dxi)).all()
    assert np.isfinite(float(jnp.sum(dd))) and np.isfinite(
        float(jnp.sum(dw))
    )
