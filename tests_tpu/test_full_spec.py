"""Full-spec on-chip gates (round-3 verdict item 6).

Rounds 2-3 repeatedly hit size-dependent Mosaic/XLA regressions that
the 64^3/160x120 smoke shapes cannot catch (vmem OOM at 512^3, compile
bombs at 255^3) — they surfaced only in the next driver bench. These
tests compile-and-run ONE frame of each production path at its
headline spec (warm .jax_cache makes them cheap; cold they are the
same compiles bench.py needs anyway) and assert the exactness
counters and finiteness, so a full-size-only regression fails a gate
instead of the scoreboard.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.utils import fixtures

W, H = 640, 480


def _cam():
    return (
        Camera.default_depth_camera()
        .move_to([300.0, -200.0, -500.0])
        .look_at([50.0, 80.0, 1500.0])
    )


def _depth():
    return jnp.asarray(
        fixtures.sphere_depth_map(W, H, 150.0, 1000.0, 2500.0)
    )


def test_integrate_512_full_spec():
    from tsdf_tpu.kernels.integrate import integrate_pallas

    vol = make_volume((512,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
    out, miss = integrate_pallas(vol, _depth(), _cam(), mode="line")
    assert int(miss) == 0
    assert np.isfinite(float(jnp.sum(out.tsdf))), "non-finite tsdf"
    assert float(jnp.sum(out.weight)) > 0.0, "no voxel updated"


def test_raycast_512_full_spec():
    from tsdf_tpu.kernels.raycast import raycast_pallas

    vol = fixtures.sphere_tsdf(
        make_volume((512,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0)),
        600.0,
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -900.0])
        .look_at([0.0, 0.0, 1500.0])
    )
    verts, _ = raycast_pallas(vol, cam, width=W, height=H)
    hits = np.isfinite(np.asarray(verts)).all(-1)
    assert hits.sum() > 10000, f"only {hits.sum()} rays hit the sphere"


def test_warped_integrate_512_full_spec():
    from tsdf_tpu.kernels.integrate import integrate_warped_pallas

    vol = make_volume(
        (512,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0),
        with_deformation=True,
    )
    # large uniform warp — the dual-band window's exact case
    vol = vol.replace(
        deform=vol.deform + jnp.array([80.0, 0.0, 0.0], jnp.float32)
    )
    out, miss, mask = integrate_warped_pallas(
        vol, _depth(), _cam(), nk=5, return_mask=True
    )
    assert int(miss) == 0
    assert float(jnp.sum(mask)) == 0.0
    assert np.isfinite(float(jnp.sum(out.tsdf)))


def test_scenefusion_255_full_spec():
    from tsdf_tpu.ops.raycast import render_to_depth_image
    from tsdf_tpu.pipelines.scenefusion import (
        SceneFusionConfig,
        _sf_step_pallas,
    )

    cfg = SceneFusionConfig()
    vol = fixtures.sphere_tsdf(
        cfg.make_volume(), 500.0, centre=(0.0, 0.0, 1300.0)
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, 100.0])
        .look_at([0.0, 0.0, 1300.0])
    )
    depth = jnp.asarray(
        render_to_depth_image(vol, cam, width=W, height=H), jnp.float32
    )
    flow = jnp.broadcast_to(
        jnp.array([4.0, 0.0, 0.0], jnp.float32), (H, W, 3)
    )
    out, miss, mask, n_corr, overflow = _sf_step_pallas(
        vol, depth, flow, cam,
        max_cubes=cfg.max_cubes, nk=cfg.integrate_nk,
        threshold_mm=cfg.threshold_mm, tpu_safe=True,
    )
    miss_h, corr_h, ovf_h = jax.device_get((miss, n_corr, overflow))
    assert not bool(ovf_h), "extraction overflowed at the 255^3 default"
    assert int(corr_h) > 0, "no correspondences on the rendered frame"
    assert int(miss_h) == 0, f"{int(miss_h)} warped-integrate misses"
    assert np.isfinite(float(jnp.sum(out.tsdf)))
    assert np.isfinite(float(jnp.sum(out.deform)))
