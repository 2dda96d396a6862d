"""Sharded ops == single-device ops on a virtual 8-CPU mesh.

The moral equivalent of the reference's MockKinect replay rig applied to
the device mesh (SURVEY.md §4): sharding logic is validated without TPU
hardware, gating on numeric equality with the unsharded path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import Camera, integrate, make_volume, raycast
from tsdf_tpu.parallel import (
    integrate_sharded,
    make_mesh,
    raycast_sharded,
    shard_volume,
)
from tsdf_tpu.utils import fixtures


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(n_bricks=4, n_rays=2)


def _camera():
    cam = Camera.default_depth_camera()
    return cam.move_to([0.0, 0.0, -500.0]).look_at([0.0, 0.0, 1000.0])


def test_integrate_sharded_matches_single(mesh):
    """Default path: the line-warp Pallas kernel per brick (interpret
    mode on the CPU mesh), exact-or-skip verified by the psum'd miss
    counter (VERDICT r1 item 2)."""
    vol = make_volume((32, 32, 32), 2000.0, offset=(-1000, -1000, 0))
    cam = _camera()
    depth = fixtures.sphere_depth_map(64, 48, 20.0, 800.0, 1200.0)

    ref = integrate(vol, depth, cam)
    svol = shard_volume(vol, mesh)
    out, miss = integrate_sharded(
        svol, depth, cam, mesh, return_miss=True
    )

    assert int(miss) == 0
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), rtol=0, atol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )


def test_integrate_sharded_lax_path_matches_single(mesh):
    vol = make_volume((32, 32, 32), 2000.0, offset=(-1000, -1000, 0))
    cam = _camera()
    depth = fixtures.sphere_depth_map(64, 48, 20.0, 800.0, 1200.0)

    ref = integrate(vol, depth, cam)
    svol = shard_volume(vol, mesh)
    out = integrate_sharded(svol, depth, cam, mesh, use_pallas=False)

    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), rtol=0, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(ref.weight)
    )


def test_integrate_sharded_with_deformation(mesh):
    vol = make_volume(
        (32, 32, 32), 2000.0, offset=(-1000, -1000, 0),
        with_deformation=True,
    )
    cam = _camera()
    depth = fixtures.sphere_depth_map(64, 48, 20.0, 800.0, 1200.0)

    ref = integrate(vol, depth, cam)
    svol = shard_volume(vol, mesh)
    out = integrate_sharded(svol, depth, cam, mesh)
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), rtol=0, atol=1e-4
    )


def test_raycast_sharded_matches_single(mesh):
    vol = make_volume((32, 32, 32), 2000.0, offset=(-1000, -1000, 0))
    vol = fixtures.sphere_tsdf(vol, 400.0)
    cam = _camera()

    verts_ref, normals_ref = raycast(vol, cam, width=64, height=48)
    svol = shard_volume(vol, mesh)
    verts, normals = raycast_sharded(
        svol, cam, mesh, width=64, height=48,
        replicate_volume_ok=True,
    )

    np.testing.assert_allclose(
        np.asarray(verts), np.asarray(verts_ref), rtol=0, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(normals), np.asarray(normals_ref), rtol=0, atol=1e-4
    )


def test_pose_gradient_through_sharded_integrate(mesh):
    """Pose gradients flow through the sharded integrate (the dryrun's
    training-step core): grad w.r.t. a se3 twist is finite and nonzero."""
    from tsdf_tpu.utils.se3 import se3_exp

    vol = make_volume((16, 16, 16), 2000.0, offset=(-1000, -1000, 0))
    cam = _camera()
    depth = fixtures.sphere_depth_map(32, 24, 10.0, 800.0, 1200.0)
    svol = shard_volume(vol, mesh)

    def loss(xi):
        c = cam.set_pose(se3_exp(xi) @ cam.pose)
        out = integrate_sharded(svol, depth, c, mesh, use_pallas=False)
        return jnp.sum(out.tsdf**2)

    g = jax.grad(loss)(jnp.zeros(6, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0.0)


def test_raycast_bricked_matches_single(mesh):
    """Brick-local streamed raycast == the single-device slab sweep
    (per-device memory O(brick); VERDICT r1 item 7)."""
    from tsdf_tpu.kernels.raycast import raycast_pallas
    from tsdf_tpu.parallel.ops import raycast_sharded_bricked

    vol = make_volume((64, 64, 64), 2000.0, offset=(-1000, -1000, 0))
    vol = fixtures.sphere_tsdf(vol, 400.0)
    W, H = 160, 120
    cam = (
        Camera.from_intrinsics(591.1 / 4, 590.1 / 4, 331.0 / 4, 234.6 / 4)
        .move_to([150.0, -100.0, -600.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    verts_ref, _ = raycast_pallas(vol, cam, W, H, interpret=True)
    svol = shard_volume(vol, mesh)
    verts, normals = raycast_sharded_bricked(
        svol, cam, mesh, width=W, height=H
    )
    vr = np.asarray(verts_ref)
    vb = np.asarray(verts)
    hit_r = np.isfinite(vr).all(-1)
    hit_b = np.isfinite(vb).all(-1)
    assert (hit_r == hit_b).mean() > 0.999
    both = hit_r & hit_b
    err = np.linalg.norm(vr[both] - vb[both], axis=-1)
    assert np.median(err) < 0.5 and np.percentile(err, 99) < 2.0


def test_raycast_bricked_reverse_sweep(mesh):
    from tsdf_tpu.kernels.raycast import raycast_pallas
    from tsdf_tpu.parallel.ops import raycast_sharded_bricked

    vol = make_volume((64, 64, 64), 2000.0, offset=(-1000, -1000, 0))
    vol = fixtures.sphere_tsdf(vol, 400.0)
    W, H = 160, 120
    cam = (
        Camera.from_intrinsics(591.1 / 4, 590.1 / 4, 331.0 / 4, 234.6 / 4)
        .move_to([0.0, 0.0, 2600.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    verts_ref, _ = raycast_pallas(vol, cam, W, H, interpret=True)
    svol = shard_volume(vol, mesh)
    verts, _ = raycast_sharded_bricked(svol, cam, mesh, width=W, height=H)
    vr = np.asarray(verts_ref)
    vb = np.asarray(verts)
    hit_r = np.isfinite(vr).all(-1)
    hit_b = np.isfinite(vb).all(-1)
    assert (hit_r == hit_b).mean() > 0.999
    both = hit_r & hit_b
    err = np.linalg.norm(vr[both] - vb[both], axis=-1)
    assert np.median(err) < 0.5


def test_integrate_sharded_color_matches_single(mesh):
    """Colour fusion on the mesh (packed two-table kernel per brick) ==
    the single-device lax colour path."""
    from tsdf_tpu import Camera, integrate, make_volume
    from tsdf_tpu.parallel.ops import integrate_sharded, shard_volume
    from tsdf_tpu.utils import fixtures

    vol = make_volume(
        (32, 32, 32), 1500.0, offset=(-750.0, -750.0, 0.0),
        with_color=True,
    )
    cam = (
        Camera.from_intrinsics(147.775, 147.525, 82.75, 58.65)
        .move_to([50.0, -30.0, -300.0])
        .look_at([0.0, 0.0, 750.0])
    )
    depth = jnp.asarray(
        fixtures.sphere_depth_map(160, 120, 60.0, 600.0, 1200.0)
    )
    rng = np.random.RandomState(3)
    rgb = jnp.asarray(
        rng.randint(0, 256, size=(120, 160, 3)), jnp.uint8
    )
    ref = integrate(vol, depth, cam, rgb=rgb)

    vs = shard_volume(vol, mesh)
    # exact mode: bit-parity with the lax reference rounding (line mode
    # differs on ~0.003% of voxels at f32 half-pixel slivers)
    got, miss = integrate_sharded(
        vs, depth, cam, mesh, rgb=rgb, return_miss=True, mode="exact",
    )
    assert int(miss) == 0
    np.testing.assert_allclose(
        np.asarray(got.tsdf), np.asarray(ref.tsdf), atol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(got.weight), np.asarray(ref.weight)
    )
    dc = np.abs(
        np.asarray(got.color, np.int32) - np.asarray(ref.color, np.int32)
    )
    assert dc.max() <= 1


@pytest.mark.parametrize(
    "position,target",
    [
        ([2600.0, 100.0, 1000.0], [0.0, 0.0, 1000.0]),   # -x dominant
        ([-2600.0, 0.0, 900.0], [0.0, 0.0, 1000.0]),     # +x dominant
        ([100.0, 2600.0, 1000.0], [0.0, 0.0, 1000.0]),   # -y dominant
        ([0.0, -2600.0, 1100.0], [0.0, 0.0, 1000.0]),    # +y dominant
    ],
)
def test_raycast_bricked_axis_select(mesh, position, target):
    """x-/y-dominant cameras sweep their own axis via an all_to_all
    re-shard — O(brick)/device for ANY orientation (round-3 verdict
    item 2; ref: GPURaycaster.cu:265-377 is orientation-free)."""
    from tsdf_tpu.kernels.raycast import raycast_pallas
    from tsdf_tpu.parallel.ops import raycast_sharded_bricked

    vol = make_volume((64, 64, 64), 2000.0, offset=(-1000, -1000, 0))
    vol = fixtures.sphere_tsdf(vol, 400.0)
    W, H = 160, 120
    cam = (
        Camera.from_intrinsics(591.1 / 4, 590.1 / 4, 331.0 / 4, 234.6 / 4)
        .move_to(position)
        .look_at(target)
    )
    verts_ref, _ = raycast_pallas(vol, cam, W, H, interpret=True)
    svol = shard_volume(vol, mesh)
    verts, _ = raycast_sharded_bricked(svol, cam, mesh, width=W, height=H)
    vr = np.asarray(verts_ref)
    vb = np.asarray(verts)
    hit_r = np.isfinite(vr).all(-1)
    hit_b = np.isfinite(vb).all(-1)
    assert hit_r.sum() > 500  # the scene is actually visible
    assert (hit_r == hit_b).mean() > 0.999
    both = hit_r & hit_b
    err = np.linalg.norm(vr[both] - vb[both], axis=-1)
    assert np.median(err) < 0.5 and np.percentile(err, 99) < 2.0


def test_raycast_bricked_axis_select_divisibility():
    """Non-divisible Y/X raise with guidance; axis_select=False still
    runs the z-only sweep."""
    from tsdf_tpu.parallel.ops import raycast_sharded_bricked

    m3 = make_mesh(n_bricks=3, n_rays=1)
    # size tuple is (x, y, z): z=48 divides the 3-brick axis, x=y=50
    # do not
    vol = make_volume((50, 50, 48), 2000.0, offset=(-1000, -1000, 0))
    vol = fixtures.sphere_tsdf(vol, 400.0)
    svol = shard_volume(vol, m3)
    # intrinsics centred on the small 32x24 image (the full-res
    # principal point would push every ray off the sphere)
    cam = (
        Camera.from_intrinsics(147.8, 147.5, 16.0, 12.0)
        .move_to([0.0, 0.0, -600.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    with pytest.raises(ValueError, match="axis_select"):
        raycast_sharded_bricked(
            svol, cam, m3, width=32, height=24, axis_select=True
        )
    # default (auto) degrades to the z-only sweep and still renders
    verts, _ = raycast_sharded_bricked(svol, cam, m3, width=32, height=24)
    assert np.isfinite(np.asarray(verts)).all(-1).sum() > 50
