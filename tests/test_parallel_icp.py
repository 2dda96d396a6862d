"""Sharded full ICP pyramid + tracked fusion == single-device, on the
8-CPU mesh (VERDICT r1 item 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import Camera, make_volume
from tsdf_tpu.kernels.raycast import raycast_pallas
from tsdf_tpu.parallel import (
    get_incremental_transformation_sharded,
    make_mesh,
    shard_volume,
    track_and_fuse_frames_sharded,
)
from tsdf_tpu.tracking.icp import get_incremental_transformation
from tsdf_tpu.utils import fixtures

W, H = 160, 120
FX, FY, CX, CY = 591.1 / 4, 590.1 / 4, 331.0 / 4, 234.6 / 4


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(n_bricks=4, n_rays=2)


def _scene():
    vol = make_volume((64,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
    vol = fixtures.sphere_tsdf(vol, 600.0)
    wall = fixtures.wall_tsdf(vol, 2500.0)
    return vol.replace(
        tsdf=jnp.minimum(vol.tsdf, wall.tsdf),
        weight=jnp.ones_like(vol.weight),
    )


def _depth_of(scene, cam):
    verts, _ = raycast_pallas(scene, cam, W, H, interpret=True)
    camz = cam.world_to_camera(
        jnp.where(jnp.isfinite(verts), verts, 0.0).reshape(-1, 3)
    ).reshape(H, W, 3)[..., 2]
    return jnp.where(jnp.isfinite(verts).all(-1), camz, 0.0)


def _cam(t):
    return (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([30.0 * t, -20.0 * t, -500.0])
        .look_at([0.0, 0.0, 1500.0])
    )


def test_sharded_pyramid_matches_single_device(mesh):
    scene = _scene()
    d0 = _depth_of(scene, _cam(0.0))
    d1 = _depth_of(scene, _cam(1.0))
    k = _cam(0.0).k
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]

    ref = get_incremental_transformation(d1, d0, fx, fy, cx, cy)
    out = get_incremental_transformation_sharded(
        d1, d0, jnp.stack([fx, fy, cx, cy]), mesh
    )
    np.testing.assert_allclose(
        np.asarray(out.pose), np.asarray(ref.pose), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.inliers), float(ref.inliers), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(out.error), float(ref.error), rtol=1e-3, atol=1e-3
    )


def test_sharded_pyramid_banded_matches_exact(mesh):
    scene = _scene()
    d0 = _depth_of(scene, _cam(0.0))
    d1 = _depth_of(scene, _cam(0.5))
    k = _cam(0.0).k
    intr = jnp.stack([k[0, 0], k[1, 1], k[0, 2], k[1, 2]])

    exact = get_incremental_transformation_sharded(d1, d0, intr, mesh)
    banded = get_incremental_transformation_sharded(
        d1, d0, intr, mesh, band=32
    )
    np.testing.assert_allclose(
        np.asarray(banded.pose), np.asarray(exact.pose), rtol=0, atol=5e-3
    )


def test_tracked_fusion_on_mesh_matches_single(mesh):
    from tsdf_tpu.pipelines import FusionConfig, track_and_fuse_frames

    scene = _scene()
    cams = [_cam(t) for t in (0.0, 0.4, 0.8)]
    frames = [_depth_of(scene, c) for c in cams]

    kvol = make_volume((64,) * 3, 3000.0, offset=(-1500.0, -1500.0, 0.0))
    cfg = FusionConfig(width=W, height=H, volume_size=(64,) * 3)
    _, _, poses_ref, _ = track_and_fuse_frames(
        kvol, cams[0], frames, cfg
    )

    svol = shard_volume(kvol, mesh)
    _, _, poses_mesh, _ = track_and_fuse_frames_sharded(
        svol, cams[0], frames, mesh, width=W, height=H
    )
    for pm, pr in zip(poses_mesh, poses_ref):
        # trajectories agree: translation within 2 mm, rotation within
        # ~0.1 deg — the sharded loop's model render is the brick-local
        # slab sweep (round 4; the volume-replicating lax march is
        # opt-in), whose sub-voxel vertex differences shift the ICP fit
        # slightly more than the old all_gather path did
        np.testing.assert_allclose(
            np.asarray(pm)[:3, 3], np.asarray(pr)[:3, 3], atol=2.0
        )
        np.testing.assert_allclose(
            np.asarray(pm)[:3, :3], np.asarray(pr)[:3, :3], atol=3e-3
        )
