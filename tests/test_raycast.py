"""Raycast tests against analytic sphere/wall intersections.

The reference raycast tests render golden PNGs inspected by eye
(ref: Test_TSDF_RayCast.cpp:413-443); here hits are asserted against the
closed-form ray-sphere/ray-plane intersection.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import Camera, make_volume, raycast
from tsdf_tpu.utils.fixtures import sphere_tsdf, wall_tsdf

W, H = 64, 48


def _scene(size=48):
    vol = make_volume((size, size, size), 1600.0)
    radius = 400.0
    vol = sphere_tsdf(vol, radius)
    centre = np.asarray(vol.offset + vol.physical_size / 2.0)
    cam = Camera.from_intrinsics(40.0, 40.0, W / 2.0, H / 2.0)
    cam = cam.move_to(jnp.array([0.0, 0.0, -400.0])).look_at(
        jnp.array(centre)
    )
    return vol, cam, centre, radius


@pytest.mark.parametrize("mode", ["fixed", "sphere"])
def test_sphere_central_hit(mode):
    vol, cam, centre, radius = _scene()
    verts, normals = raycast(vol, cam, W, H, mode=mode)
    verts = np.asarray(verts)
    # Central pixel's ray runs straight down +z to the sphere front pole.
    v = verts[H // 2, W // 2]
    expected = centre - np.array([0.0, 0.0, radius])
    voxel = float(np.asarray(vol.voxel_size)[0])
    assert np.all(np.isfinite(v))
    assert np.linalg.norm(v - expected) < voxel


@pytest.mark.parametrize("mode", ["fixed", "sphere"])
def test_sphere_hits_lie_on_sphere(mode):
    vol, cam, centre, radius = _scene()
    verts, _ = raycast(vol, cam, W, H, mode=mode)
    verts = np.asarray(verts).reshape(-1, 3)
    hits = verts[np.isfinite(verts).all(axis=1)]
    assert len(hits) > 50
    dist = np.linalg.norm(hits - centre, axis=1)
    voxel = float(np.asarray(vol.voxel_size)[0])
    # All hits within a voxel of the true surface.
    assert np.abs(dist - radius).max() < voxel


def test_sphere_normals_radial():
    vol, cam, centre, radius = _scene()
    verts, normals = raycast(vol, cam, W, H, mode="sphere")
    verts = np.asarray(verts)
    normals = np.asarray(normals)
    # Check interior hit pixels: normal should be ~radial (outward).
    v = verts[H // 2, W // 2]
    n = normals[H // 2, W // 2]
    radial = (v - centre) / np.linalg.norm(v - centre)
    # Screen-space normals: sign convention gives outward-facing.
    assert np.abs(np.dot(n, radial)) > 0.95


def test_miss_rays_are_nan():
    vol, cam, centre, radius = _scene()
    verts, normals = raycast(vol, cam, W, H, mode="sphere")
    corner = np.asarray(verts)[0, 0]
    assert np.isnan(corner).all()
    assert np.allclose(np.asarray(normals)[0, 0], 0.0)


def test_modes_agree():
    vol, cam, centre, radius = _scene()
    v_fixed, _ = raycast(vol, cam, W, H, mode="fixed")
    v_sphere, _ = raycast(vol, cam, W, H, mode="sphere")
    v_fixed = np.asarray(v_fixed)
    v_sphere = np.asarray(v_sphere)
    both = np.isfinite(v_fixed).all(-1) & np.isfinite(v_sphere).all(-1)
    voxel = float(np.asarray(vol.voxel_size)[0])
    err = np.linalg.norm(v_fixed[both] - v_sphere[both], axis=-1)
    assert err.max() < voxel
    # Same hit footprint up to a 2% pixel fringe.
    fixed_hits = np.isfinite(v_fixed).all(-1)
    sphere_hits = np.isfinite(v_sphere).all(-1)
    assert (fixed_hits != sphere_hits).mean() < 0.02


def test_wall_depth_render():
    from tsdf_tpu import render_to_depth_image

    vol = make_volume((32, 32, 32), 1600.0)
    wall_z = 900.0
    vol = wall_tsdf(vol, wall_z)
    cam = Camera.from_intrinsics(40.0, 40.0, W / 2.0, H / 2.0)
    depth = np.asarray(render_to_depth_image(vol, cam, W, H))
    centre_depth = depth[H // 2, W // 2]
    assert abs(int(centre_depth) - wall_z) < 60.0  # within ~a voxel


def test_color_render():
    """Fused colour renders at hit pixels (the reference never reads its
    colour array; here fuse -> raycast -> colour image closes the loop)."""
    from tsdf_tpu.ops.integrate import integrate
    from tsdf_tpu.ops.shading import color_image
    from tsdf_tpu.utils.fixtures import sphere_depth_map

    vol = make_volume(
        (48, 48, 48), 1000.0, offset=(-500.0, -500.0, 0.0), with_color=True
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -300.0])
        .look_at([0.0, 0.0, 500.0])
    )
    depth = jnp.asarray(sphere_depth_map(640, 480, 150.0, 400.0, 800.0))
    rgb = jnp.broadcast_to(jnp.array([200, 80, 30], jnp.uint8), (480, 640, 3))
    fused = integrate(vol, depth, cam, rgb=rgb)

    # render small: scale the intrinsics with the image (same FoV)
    rcam = (
        Camera.from_intrinsics(591.1 / 4, 590.1 / 4, 331.0 / 4, 234.6 / 4)
        .move_to([0.0, 0.0, -300.0])
        .look_at([0.0, 0.0, 500.0])
    )
    verts, _ = raycast(fused, rcam, 160, 120)
    img = np.asarray(color_image(fused, verts))
    hits = np.isfinite(np.asarray(verts)).all(-1)
    assert img.shape == (120, 160, 3)
    assert hits.sum() > 100
    # interior hit pixels carry the fused colour (interpolation against
    # unpainted neighbours can dim silhouette pixels); misses are black
    centre = img[hits][np.linalg.norm(
        img[hits].astype(np.int32) - [200, 80, 30], axis=-1) < 60]
    assert len(centre) > 0.5 * hits.sum()
    assert (img[~hits] == 0).all()


def test_color_render_requires_color():
    from tsdf_tpu.ops.shading import color_image

    vol = make_volume((8, 8, 8), 100.0)
    with pytest.raises(ValueError):
        color_image(vol, jnp.zeros((4, 4, 3)))
