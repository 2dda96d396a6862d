"""Camera transform tests — ports the assertion style of the reference's
only assertion-rich unit test (ref: src/Tests/Test_Camera.cpp:35-496)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import Camera


@pytest.fixture
def cam():
    return Camera.default_depth_camera()


def test_default_intrinsics(cam):
    k = np.asarray(cam.k)
    assert k[0, 0] == pytest.approx(591.1)
    assert k[1, 1] == pytest.approx(590.1)
    assert k[0, 2] == pytest.approx(331.0)
    assert k[1, 2] == pytest.approx(234.6)
    assert np.allclose(np.asarray(cam.k_inv) @ k, np.eye(3), atol=1e-5)


def test_identity_pose_position(cam):
    assert np.allclose(np.asarray(cam.position), 0.0)


def test_pixel_to_camera_z_equals_depth(cam):
    pix = jnp.array([[100.0, 200.0], [331.0, 234.6]])
    depth = jnp.array([1500.0, 2000.0])
    pts = cam.pixel_to_camera(pix, depth)
    assert np.allclose(np.asarray(pts)[:, 2], np.asarray(depth), rtol=1e-6)


def test_principal_point_projects_to_centre(cam):
    # A point on the optical axis lands on (cx, cy) (rounded).
    pix = cam.world_to_pixel(jnp.array([0.0, 0.0, 1000.0]))
    assert np.asarray(pix).tolist() == [331.0, 235.0]


def test_pixel_camera_round_trip(cam):
    pix = jnp.array(
        [[0.0, 0.0], [639.0, 479.0], [320.0, 240.0], [17.0, 400.0]]
    )
    depth = jnp.array([800.0, 1200.0, 3000.0, 555.0])
    cam_pts = cam.pixel_to_camera(pix, depth)
    back = cam.camera_to_pixel(cam_pts)
    assert np.allclose(np.asarray(back), np.asarray(pix), atol=1.0)


def test_world_camera_round_trip():
    pose = np.eye(4, dtype=np.float32)
    pose[0:3, 3] = [100.0, -50.0, 250.0]
    # Rotate 90 deg about y.
    pose[0:3, 0:3] = [[0, 0, 1], [0, 1, 0], [-1, 0, 0]]
    cam = Camera.default_depth_camera(pose)
    pts = jnp.array([[10.0, 20.0, 30.0], [-500.0, 0.0, 1234.0]])
    rt = cam.camera_to_world(cam.world_to_camera(pts))
    assert np.allclose(np.asarray(rt), np.asarray(pts), atol=1e-2)


def test_move_to(cam):
    cam2 = cam.move_to(jnp.array([1.0, 2.0, 3.0]))
    assert np.allclose(np.asarray(cam2.position), [1.0, 2.0, 3.0])
    # Orientation untouched.
    assert np.allclose(
        np.asarray(cam2.rotation), np.asarray(cam.rotation)
    )


def test_look_at_straight_ahead(cam):
    # Camera at -z looking at origin faces +z (ref: Test_Camera.cpp
    # orientation cases).
    cam2 = cam.move_to(jnp.array([0.0, 0.0, -100.0])).look_at(
        jnp.array([0.0, 0.0, 0.0])
    )
    fwd = np.asarray(cam2.pose)[0:3, 2]
    assert np.allclose(fwd, [0.0, 0.0, 1.0], atol=1e-6)


def test_look_at_straight_down(cam):
    # Degenerate case: forward = -y, up becomes +z
    # (ref: Camera.cpp:166-172).
    cam2 = cam.move_to(jnp.array([0.0, 100.0, 0.0])).look_at(
        jnp.array([0.0, 0.0, 0.0])
    )
    pose = np.asarray(cam2.pose)
    assert np.allclose(pose[0:3, 2], [0.0, -1.0, 0.0], atol=1e-6)  # fwd
    assert np.allclose(pose[0:3, 1], [0.0, 0.0, 1.0], atol=1e-6)  # up


def test_look_at_preserves_orthonormality(cam):
    cam2 = cam.move_to(jnp.array([123.0, 45.0, -600.0])).look_at(
        jnp.array([10.0, -20.0, 400.0])
    )
    r = np.asarray(cam2.rotation)
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_world_to_camera_normal():
    pose = np.eye(4, dtype=np.float32)
    pose[0:3, 0:3] = [[0, 0, 1], [0, 1, 0], [-1, 0, 0]]
    cam = Camera.default_depth_camera(pose)
    n = cam.world_to_camera_normal(jnp.array([0.0, 0.0, 1.0]))
    # Rotation-only: unit length preserved.
    assert np.linalg.norm(np.asarray(n)) == pytest.approx(1.0, abs=1e-6)


def test_depth_map_to_vertices(cam):
    depth = np.zeros((6, 8), np.uint16)
    depth[3, 4] = 1000
    verts, mask = cam.depth_map_to_vertices(depth)
    assert np.asarray(mask).sum() == 1
    v = np.asarray(verts)[3, 4]
    assert v[2] == pytest.approx(1000.0, rel=1e-5)
    # Invalid pixels are zeroed, not sentinel floats.
    assert np.allclose(np.asarray(verts)[0, 0], 0.0)
