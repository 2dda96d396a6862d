"""Integration-op tests against analytic scenes.

The reference's integration "tests" are golden-image smoke tests with no
EXPECTs (ref: Test_TSDF_Integration.cpp:24-121); here the projective-TSDF
math (ref: integrate_kernel TSDFVolume.cu:337-390) is asserted directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import Camera, make_volume, integrate
from tsdf_tpu.utils.fixtures import wall_depth_map


W, H = 64, 48


def _camera():
    # Small synthetic intrinsics so the 64x48 image covers the volume.
    return Camera.from_intrinsics(40.0, 40.0, W / 2.0, H / 2.0)


def test_wall_integration_projective_sdf():
    vol = make_volume((32, 32, 32), 1600.0)
    cam = _camera()
    wall_z = 800.0
    depth = np.full((H, W), wall_z, np.uint16)
    vol = integrate(vol, jnp.asarray(depth), cam)

    tsdf = np.asarray(vol.tsdf)
    weight = np.asarray(vol.weight)
    centres = np.asarray(vol.voxel_centres())
    trunc = float(vol.truncation_distance)

    # Project voxel centres; pick ones safely inside the frustum.
    k = np.asarray(cam.k)
    z = centres[..., 2]
    px = np.round(k[0, 0] * centres[..., 0] / z + k[0, 2])
    py = np.round(k[1, 1] * centres[..., 1] / z + k[1, 2])
    in_view = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z > 0)

    expected_sdf = wall_z - z
    updated = in_view & (expected_sdf >= -trunc)

    # Weight counts one update (ref: no-cap weighted mean :374-384).
    assert np.array_equal(weight[updated], np.ones(updated.sum()))
    assert np.array_equal(weight[~updated], np.zeros((~updated).sum()))

    # TSDF equals positive-clamped projective sdf where updated.
    want = np.minimum(expected_sdf, trunc)
    assert np.allclose(tsdf[updated], want[updated], atol=1e-3)
    # Untouched voxels keep the +trunc clear value.
    assert np.allclose(tsdf[~updated], trunc, atol=1e-5)


def test_running_weighted_mean():
    vol = make_volume((16, 16, 16), 1600.0)
    cam = _camera()
    d1 = jnp.full((H, W), 700.0, jnp.float32)
    d2 = jnp.full((H, W), 900.0, jnp.float32)
    vol = integrate(vol, d1, cam)
    vol = integrate(vol, d2, cam)
    tsdf = np.asarray(vol.tsdf)
    weight = np.asarray(vol.weight)
    centres = np.asarray(vol.voxel_centres())
    trunc = float(vol.truncation_distance)

    # A voxel on the optical axis seen by both frames.
    idx = np.unravel_index(
        np.argmin(
            np.abs(centres[..., 0])
            + np.abs(centres[..., 1])
            + np.abs(centres[..., 2] - 650.0)
        ),
        tsdf.shape,
    )
    z = centres[idx][2]
    w1 = min(700.0 - z, trunc)
    w2 = min(900.0 - z, trunc)
    assert weight[idx] == pytest.approx(2.0)
    assert tsdf[idx] == pytest.approx((w1 + w2) / 2.0, abs=1e-3)


def test_zero_depth_ignored():
    vol = make_volume((16, 16, 16), 1600.0)
    cam = _camera()
    depth = jnp.zeros((H, W), jnp.uint16)
    out = integrate(vol, depth, cam)
    assert np.allclose(np.asarray(out.tsdf), np.asarray(vol.tsdf))
    assert np.allclose(np.asarray(out.weight), 0.0)


def test_behind_surface_discard():
    # Voxels more than trunc behind the surface are never touched
    # (ref: TSDFVolume.cu:365 sdf >= -trunc gate).
    vol = make_volume((16, 16, 16), 1600.0)
    cam = _camera()
    trunc = float(vol.truncation_distance)
    depth = jnp.full((H, W), 200.0, jnp.float32)
    vol = integrate(vol, depth, cam)
    centres = np.asarray(vol.voxel_centres())
    weight = np.asarray(vol.weight)
    far_behind = centres[..., 2] > 200.0 + trunc + 1.0
    assert weight[far_behind].sum() == 0


def test_cap_weight():
    vol = make_volume((8, 8, 8), 1600.0, max_weight=3.0)
    cam = _camera()
    depth = jnp.full((H, W), 800.0, jnp.float32)
    for _ in range(5):
        vol = integrate(vol, depth, cam, cap_weight=True)
    assert np.asarray(vol.weight).max() <= 3.0


def test_jit_and_grad_through_pose():
    # Pose gradients flow through the projective-SDF term.
    vol = make_volume((8, 8, 8), 1600.0)
    depth = jnp.full((H, W), 800.0, jnp.float32)

    def loss(tz):
        pose = jnp.eye(4).at[2, 3].set(tz)
        cam = _camera().set_pose(pose)
        out = integrate(vol, depth, cam)
        return jnp.sum(out.tsdf**2)

    g = jax.grad(loss)(jnp.float32(0.0))
    assert np.isfinite(float(g))
    assert float(g) != 0.0


def test_color_fusion():
    """Per-voxel colour running mean — the capability the reference
    allocates but never writes (SURVEY.md §2.1)."""
    import jax.numpy as jnp
    from tsdf_tpu.utils import fixtures

    vol = make_volume(
        (32, 32, 32), 1000.0, offset=(-500.0, -500.0, 0.0), with_color=True
    )
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -300.0])
        .look_at([0.0, 0.0, 500.0])
    )
    depth = jnp.asarray(fixtures.sphere_depth_map(640, 480, 120.0, 400.0, 800.0))
    rgb = jnp.broadcast_to(
        jnp.array([200, 80, 30], jnp.uint8), (480, 640, 3)
    )
    out = integrate(vol, depth, cam, rgb=rgb)
    col = np.asarray(out.color)
    painted = (col != 0).any(-1)
    assert painted.sum() > 50
    np.testing.assert_array_equal(
        np.unique(col[painted], axis=0), [[200, 80, 30]]
    )
    # colour stays within the truncation band; tsdf/weight unchanged vs
    # colourless integrate
    ref = integrate(vol.replace(color=None), depth, cam)
    np.testing.assert_array_equal(np.asarray(out.tsdf), np.asarray(ref.tsdf))
    band = np.asarray(
        (jnp.abs(out.tsdf) < out.truncation_distance) & (out.weight > 0)
    )
    assert not painted[~band].any()


def test_color_requires_color_field():
    import jax.numpy as jnp
    import pytest as _pytest

    vol = make_volume((8, 8, 8), 100.0)
    cam = Camera.default_depth_camera()
    with _pytest.raises(ValueError):
        integrate(
            vol, jnp.zeros((48, 64)), cam, rgb=jnp.zeros((48, 64, 3), jnp.uint8)
        )


def test_integrate_bf16_storage_close_to_f32():
    # bf16 tsdf/weight storage: compute stays f32, results within bf16
    # rounding of the f32 path; weights (small ints) stay exact.
    import jax.numpy as jnp
    from tsdf_tpu import Camera, integrate, make_volume
    from tsdf_tpu.utils import fixtures

    vol32 = make_volume((32, 32, 32), 2000.0, offset=(-1000, -1000, 0))
    vol16 = vol32.astype(jnp.bfloat16)
    cam = (
        Camera.default_depth_camera()
        .move_to([0.0, 0.0, -500.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    depth = fixtures.sphere_depth_map(64, 48, 20.0, 800.0, 1200.0)
    for _ in range(3):
        vol32 = integrate(vol32, depth, cam)
        vol16 = integrate(vol16, depth, cam)
    assert vol16.tsdf.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(vol16.weight, np.float32), np.asarray(vol32.weight)
    )
    # trunc ~ 119mm at this grid; bf16 relative step is 2^-8
    d16 = np.asarray(vol16.tsdf, np.float32)
    d32 = np.asarray(vol32.tsdf)
    assert np.max(np.abs(d16 - d32)) < np.max(np.abs(d32)) * 2**-7
