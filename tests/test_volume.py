"""TSDFVolume state tests (ref semantics: src/TSDF/TSDFVolume.cu)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import make_volume


def test_geometry():
    vol = make_volume((16, 8, 4), (1600.0, 800.0, 400.0))
    assert vol.size == (16, 8, 4)
    assert np.allclose(np.asarray(vol.voxel_size), [100.0, 100.0, 100.0])
    # trunc = 1.1 * ||voxel_size|| (ref: TSDFVolume.cu:693).
    assert float(vol.truncation_distance) == pytest.approx(
        1.1 * np.sqrt(3 * 100.0**2), rel=1e-5
    )
    # Default offset centres x/y, z starts at 0 (ref: kinfu.cpp:23-31).
    assert np.allclose(np.asarray(vol.offset), [-800.0, -400.0, 0.0])


def test_clear_semantics():
    vol = make_volume((4, 4, 4), 400.0)
    # distances init to +trunc NOT 0 (ref: TSDFVolume.cu:811-845).
    assert np.allclose(
        np.asarray(vol.tsdf), float(vol.truncation_distance)
    )
    assert np.allclose(np.asarray(vol.weight), 0.0)


def test_voxel_centres():
    vol = make_volume((4, 4, 4), 400.0, offset=(0.0, 0.0, 0.0))
    c = np.asarray(vol.voxel_centres())
    # centre = (idx + 0.5) * voxel (ref: TSDF_utilities.cu:10-17).
    assert np.allclose(c[0, 0, 0], [50.0, 50.0, 50.0])
    assert np.allclose(c[3, 2, 1], [150.0, 250.0, 350.0])
    # Layout is [z, y, x] with components (x, y, z).
    assert np.allclose(c[1, 0, 0], [50.0, 50.0, 150.0])


def test_ravel_order_matches_reference_linear_index():
    # flat index = x + y*sx + z*sx*sy (ref: TSDFVolume.hpp:165-167).
    vol = make_volume((3, 4, 5), (3.0, 4.0, 5.0))
    sx, sy, sz = vol.size
    marked = vol.tsdf.at[2, 3, 1].set(-99.0)  # z=2, y=3, x=1
    flat = np.asarray(marked).ravel()
    assert flat[1 + 3 * sx + 2 * sx * sy] == -99.0


def test_identity_deformation():
    vol = make_volume((4, 4, 4), 400.0, with_deformation=True)
    assert np.allclose(
        np.asarray(vol.deform), np.asarray(vol.voxel_centres())
    )
    assert np.allclose(np.asarray(vol.deform_rot), 0.0)
