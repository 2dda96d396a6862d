"""Deformation-field warp: identity, translation, global rotation."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import make_volume
from tsdf_tpu.ops.deform import deform_points
from tsdf_tpu.utils.se3 import euler_to_matrix


def _vol():
    return make_volume(
        (16, 16, 16), 1600.0, offset=(0.0, 0.0, 0.0), with_deformation=True
    )


def test_identity_warp_is_identity():
    vol = _vol()
    pts = jnp.array([[800.0, 800.0, 800.0], [123.0, 456.0, 789.0]])
    warped, valid = deform_points(vol, pts)
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(warped), np.asarray(pts), atol=1e-3)


def test_uniform_translation():
    vol = _vol()
    shift = jnp.array([10.0, -20.0, 5.0])
    vol = vol.replace(deform=vol.deform + shift)
    pts = jnp.array([[800.0, 800.0, 800.0]])
    warped, valid = deform_points(vol, pts)
    np.testing.assert_allclose(
        np.asarray(warped), np.asarray(pts + shift), atol=1e-3
    )


def test_global_rotation_translation():
    vol = _vol()
    rot = jnp.array([0.1, -0.2, 0.3])
    trans = jnp.array([5.0, 6.0, 7.0])
    vol = vol.replace(global_rotation=rot, global_translation=trans)
    pts = jnp.array([[800.0, 400.0, 200.0]])
    warped, _ = deform_points(vol, pts)
    expect = pts @ euler_to_matrix(rot).T + trans
    np.testing.assert_allclose(np.asarray(warped), np.asarray(expect), atol=1e-2)


def test_out_of_volume_passthrough():
    vol = _vol()
    pts = jnp.array([[-100.0, 0.0, 0.0]])
    warped, valid = deform_points(vol, pts)
    assert not bool(valid[0])
    np.testing.assert_array_equal(np.asarray(warped), np.asarray(pts))
