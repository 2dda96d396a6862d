"""Trilinear sampling tests (ref: GPURaycaster.cu:53-124 semantics)."""

import jax.numpy as jnp
import numpy as np

from tsdf_tpu import make_volume
from tsdf_tpu.ops.trilinear import (
    trilinear_sample,
    trilinear_weights_and_indices,
)


def _linear_field(vol, a=2.0, b=-3.0, c=0.5, d=10.0):
    cen = np.asarray(vol.voxel_centres())
    f = a * cen[..., 0] + b * cen[..., 1] + c * cen[..., 2] + d
    return vol.replace(tsdf=jnp.asarray(f, jnp.float32))


def test_exact_at_voxel_centres():
    vol = make_volume((8, 8, 8), 800.0, offset=(0.0, 0.0, 0.0))
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(8, 8, 8)).astype(np.float32)
    vol = vol.replace(tsdf=jnp.asarray(vals))
    # Grid-local centre of voxel (x,y,z) = (idx + 0.5) * 100.
    pts = jnp.array(
        [
            [50.0, 50.0, 50.0],
            [350.0, 150.0, 750.0],
            [750.0, 750.0, 750.0],
        ]
    )
    got = np.asarray(trilinear_sample(vol.tsdf, pts, vol.voxel_size))
    want = [vals[0, 0, 0], vals[7, 1, 3], vals[7, 7, 7]]
    assert np.allclose(got, want, atol=1e-5)


def test_reproduces_linear_field_in_interior():
    vol = make_volume((8, 8, 8), 800.0, offset=(0.0, 0.0, 0.0))
    vol = _linear_field(vol)
    rng = np.random.default_rng(1)
    # Interior points at least one voxel away from the border.
    pts = rng.uniform(150.0, 650.0, size=(64, 3)).astype(np.float32)
    got = np.asarray(
        trilinear_sample(vol.tsdf, jnp.asarray(pts), vol.voxel_size)
    )
    # Grid-local == world here since offset is 0.
    want = 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 0.5 * pts[:, 2] + 10.0
    assert np.allclose(got, want, rtol=1e-4, atol=1e-2)


def test_border_clamping_no_nan():
    vol = make_volume((4, 4, 4), 400.0, offset=(0.0, 0.0, 0.0))
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],
            [399.9, 399.9, 399.9],
            [400.0, 400.0, 400.0],  # on the far face -> pulled back
            [-5.0, 200.0, 200.0],  # negative -> clamped to 0
        ]
    )
    got = np.asarray(trilinear_sample(vol.tsdf, pts, vol.voxel_size))
    assert np.isfinite(got).all()


def test_weights_sum_to_one_and_match_sample():
    vol = make_volume((8, 8, 8), 800.0, offset=(0.0, 0.0, 0.0))
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(8, 8, 8)).astype(np.float32)
    vol = vol.replace(tsdf=jnp.asarray(vals))
    pts = jnp.asarray(
        rng.uniform(50.0, 750.0, size=(32, 3)).astype(np.float32)
    )
    lin, wts = trilinear_weights_and_indices(
        vol.tsdf.shape, pts, vol.voxel_size
    )
    assert np.allclose(np.asarray(wts).sum(-1), 1.0, atol=1e-5)
    manual = (np.asarray(vals).ravel()[np.asarray(lin)] * np.asarray(wts)).sum(-1)
    direct = np.asarray(trilinear_sample(vol.tsdf, pts, vol.voxel_size))
    assert np.allclose(manual, direct, atol=1e-5)
