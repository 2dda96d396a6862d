"""Slab-sweep raycaster (interpret mode) vs the lax reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import Camera, make_volume, raycast
from tsdf_tpu.kernels.raycast import raycast_pallas
from tsdf_tpu.utils import fixtures

W, H = 160, 120
FX, FY, CX, CY = 591.1 / 4, 590.1 / 4, 331.0 / 4, 234.6 / 4


def _vol():
    vol = make_volume((64,) * 3, 2000.0, offset=(-1000.0, -1000.0, 0.0))
    return fixtures.sphere_tsdf(vol, 400.0)


def _check(vol, cam, min_agree=0.999):
    vr, nr = raycast(vol, cam, width=W, height=H)
    vp, npm = raycast_pallas(vol, cam, width=W, height=H, interpret=True)
    vr, vp = np.asarray(vr), np.asarray(vp)
    hr = np.isfinite(vr).all(-1)
    hp = np.isfinite(vp).all(-1)
    # grazing rays at silhouettes may differ between sampling schemes
    assert (hr == hp).mean() >= min_agree
    both = hr & hp
    err = np.linalg.norm(vr[both] - vp[both], axis=-1)
    assert np.median(err) < 1.0, np.median(err)
    assert np.percentile(err, 99) < 5.0
    # normals agree away from boundaries
    dot = (np.asarray(nr)[both] * np.asarray(npm)[both]).sum(-1)
    assert np.median(dot) > 0.999


def test_forward_camera():
    cam = (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([150.0, -100.0, -600.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    _check(_vol(), cam)


def test_reversed_sweep():
    cam = (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([0.0, 0.0, 2600.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    _check(_vol(), cam)


def test_camera_inside_volume():
    cam = (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([0.0, 0.0, 100.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    _check(_vol(), cam)


def test_nonaligned_grid():
    vol = make_volume((50, 40, 30), 1500.0, offset=(-750.0, -600.0, 0.0))
    vol = fixtures.sphere_tsdf(vol, 250.0, centre=(0.0, 0.0, 700.0))
    cam = (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([0.0, 0.0, -300.0])
        .look_at([0.0, 0.0, 700.0])
    )
    vr, _ = raycast(vol, cam, width=W, height=H)
    vp, _ = raycast_pallas(vol, cam, width=W, height=H, interpret=True)
    hr = np.isfinite(np.asarray(vr)).all(-1)
    hp = np.isfinite(np.asarray(vp)).all(-1)
    assert (hr == hp).mean() > 0.995  # grid-boundary pixels may differ
    both = hr & hp
    err = np.linalg.norm(np.asarray(vr)[both] - np.asarray(vp)[both], axis=-1)
    assert np.median(err) < 2.0


def test_all_principal_view_axes():
    """The sweep axis follows the camera: all six axis-aligned-ish views
    agree with the lax reference."""
    vol = make_volume((64, 48, 56), 2000.0, offset=(-1000.0, -1000.0, -1000.0))
    vol = fixtures.sphere_tsdf(vol, 350.0, centre=(0.0, 0.0, 0.0))
    views = [
        [100.0, -50.0, -1600.0],
        [0.0, 80.0, 1600.0],
        [-1600.0, 50.0, 100.0],
        [1600.0, -80.0, 0.0],
        [100.0, -1600.0, 50.0],
        [0.0, 1600.0, -100.0],
    ]
    for pos in views:
        cam = (
            Camera.from_intrinsics(147.775, 147.525, 82.75, 58.65)
            .move_to(pos)
            .look_at([0.0, 0.0, 0.0])
        )
        vr, _ = raycast(vol, cam, width=W, height=H)
        vp, _ = raycast_pallas(vol, cam, width=W, height=H, interpret=True)
        hr = np.isfinite(np.asarray(vr)).all(-1)
        hp = np.isfinite(np.asarray(vp)).all(-1)
        assert (hr == hp).mean() > 0.999, pos
        b = hr & hp
        e = np.linalg.norm(np.asarray(vr)[b] - np.asarray(vp)[b], axis=-1)
        assert np.median(e) < 2.0, pos


def test_raycast_pallas_bf16_volume():
    import jax.numpy as jnp
    from tsdf_tpu import Camera, make_volume
    from tsdf_tpu.kernels.raycast import raycast_pallas
    from tsdf_tpu.utils import fixtures

    vol = _vol()
    cam = (
        Camera.from_intrinsics(FX, FY, CX, CY)
        .move_to([0.0, 0.0, -500.0])
        .look_at([0.0, 0.0, 1000.0])
    )
    v32, _ = raycast_pallas(vol, cam, width=W, height=H, interpret=True)
    v16, _ = raycast_pallas(
        vol.astype(jnp.bfloat16), cam, width=W, height=H, interpret=True
    )
    hit32 = np.isfinite(np.asarray(v32)).all(-1)
    hit16 = np.isfinite(np.asarray(v16)).all(-1)
    assert (hit32 == hit16).mean() > 0.99
    both = hit32 & hit16
    err = np.linalg.norm(np.asarray(v32)[both] - np.asarray(v16)[both], axis=-1)
    assert np.median(err) < 5.0  # mm; bf16 tsdf quantization
