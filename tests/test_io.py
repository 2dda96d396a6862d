"""I/O tests: .tsdf byte-format, PNG round trips, TUM parsing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import make_volume
from tsdf_tpu.io import (
    DepthImage,
    load_png,
    save_png,
    load_tsdf,
    save_tsdf,
    write_ply,
)
from tsdf_tpu.io.tsdf_file import HEADER_BYTES
from tsdf_tpu.io.tum import TUMDataLoader, tum_pose_matrix


def test_tsdf_round_trip(tmp_path):
    vol = make_volume((6, 5, 4), (600.0, 500.0, 400.0), with_deformation=True)
    rng = np.random.default_rng(0)
    vol = vol.replace(
        tsdf=jnp.asarray(rng.normal(size=(4, 5, 6)).astype(np.float32)),
        weight=jnp.asarray(
            rng.uniform(0, 10, size=(4, 5, 6)).astype(np.float32)
        ),
    )
    path = tmp_path / "vol.tsdf"
    save_tsdf(vol, path)
    back = load_tsdf(str(path))
    assert back.size == vol.size
    assert np.allclose(np.asarray(back.tsdf), np.asarray(vol.tsdf))
    assert np.allclose(np.asarray(back.weight), np.asarray(vol.weight))
    # an identity warp field is detected on load and dropped (it would
    # cost 6x memory and demote integrate to the non-rigid path)
    assert back.deform is None
    assert np.allclose(
        np.asarray(back.physical_size), np.asarray(vol.physical_size)
    )
    assert float(back.truncation_distance) == pytest.approx(
        float(vol.truncation_distance)
    )

    # a real (non-identity) warp field round-trips
    vol2 = vol.replace(deform=vol.deform + 7.0)
    save_tsdf(vol2, path)
    back2 = load_tsdf(str(path))
    assert back2.deform is not None
    assert np.allclose(np.asarray(back2.deform), np.asarray(vol2.deform))


def test_tsdf_binary_layout(tmp_path):
    # Byte-compatible with the reference dump format
    # (ref: TSDFVolume.cu:994-1014): 68-byte header then f32/f32/u8x3/f32x6.
    vol = make_volume((3, 3, 3), 300.0)
    path = tmp_path / "vol.tsdf"
    save_tsdf(vol, path)
    n = 27
    expect = HEADER_BYTES + n * 4 + n * 4 + n * 3 + n * 24
    assert os.path.getsize(path) == expect
    with open(path, "rb") as f:
        raw = f.read(HEADER_BYTES)
    size = np.frombuffer(raw[0:12], np.uint32)
    assert size.tolist() == [3, 3, 3]
    trunc = np.frombuffer(raw[36:40], np.float32)[0]
    assert trunc == pytest.approx(float(vol.truncation_distance))


def test_depth_png_round_trip(tmp_path):
    depth = np.random.default_rng(1).integers(
        0, 5000, size=(48, 64), dtype=np.uint16
    )
    path = tmp_path / "depth.png"
    save_png(path, depth)
    back = load_png(path)
    assert back.dtype == np.uint16
    assert np.array_equal(back, depth)


def test_depth_image_ops(tmp_path):
    depth = np.zeros((10, 10), np.uint16)
    depth[5, 5] = 5000
    depth[2, 2] = 1000
    di = DepthImage(depth)
    scaled = di.scale_depth(0.2)  # TUM 1/5000m -> mm
    assert scaled.data[5, 5] == 1000
    truncated = scaled.truncate_depth_to(500)
    assert truncated.data[5, 5] == 0
    assert truncated.data[2, 2] == 200
    assert truncated.min_max() == (200, 200)


def test_tum_pose_matrix_identity():
    pose = tum_pose_matrix([1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0])
    assert np.allclose(pose[0:3, 0:3], np.eye(3))
    assert np.allclose(pose[0:3, 3], [1000.0, 2000.0, 3000.0])


def test_tum_pose_matrix_rotation():
    # 180 deg about z: q = (0, 0, 1, 0).
    pose = tum_pose_matrix([0, 0, 0, 0.0, 0.0, 1.0, 0.0])
    want = np.diag([-1.0, -1.0, 1.0])
    assert np.allclose(pose[0:3, 0:3], want, atol=1e-6)
    # Rotation is orthonormal for an arbitrary unit quaternion.
    q = np.array([0.1, -0.4, 0.2, 0.88])
    q = q / np.linalg.norm(q)
    pose = tum_pose_matrix([0, 0, 0, *q])
    r = pose[0:3, 0:3]
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_tum_loader(tmp_path):
    d = tmp_path / "tum"
    (d / "depth").mkdir(parents=True)
    depth = np.full((8, 8), 5000, np.uint16)
    save_png(d / "depth" / "123.456.png", depth)
    with open(d / "ground_truth.txt", "w") as f:
        f.write("# comment line\n")
        f.write("123.456 1.0 0.0 0.5 0.0 0.0 0.0 1.0\n")
    loader = TUMDataLoader(str(d))
    assert len(loader) == 1
    img, pose = loader.next()
    assert img.data[0, 0] == 1000  # x 0.2 scaling applied
    assert np.allclose(pose[0:3, 3], [1000.0, 0.0, 500.0])
    img2, pose2 = loader.next()
    assert img2 is None and pose2 is None


def test_ply_writer(tmp_path):
    path = tmp_path / "mesh.ply"
    write_ply(
        path,
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        [[0, 1, 2]],
    )
    text = path.read_text().splitlines()
    assert text[0] == "ply"
    assert "element vertex 3" in text
    assert "element face 1" in text
    assert text[-1] == "3 0 1 2"
