"""PGM + BlockTSDF text format round trips."""

import numpy as np

from tsdf_tpu import make_volume
from tsdf_tpu.io.block_tsdf import load_block_tsdf, save_block_tsdf
from tsdf_tpu.io.pgm import (
    load_pgm,
    read_nyu_depth_map,
    save_pgm,
)
from tsdf_tpu.utils import fixtures


def test_pgm_u16_roundtrip(tmp_path):
    img = (np.arange(48, dtype=np.uint16) * 1000).reshape(6, 8)
    p = tmp_path / "x.pgm"
    save_pgm(str(p), img)
    out = load_pgm(str(p))
    np.testing.assert_array_equal(out, img)


def test_pgm_u8_roundtrip(tmp_path):
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    p = tmp_path / "x.pgm"
    save_pgm(str(p), img)
    np.testing.assert_array_equal(load_pgm(str(p)), img)


def test_nyu_byteswap(tmp_path):
    # NYU files are little-endian on disk; emulate by writing raw LE
    img = np.array([[0x1234, 0xABCD]], np.uint16)
    p = tmp_path / "nyu.pgm"
    with open(p, "wb") as f:
        f.write(b"P5\n2 1\n65535\n")
        f.write(img.astype("<u2").tobytes())
    out = read_nyu_depth_map(str(p))
    np.testing.assert_array_equal(out, img)


def test_block_tsdf_roundtrip(tmp_path):
    vol = make_volume((6, 5, 4), (600.0, 500.0, 400.0), offset=(0, 0, 0))
    vol = fixtures.sphere_tsdf(vol, 150.0)
    p = tmp_path / "vol.txt"
    save_block_tsdf(vol, str(p))
    out = load_block_tsdf(str(p))
    assert out.size == (6, 5, 4)
    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(vol.tsdf), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.weight), np.asarray(vol.weight), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.physical_size), [600.0, 500.0, 400.0]
    )


def test_block_tsdf_comments_and_blanks(tmp_path):
    vol = make_volume((2, 2, 2), 200.0, offset=(0, 0, 0))
    p = tmp_path / "vol.txt"
    save_block_tsdf(vol, str(p))
    txt = "# comment\n\n" + p.read_text()
    p.write_text(txt)
    out = load_block_tsdf(str(p))
    assert out.size == (2, 2, 2)


def test_fl_2_uchar(tmp_path):
    # ref: src/Tools/fl_2_uchar.c:28-71 (intended normalisation; the
    # reference's bare *255 overflow bug is not replicated)
    from tsdf_tpu.io.convert import fl_2_uchar

    rng = np.random.RandomState(0)
    data = rng.uniform(-4.0, 9.0, size=(2, 3, 4)).astype(np.float32)
    src = tmp_path / "vol.fl"
    with open(src, "wb") as f:
        np.array([4, 3, 2], np.uint32).tofile(f)  # x, y, z
        np.array([1.0, 1.0, 1.0], np.float32).tofile(f)
        data.ravel().tofile(f)
    dst = tmp_path / "vol.u8"
    lo, hi = fl_2_uchar(str(src), str(dst))
    out = np.fromfile(dst, np.uint8)
    assert out.size == data.size
    assert lo == float(data.min()) and hi == float(data.max())
    expect = np.clip(
        (data.ravel() - lo) * (255.0 / (hi - lo)), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)
