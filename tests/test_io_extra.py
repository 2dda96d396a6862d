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
