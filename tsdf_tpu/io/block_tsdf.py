"""Line-oriented text TSDF format ("BlockTSDF").

ref: src/TSDF/BlockTSDFLoader.cpp:20-150 — header lines
``voxel_size= sx sy sz`` and ``physical_size= px py pz``, then for each
(x, y) in x-fastest order an interleaved pair of lines: distances for
all z, then weights for all z. '#' comments and blank lines ignored.
The reference parses with a 6-state machine; numpy does it in bulk.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..volume import TSDFVolume, make_volume


def load_block_tsdf(path: str) -> TSDFVolume:
    lines = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            lines.append(line)
    if len(lines) < 2:
        raise ValueError(f"{path}: truncated BlockTSDF file")
    size = [int(v) for v in lines[0].split("=", 1)[1].split()]
    psize = [float(v) for v in lines[1].split("=", 1)[1].split()]
    sx, sy, sz = size
    if len(lines) != 2 + 2 * sx * sy:
        raise ValueError(
            f"{path}: expected {2 * sx * sy} data lines, got "
            f"{len(lines) - 2}"
        )
    data = np.loadtxt(lines[2:], dtype=np.float32, ndmin=2)
    if data.shape != (2 * sx * sy, sz):
        raise ValueError(f"{path}: bad data shape {data.shape}")
    # even rows = distances, odd rows = weights; row i covers
    # (x, y) = (i//2 % sx, i//2 // sx), columns are z
    dist_rows = data[0::2].reshape(sy, sx, sz)  # [y, x, z]
    weight_rows = data[1::2].reshape(sy, sx, sz)
    dist = np.transpose(dist_rows, (2, 0, 1))  # -> [z, y, x]
    weight = np.transpose(weight_rows, (2, 0, 1))

    vol = make_volume((sx, sy, sz), psize, offset=(0.0, 0.0, 0.0))
    return vol.replace(
        tsdf=jnp.asarray(dist), weight=jnp.asarray(weight)
    )


def save_block_tsdf(vol: TSDFVolume, path: str) -> None:
    sx, sy, sz = vol.size
    dist = np.asarray(vol.tsdf)  # [z, y, x]
    weight = np.asarray(vol.weight)
    with open(path, "w") as f:
        f.write(f"voxel_size= {sx} {sy} {sz}\n")
        ps = np.asarray(vol.physical_size)
        f.write(f"physical_size= {ps[0]} {ps[1]} {ps[2]}\n")
        for y in range(sy):
            for x in range(sx):
                f.write(" ".join(repr(float(v)) for v in dist[:, y, x]))
                f.write("\n")
                f.write(" ".join(repr(float(v)) for v in weight[:, y, x]))
                f.write("\n")
