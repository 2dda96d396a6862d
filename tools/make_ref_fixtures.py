"""Author byte-level reference-format fixtures (round-4 verdict item 6).

Constructs tests/fixtures/ref_writer.tsdf and ref_writer.blocktsdf with
raw struct packing, statement-for-statement to the REFERENCE writer's
layout — NOT via tsdf_tpu's own writers — so tests/test_ref_format.py
fails if tsdf_tpu's format drifts from the reference's, not merely from
itself.

.tsdf layout (ref: TSDFVolume::save_to_file, src/TSDF/TSDFVolume.cu:
994-1014; loading ctor :463-664). Field order and on-disk types follow
the ofs.write statements exactly:
    dim3   m_size               3 x u32 (x, y, z)   [no padding: dim3
                                is 3 unsigned ints, 12 bytes]
    float3 m_physical_size      3 x f32 mm          [float3 = 12 bytes,
                                4-byte aligned in host structs]
    float3 m_offset             3 x f32 mm
    float  m_truncation_distance
    float  m_max_weight
    float3 m_global_translation
    float3 m_global_rotation
  then 4 arrays over n = sx*sy*sz voxels, linear index
  x + y*sx + z*sx*sy (x fastest, TSDFVolume.hpp:165-167):
    distances    n x f32
    weights      n x f32
    colours      n x 3 u8   (uchar3)
    deformation  n x {float3 translation, float3 rotation} = n x 6 f32
                 (DeformationNode, TSDFVolume.hpp:23-26)

BlockTSDF text layout (ref: BlockTSDFLoader.cpp:20-150): header lines
"voxel_size= sx sy sz" / "physical_size= px py pz", then for each (x,y)
with x fastest (idx = sx*sy*z + sx*y + x, ++x then ++y on wrap,
BlockTSDFLoader.cpp:86-91) a distances-for-all-z line then a
weights-for-all-z line.
"""

import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "..", "tests", "fixtures")

SX, SY, SZ = 3, 2, 2  # distinct dims catch axis-order drift
N = SX * SY * SZ
PHYS = (300.0, 200.0, 250.0)
OFFSET = (-10.0, -20.0, 30.0)
TRUNC = 25.5
MAX_WEIGHT = 15.0  # ref default, TSDFVolume.cu:717
G_TRANS = (1.0, 2.0, 3.0)
G_ROT = (0.1, 0.2, 0.3)


def linear(x, y, z):
    # ref TSDFVolume.hpp:165-167
    return x + y * SX + z * SX * SY


def voxel_centre(x, y, z):
    # ref centre_of_voxel_at, TSDF_utilities.cu:10-21:
    # offset + (i + 0.5) * voxel_size
    vs = (PHYS[0] / SX, PHYS[1] / SY, PHYS[2] / SZ)
    return (
        OFFSET[0] + (x + 0.5) * vs[0],
        OFFSET[1] + (y + 0.5) * vs[1],
        OFFSET[2] + (z + 0.5) * vs[2],
    )


def make_tsdf_bytes() -> bytes:
    out = b""
    out += struct.pack("<3I", SX, SY, SZ)
    out += struct.pack("<3f", *PHYS)
    out += struct.pack("<3f", *OFFSET)
    out += struct.pack("<f", TRUNC)
    out += struct.pack("<f", MAX_WEIGHT)
    out += struct.pack("<3f", *G_TRANS)
    out += struct.pack("<3f", *G_ROT)
    assert len(out) == 68

    # distances: 100 + linear index; weights: 0.5 * linear index
    dist = [0.0] * N
    wt = [0.0] * N
    col = [0] * (N * 3)
    deform = [0.0] * (N * 6)
    for z in range(SZ):
        for y in range(SY):
            for x in range(SX):
                i = linear(x, y, z)
                dist[i] = 100.0 + i
                wt[i] = 0.5 * i
                col[3 * i : 3 * i + 3] = [i, 2 * i, 3 * i]
                cx, cy, cz = voxel_centre(x, y, z)
                # non-identity warp so loaders must materialize it
                deform[6 * i : 6 * i + 6] = [
                    cx + 1.0, cy - 2.0, cz + 0.5,
                    0.01 * i, -0.02 * i, 0.0,
                ]
    out += struct.pack(f"<{N}f", *dist)
    out += struct.pack(f"<{N}f", *wt)
    out += struct.pack(f"{N * 3}B", *col)
    out += struct.pack(f"<{N * 6}f", *deform)
    return out


def make_blocktsdf_text() -> str:
    lines = [
        f"voxel_size= {SX} {SY} {SZ}",
        f"physical_size= {PHYS[0]} {PHYS[1]} {PHYS[2]}",
    ]
    for y in range(SY):
        for x in range(SX):
            lines.append(
                " ".join(
                    repr(100.0 + float(linear(x, y, z)))
                    for z in range(SZ)
                )
            )
            lines.append(
                " ".join(
                    repr(0.5 * float(linear(x, y, z)))
                    for z in range(SZ)
                )
            )
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    with open(os.path.join(FIXDIR, "ref_writer.tsdf"), "wb") as f:
        f.write(make_tsdf_bytes())
    with open(os.path.join(FIXDIR, "ref_writer.blocktsdf"), "w") as f:
        f.write(make_blocktsdf_text())
    print("fixtures written to", os.path.abspath(FIXDIR))
