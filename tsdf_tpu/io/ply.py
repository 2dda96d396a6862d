"""ASCII PLY mesh writer (ref: src/Utilities/ply.cpp:6-30)."""

from __future__ import annotations

import numpy as np


def write_ply(path, vertices, triangles, colors=None) -> None:
    """vertices: (N, 3) float mm; triangles: (M, 3) int vertex indices;
    colors: optional (N, 3) u8 RGB per vertex (beyond reference — the
    reference's writer is position-only)."""
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int64)
    if colors is not None:
        colors = np.asarray(colors, dtype=np.uint8)
        if len(colors) != len(vertices):
            raise ValueError(
                f"{len(colors)} colours for {len(vertices)} vertices"
            )
    with open(path, "w") as f:
        f.write("ply\n")
        f.write("format ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\n"
            )
        f.write(f"element face {len(triangles)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        if colors is None:
            for v in vertices:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
        else:
            for v, c in zip(vertices, colors):
                f.write(
                    f"{v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n"
                )
        for t in triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
