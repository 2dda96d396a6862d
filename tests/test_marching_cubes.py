"""Marching cubes: table derivation properties + surface extraction.

Gate per SURVEY.md §7 stage 3: vertices land on the analytic surface of
a sphere TSDF (ref: test_MC_main.cpp builds the same fixture), and —
stronger than the reference, whose canonical table can leak in ambiguous
configs — the extracted mesh is watertight.
"""

import numpy as np
import pytest

from tsdf_tpu import make_volume
from tsdf_tpu.ops.marching_cubes import extract_surface, soup_to_numpy
from tsdf_tpu.ops.mc_tables import (
    EDGE_CORNERS,
    EDGE_TABLE,
    TRI_TABLE,
    TRI_COUNTS,
)
from tsdf_tpu.utils import fixtures


def test_tables_structure():
    assert TRI_COUNTS[0] == 0 and TRI_COUNTS[255] == 0
    assert TRI_COUNTS.max() == 5  # canonical worst case
    for c in range(256):
        edges = TRI_TABLE[c][TRI_TABLE[c] >= 0]
        # every used edge is a sign-crossing edge for this config
        for e in edges:
            a, b = EDGE_CORNERS[e]
            assert ((c >> a) & 1) != ((c >> b) & 1), (c, e)
        # and the used edge set is exactly the crossing set
        crossing = {
            e
            for e in range(12)
            if ((c >> EDGE_CORNERS[e][0]) & 1)
            != ((c >> EDGE_CORNERS[e][1]) & 1)
        }
        assert set(edges.tolist()) == crossing, c


def test_complement_configs_same_edges():
    for c in range(256):
        assert EDGE_TABLE[c] == EDGE_TABLE[255 - c]


def _sphere_soup(n=32, radius=300.0):
    vol = make_volume((n, n, n), 1000.0, offset=(-500.0, -500.0, -500.0))
    vol = fixtures.sphere_tsdf(vol, radius, centre=(0.0, 0.0, 0.0))
    soup = extract_surface(vol, max_cubes=1 << 14, max_vertices=1 << 16)
    assert not bool(soup.overflowed)
    return vol, soup


def test_sphere_vertices_on_surface():
    vol, soup = _sphere_soup()
    verts, tris = soup_to_numpy(soup)
    assert len(verts) > 1000
    r = np.linalg.norm(verts, axis=-1)
    # linear interpolation of an exact SDF: vertices lie on the sphere
    # up to curvature error << voxel (31mm)
    assert np.abs(r - 300.0).max() < 4.0


def test_sphere_mesh_watertight():
    _, soup = _sphere_soup()
    verts, tris = soup_to_numpy(soup)
    # quantize vertex positions to merge duplicates
    key = np.round(verts * 1024).astype(np.int64)
    _, inv = np.unique(key, axis=0, return_inverse=True)
    fv = inv[tris]
    edges = np.concatenate(
        [fv[:, [0, 1]], fv[:, [1, 2]], fv[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), "mesh has boundary or non-manifold edges"


def test_sphere_normals_outward():
    _, soup = _sphere_soup()
    verts, tris = soup_to_numpy(soup)
    tv = verts[tris]
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    centroid = tv.mean(axis=1)
    agree = (n * centroid).sum(-1) > 0
    assert agree.mean() > 0.99


def test_degenerate_empty_volume():
    vol = make_volume((8, 8, 8), 100.0)
    soup = extract_surface(vol, max_cubes=64, max_vertices=256)
    assert int(soup.n_vertices) == 0
    assert not bool(soup.overflowed)


def test_overflow_flag():
    vol, _ = _sphere_soup()
    soup = extract_surface(vol, max_cubes=16, max_vertices=32)
    assert bool(soup.overflowed)
