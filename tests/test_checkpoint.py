"""Sharded checkpoint round trip on the 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsdf_tpu import make_volume
from tsdf_tpu.parallel import make_mesh, shard_volume
from tsdf_tpu.utils.checkpoint import load_sharded, save_sharded
from tsdf_tpu.utils import fixtures


def test_sharded_roundtrip(tmp_path):
    mesh = make_mesh(n_bricks=4, n_rays=2)
    vol = make_volume((16, 16, 16), 1000.0, offset=(0.0, 0.0, 0.0))
    vol = fixtures.sphere_tsdf(vol, 300.0)
    svol = shard_volume(vol, mesh)

    path = tmp_path / "ckpt"
    save_sharded(svol, str(path))

    like = shard_volume(
        make_volume((16, 16, 16), 1000.0, offset=(0.0, 0.0, 0.0)), mesh
    )
    out = load_sharded(str(path), like)
    np.testing.assert_array_equal(np.asarray(out.tsdf), np.asarray(vol.tsdf))
    np.testing.assert_array_equal(
        np.asarray(out.weight), np.asarray(vol.weight)
    )
    # restored with the mesh sharding
    assert out.tsdf.sharding.spec == svol.tsdf.sharding.spec
