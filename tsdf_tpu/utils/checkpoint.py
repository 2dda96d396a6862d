"""Checkpoint/resume for volumes: binary .tsdf + orbax sharded.

The reference's checkpoint IS the .tsdf binary dump
(ref: TSDFVolume::save_to_file TSDFVolume.cu:911-1027, SURVEY.md §5),
kept byte-compatible in io/tsdf_file.py. For multi-host brick-sharded
volumes that single-file format would funnel everything through one
host, so this module adds an orbax-backed sharded checkpoint: each host
writes its own shards, restore re-places them on the given mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..volume import TSDFVolume


def save_sharded(vol: TSDFVolume, path: str) -> None:
    """Write an orbax checkpoint of the volume pytree (sharded arrays
    are written shard-per-host, no gather)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, vol)
        ckptr.wait_until_finished()


def load_sharded(path: str, like: TSDFVolume) -> TSDFVolume:
    """Restore a volume checkpoint.

    Args:
      like: a volume pytree with the target structure/shapes/shardings
        (e.g. ``parallel.shard_volume(make_volume(...), mesh)``); the
        restored arrays adopt its placement.
    """
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)
