"""Device-mesh construction and sharding specs for TSDF volumes.

The distributed layer the reference lacks (SURVEY.md §5 "Distributed
communication backend: none"). Axis names: "b" = volume z-bricks,
"r" = ray tiles.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..volume import TSDFVolume


def make_mesh(
    n_bricks: Optional[int] = None,
    n_rays: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("b", "r") mesh over the available devices.

    Defaults to all devices on the brick axis. Brick sharding is the memory
    axis (each device owns a z-slab of the volume); the ray axis adds
    throughput for rendering/tracking-heavy workloads.
    """
    if devices is None:
        devices = jax.devices()
    if n_bricks is None:
        n_bricks = len(devices) // n_rays
    devs = np.asarray(devices[: n_bricks * n_rays]).reshape(
        n_bricks, n_rays
    )
    return Mesh(devs, axis_names=("b", "r"))


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (Z, Y, X[, C]) volume arrays: z-slabs over "b"."""
    return NamedSharding(mesh, P("b"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def volume_pspecs(vol: TSDFVolume) -> TSDFVolume:
    """PartitionSpec pytree matching a TSDFVolume: dense arrays z-sharded
    over "b", scalar/small metadata replicated."""
    def spec(path_leaf_name, arr):
        return P("b") if arr is not None and arr.ndim >= 3 else P()

    return TSDFVolume(
        tsdf=P("b"),
        weight=P("b"),
        color=None if vol.color is None else P("b"),
        deform=None if vol.deform is None else P("b"),
        deform_rot=None if vol.deform_rot is None else P("b"),
        physical_size=P(),
        offset=P(),
        truncation_distance=P(),
        max_weight=P(),
        global_rotation=P(),
        global_translation=P(),
    )
