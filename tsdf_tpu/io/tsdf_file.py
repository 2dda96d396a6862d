"""Binary .tsdf checkpoint format — byte-compatible with the reference.

Layout (ref: TSDFVolume::save_to_file src/TSDF/TSDFVolume.cu:994-1014 and
the loading constructor :463-664):

  header (68 bytes):
    dim3   size                 3 x u32   (x, y, z)
    float3 physical_size        3 x f32   mm
    float3 offset               3 x f32   mm
    float  truncation_distance  f32
    float  max_weight           f32
    float3 global_translation   3 x f32
    float3 global_rotation      3 x f32
  body:
    distances    f32 [x + y*sx + z*sx*sy]   (x fastest — our ravel order)
    weights      f32 [same]
    colours      u8  [n*3]
    deformation  f32 [n*6]  ({translation xyz, rotation xyz} per voxel)

The reference's ``load_from_file`` method is a stub returning false
(ref: TSDFVolume.cu:1035-1047) — loading is done by the file-name ctor;
here both directions are real.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..volume import TSDFVolume

HEADER_BYTES = 68


def save_tsdf(vol: TSDFVolume, path: str) -> None:
    sx, sy, sz = vol.size
    n = sx * sy * sz
    with open(path, "wb") as f:
        np.asarray([sx, sy, sz], dtype=np.uint32).tofile(f)
        np.asarray(vol.physical_size, dtype=np.float32).tofile(f)
        np.asarray(vol.offset, dtype=np.float32).tofile(f)
        np.asarray(
            [float(vol.truncation_distance), float(vol.max_weight)],
            dtype=np.float32,
        ).tofile(f)
        np.asarray(vol.global_translation, dtype=np.float32).tofile(f)
        np.asarray(vol.global_rotation, dtype=np.float32).tofile(f)

        np.asarray(vol.tsdf, dtype=np.float32).ravel().tofile(f)
        np.asarray(vol.weight, dtype=np.float32).ravel().tofile(f)

        if vol.color is not None:
            np.asarray(vol.color, dtype=np.uint8).ravel().tofile(f)
        else:
            np.zeros(n * 3, dtype=np.uint8).tofile(f)

        deform = np.zeros((n, 6), dtype=np.float32)
        if vol.deform is not None:
            deform[:, 0:3] = np.asarray(
                vol.deform, dtype=np.float32
            ).reshape(n, 3)
        else:
            deform[:, 0:3] = np.asarray(
                vol.voxel_centres(), dtype=np.float32
            ).reshape(n, 3)
        if vol.deform_rot is not None:
            deform[:, 3:6] = np.asarray(
                vol.deform_rot, dtype=np.float32
            ).reshape(n, 3)
        deform.tofile(f)


def load_tsdf(path: str, materialize_deform: bool = True) -> TSDFVolume:
    with open(path, "rb") as f:
        size = np.fromfile(f, dtype=np.uint32, count=3)
        sx, sy, sz = (int(v) for v in size)
        physical_size = np.fromfile(f, dtype=np.float32, count=3)
        offset = np.fromfile(f, dtype=np.float32, count=3)
        trunc, max_weight = np.fromfile(f, dtype=np.float32, count=2)
        global_translation = np.fromfile(f, dtype=np.float32, count=3)
        global_rotation = np.fromfile(f, dtype=np.float32, count=3)

        n = sx * sy * sz
        distances = np.fromfile(f, dtype=np.float32, count=n)
        weights = np.fromfile(f, dtype=np.float32, count=n)
        colours = np.fromfile(f, dtype=np.uint8, count=n * 3)
        deform = np.fromfile(f, dtype=np.float32, count=n * 6)

    if distances.size != n or weights.size != n:
        raise ValueError(f"truncated .tsdf file: {path}")

    shape = (sz, sy, sx)
    vol = TSDFVolume(
        tsdf=jnp.asarray(distances.reshape(shape)),
        weight=jnp.asarray(weights.reshape(shape)),
        color=(
            jnp.asarray(colours.reshape(shape + (3,)))
            if colours.size == n * 3
            else None
        ),
        deform=None,
        deform_rot=None,
        physical_size=jnp.asarray(physical_size),
        offset=jnp.asarray(offset),
        truncation_distance=jnp.asarray(trunc),
        max_weight=jnp.asarray(max_weight),
        global_rotation=jnp.asarray(global_rotation),
        global_translation=jnp.asarray(global_translation),
    )
    if materialize_deform and deform.size == n * 6:
        d = deform.reshape(n, 6)
        # Every .tsdf carries a deformation block (the format always
        # serializes one), but an identity warp field costs 6x volume
        # memory and silently demotes integrate to the non-rigid path —
        # detect identity (translations == undeformed voxel centres,
        # zero rotations) on the host and drop it.
        centres = np.asarray(vol.voxel_centres(), np.float32).reshape(n, 3)
        identity = np.allclose(
            d[:, 0:3], centres, atol=1e-3
        ) and not d[:, 3:6].any()
        if not identity:
            vol = vol.replace(
                deform=jnp.asarray(d[:, 0:3].reshape(shape + (3,))),
                deform_rot=jnp.asarray(d[:, 3:6].reshape(shape + (3,))),
            )
    return vol
