"""Tiny pytree-dataclass helper.

Every stateful object in tsdf_tpu (Camera, TSDFVolume, ICP state, ...) is an
immutable dataclass registered as a JAX pytree, so it can flow through
``jit`` / ``grad`` / ``shard_map`` like any array. Fields whose metadata marks
them static become aux_data (hashable, part of the jit cache key).
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def field(*, static: bool = False, **kwargs):
    """Dataclass field; ``static=True`` makes it jit-static aux data."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = static
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree node."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
