"""Tiny pytree-dataclass helper (no flax dependency in the core engine).

``@pytree_dataclass`` registers a frozen dataclass with JAX so instances flow
through ``jit``/``vmap``/``scan`` as pytrees. Fields marked with
``static_field()`` become aux (hashable, trace-static) data.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> Any:
    return dataclasses.field(metadata={"static": True}, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
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

    def replace(self: _T, **updates: Any) -> _T:
        return dataclasses.replace(self, **updates)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
