"""Pytree dataclass infrastructure.

Filters, states and solutions in this framework are immutable dataclasses
registered as JAX pytrees.  Array-valued fields become pytree *leaves* (so a
whole filter can be `jax.grad`-ed w.r.t. its matrices, or `jax.vmap`-ed over a
bank of filters), while configuration fields (callables, ints, flags) are
*static* metadata baked into the jit cache key.

This replaces the reference's mutable Julia structs with compile-time type
parameters (cf. /root/reference/src/kalman.jl:26-44 where `KalmanFilter` is a
`mutable struct` and in-place/out-of-place behaviour is selected by type
parameters) with the idiomatic JAX equivalent.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

_STATIC_KEY = "llpf_static"


def static_field(**kwargs) -> Any:
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs) -> Any:
    """A dataclass field treated as a pytree leaf (traced array data)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC_KEY] = False
    return dataclasses.field(metadata=metadata, **kwargs)


def struct(cls: type[T]) -> type[T]:
    """Decorator: freeze the dataclass and register it as a JAX pytree.

    Fields declared with :func:`static_field` are registered as metadata;
    everything else is a leaf.  Instances gain a ``replace`` method.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get(_STATIC_KEY, False):
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
