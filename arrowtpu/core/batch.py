"""RecordBatch: a schema'd collection of equal-length columns.

Capability mirror of the reference's RecordBatch
(/root/reference/arrow-array/src/record_batch.rs:224): schema + columns, all
the same logical length; project/select/slice.  As a pytree it flows through
jit/pjit whole — the unit of execution for every operator pipeline, and the
unit of sharding for the distributed layer (each mesh device holds a shard's
Batch)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import schema as st
from . import column as col


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@partial(_register, data_fields=["columns"], meta_fields=["schema"])
@dataclasses.dataclass(frozen=True)
class RecordBatch:
    schema: st.Schema
    columns: Tuple[col.Column, ...]

    def __post_init__(self):
        if len(self.schema) != len(self.columns):
            raise st.InvalidArgumentError(
                f"schema has {len(self.schema)} fields, got {len(self.columns)} columns"
            )

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    @property
    def capacity(self) -> int:
        if not self.columns:
            return 0
        return self.columns[0].capacity

    @property
    def length(self):
        if not self.columns:
            return jnp.int32(0)
        return self.columns[0].length

    def column(self, name_or_idx) -> col.Column:
        if isinstance(name_or_idx, str):
            return self.columns[self.schema.index_of(name_or_idx)]
        return self.columns[name_or_idx]

    def __getitem__(self, key):
        return self.column(key)

    def project(self, names: Sequence[str]) -> "RecordBatch":
        """reference record_batch.rs project()."""
        idx = [self.schema.index_of(n) for n in names]
        return RecordBatch(
            self.schema.project(names), tuple(self.columns[i] for i in idx)
        )

    def with_column(self, name: str, c: col.Column) -> "RecordBatch":
        if name in self.schema.names:
            i = self.schema.index_of(name)
            cols = list(self.columns)
            cols[i] = c
            return RecordBatch(self.schema, tuple(cols))
        fields = self.schema.fields + (st.Field(name, c.dtype),)
        return RecordBatch(st.Schema(fields), self.columns + (c,))

    def with_length(self, length) -> "RecordBatch":
        return RecordBatch(
            self.schema, tuple(c.with_length(length) for c in self.columns)
        )

    def to_pydict(self):
        return {
            f.name: c.to_pylist() for f, c in zip(self.schema.fields, self.columns)
        }


def record_batch(data) -> RecordBatch:
    """record_batch({"a": [1,2,None], "b": column}) — host-side builder."""
    fields = []
    cols = []
    for name, v in data.items():
        if not isinstance(v, col.Column):
            v = col.from_pylist(list(v))
        fields.append(st.Field(name, v.dtype))
        cols.append(v)
    if cols:
        caps = {c.capacity for c in cols}
        if len(caps) != 1:
            raise st.InvalidArgumentError(f"column capacities differ: {caps}")
        lens = {c.concrete_length() for c in cols}
        if len(lens) != 1:
            raise st.InvalidArgumentError(f"column lengths differ: {lens}")
    return RecordBatch(st.Schema(tuple(fields)), tuple(cols))
