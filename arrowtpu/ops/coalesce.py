"""Slice and the streaming batch coalescer.

Capability mirrors:
  * slice: the reference's zero-copy Array::slice
    (arrow-array/src/array/mod.rs slice, arrow-buffer offsets) — here a
    materializing shift-gather, since HBM-local copies are cheap and
    static shapes forbid offset metadata.
  * BatchCoalescer: /root/reference/arrow-select/src/coalesce.rs:148 — a
    streaming re-batcher that accumulates pushed batches (optionally
    pre-filtered: push_batch_with_filter) and emits batches of
    target_batch_size rows.  This is the output stage of every pipelined
    operator.  The host drives the loop; each push is device work.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from .. import schema as st
from ..config import round_up
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col
from . import concat as concat_mod
from . import filter as filter_mod


def slice_(c: col.Column, offset, length) -> col.Column:
    """Rows [offset, offset+length) of c, materialized to the front.
    `offset`/`length` may be traced; capacity is preserved."""
    cap = c.capacity
    offset = jnp.int32(offset)
    length = jnp.minimum(jnp.int32(length), jnp.maximum(jnp.int32(c.length) - offset, 0))
    idx = (jnp.arange(cap, dtype=jnp.int32) + offset) % cap
    if isinstance(c, col.NullColumn):
        return col.NullColumn(length, cap)
    if isinstance(c, col.DictionaryColumn):
        import dataclasses

        return dataclasses.replace(c, keys=slice_(c.keys, offset, length))
    ok = c.valid_bool()[idx] & bm.row_mask_bool(cap, length)
    validity = bm.pack(ok) if c.validity is not None else None
    if isinstance(c, col.BooleanColumn):
        return col.BooleanColumn(bm.pack(c.values_bool()[idx]), validity, length)
    if isinstance(c, col.StringViewColumn):
        return col.StringViewColumn(c.views[idx], c.arena, validity, length, c.dtype, c.len_bound)
    if isinstance(c, col.PrimitiveColumn):
        return col.PrimitiveColumn(c.values[idx], validity, length, c.dtype)
    raise st.ComputeError(f"slice: unsupported column {type(c).__name__}")


def slice_batch(batch: bt.RecordBatch, offset, length) -> bt.RecordBatch:
    return bt.RecordBatch(
        batch.schema, tuple(slice_(c, offset, length) for c in batch.columns)
    )


class BatchCoalescer:
    """reference coalesce.rs:148.  Host-driven streaming re-batcher."""

    def __init__(self, schema: st.Schema, target_batch_size: int = 8192):
        self.schema = schema
        self.target = target_batch_size
        self._buffer: Optional[bt.RecordBatch] = None
        self._ready: List[bt.RecordBatch] = []

    def push_batch(self, batch: bt.RecordBatch):
        if batch.schema.names != self.schema.names:
            raise st.SchemaError("coalesce: schema mismatch")
        if self._buffer is None:
            self._buffer = batch
        else:
            self._buffer = concat_mod.concat_batches([self._buffer, batch])
        self._drain()

    def push_batch_with_filter(self, batch: bt.RecordBatch, mask):
        """Fused filter+concat (reference coalesce.rs push_batch_with_filter)."""
        self.push_batch(filter_mod.filter_record_batch(batch, mask))

    def _drain(self):
        while self._buffer is not None and int(self._buffer.length) >= self.target:
            out = slice_batch(self._buffer, 0, self.target)
            # re-pack the emitted batch to a tight capacity
            self._ready.append(_shrink(out, self.target))
            rest_len = int(self._buffer.length) - self.target
            if rest_len == 0:
                self._buffer = None
            else:
                self._buffer = slice_batch(self._buffer, self.target, rest_len)

    def next_completed_batch(self) -> Optional[bt.RecordBatch]:
        if self._ready:
            return self._ready.pop(0)
        return None

    def finish(self) -> Optional[bt.RecordBatch]:
        """Emit the final partial batch (reference finish_buffered_batch)."""
        out = self._buffer
        self._buffer = None
        if out is not None:
            out = _shrink(out, int(out.length))
        return out


def _shrink(batch: bt.RecordBatch, n: int) -> bt.RecordBatch:
    """Reduce capacities to round_up(n) (host-side, concrete length)."""
    cap = round_up(max(n, 1))
    cols = []
    for c in batch.columns:
        cols.append(_shrink_col(c, cap, n))
    return bt.RecordBatch(batch.schema, tuple(cols))


def _shrink_col(c: col.Column, cap: int, n: int) -> col.Column:
    import dataclasses

    if cap >= c.capacity:
        return c
    ln = jnp.int32(n)
    if isinstance(c, col.NullColumn):
        return col.NullColumn(ln, cap)
    if isinstance(c, col.DictionaryColumn):
        return dataclasses.replace(c, keys=_shrink_col(c.keys, cap, n))
    validity = None
    if c.validity is not None:
        # word-level slicing breaks the sublane-major bit order (bitmap.py
        # rule 1): re-pack through bools at the new capacity
        validity = bm.pack(bm.unpack(c.validity)[:cap])
    if isinstance(c, col.BooleanColumn):
        return col.BooleanColumn(bm.pack(c.values_bool()[:cap]), validity, ln)
    if isinstance(c, col.StringViewColumn):
        return col.StringViewColumn(c.views[:cap], c.arena, validity, ln, c.dtype, c.len_bound)
    if isinstance(c, col.PrimitiveColumn):
        return col.PrimitiveColumn(c.values[:cap], validity, ln, c.dtype)
    raise st.ComputeError(f"shrink: unsupported column {type(c).__name__}")
