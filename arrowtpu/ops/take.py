"""Take: gather rows by an index column.

Capability mirror of /root/reference/arrow-select/src/take.rs (take :89,
bounds check :167, per-type paths: primitive :408, bits :463, byte_view
:633 zero-copy buffer reuse, dict :935 keys-only, take_record_batch :1132).

On TPU every variant is the same dense gather; a null or out-of-bounds
index yields a null output row (the reference errors on OOB when
check_bounds — here the checked variant returns a traced error flag, same
pattern as numeric.add_checked)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import schema as st
from ..config import TakeOptions
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col


def _gather_validity(c: col.Column, idx, idx_ok):
    """Output row valid iff index row valid AND source row valid."""
    if c.validity is None:
        src_ok = bm.row_mask_bool(c.capacity, c.length)[idx]
    else:
        src_ok = bm.unpack(c.validity)[idx]
    ok = src_ok & idx_ok
    return bm.pack(ok)


def take(c: col.Column, indices: col.PrimitiveColumn,
         options: TakeOptions = TakeOptions()):
    """reference take.rs:89.  Returns column with indices.length rows.
    If options.check_bounds, returns (column, oob_flag)."""
    if not isinstance(indices, col.PrimitiveColumn) or not (
        indices.wide in ("i64", "u64")
        or jnp.issubdtype(indices.values.dtype, jnp.integer)
    ):
        raise st.ComputeError("take: indices must be an integer column")
    live = bm.row_mask_bool(indices.capacity, indices.length)
    if indices.wide is not None:
        from ..core import wide as wd

        lo_w, hi_w = wd.lo(indices.values), wd.hi(indices.values)
        idx_raw = lo_w.astype(jnp.int32)
        # valid 64-bit index: hi limb zero and lo within [0, length)
        in_bounds = (hi_w == 0) & (idx_raw >= 0) & (idx_raw < jnp.int32(c.length))
    else:
        idx_raw = indices.values.astype(jnp.int32)
        in_bounds = (idx_raw >= 0) & (idx_raw < jnp.int32(c.length))
    idx_ok = in_bounds & live
    if indices.validity is not None:
        idx_ok = idx_ok & bm.unpack(indices.validity)
    idx = jnp.clip(idx_raw, 0, c.capacity - 1)
    out = _take_values(c, idx, idx_ok, indices.length)
    if options.check_bounds:
        # reference take.rs:167 check_bounds: error on OOB of a valid index
        valid_idx = live if indices.validity is None else (
            live & bm.unpack(indices.validity)
        )
        oob = jnp.any(valid_idx & ~in_bounds)
        return out, oob
    return out


def _take_values(c: col.Column, idx, idx_ok, out_length):
    if isinstance(c, col.NullColumn):
        return col.NullColumn(out_length, idx.shape[0])
    if isinstance(c, col.DictionaryColumn):
        # gather keys only (reference take_dict take.rs:935)
        return dataclasses.replace(c, keys=_take_values(c.keys, idx, idx_ok, out_length))
    validity = _gather_validity(c, idx, idx_ok)
    if isinstance(c, col.BooleanColumn):
        return col.BooleanColumn(bm.pack(c.values_bool()[idx]), validity, out_length)
    if isinstance(c, col.StringViewColumn):
        # gather 16-byte views, share arena (reference take_byte_view :633)
        return col.StringViewColumn(c.views[idx], c.arena, validity, out_length, c.dtype, c.len_bound)
    if isinstance(c, col.PrimitiveColumn):
        return col.PrimitiveColumn(c.values[idx], validity, out_length, c.dtype)
    if isinstance(c, col.ListViewColumn):
        # gather (start, size) views only, share the child (the list
        # analogue of take_byte_view, reference take.rs:633; list_view
        # semantics make this possible where reference take_list :649 must
        # recurse)
        return col.ListViewColumn(
            c.starts[idx], c.sizes[idx], c.child, validity, out_length, c.dtype
        )
    if isinstance(c, col.StructColumn):
        # reference take.rs struct path: take each child
        children = tuple(
            _take_values(ch, idx, idx_ok, out_length) for ch in c.children
        )
        return col.StructColumn(children, validity, out_length, c.dtype)
    if isinstance(c, col.FixedSizeListColumn):
        # expand indices to child rows (reference take_fixed_size_list :879)
        size = c.dtype.size
        child_idx = (idx[:, None] * size + jnp.arange(size, dtype=idx.dtype)).reshape(-1)
        child_ok = jnp.repeat(idx_ok, size)
        child = _take_values(c.child, child_idx, child_ok, out_length * size)
        return col.FixedSizeListColumn(child, validity, out_length, c.dtype)
    raise st.ComputeError(f"take: unsupported column {type(c).__name__}")


def take_record_batch(batch: bt.RecordBatch, indices: col.PrimitiveColumn,
                      options: TakeOptions = TakeOptions()) -> bt.RecordBatch:
    """reference take.rs:1132."""
    cols = []
    flag = None
    for c in batch.columns:
        r = take(c, indices, options)
        if options.check_bounds:
            r, f = r
            flag = f if flag is None else (flag | f)
        cols.append(r)
    out = bt.RecordBatch(batch.schema, tuple(cols))
    return (out, flag) if options.check_bounds else out
