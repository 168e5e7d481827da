"""Concat and interleave: combining rows across columns/batches.

Capability mirrors:
  * concat: /root/reference/arrow-select/src/concat.rs:495 (+
    concat_batches :607) — output rows are the inputs' live rows
    back-to-back.  Implemented as dynamic_update_slice writes at traced
    cumulative offsets into a summed-capacity slab.  Validity moves as
    unpacked bools (traced offsets are not word-aligned) and repacks once.
  * interleave: /root/reference/arrow-select/src/interleave.rs:74 — gather
    (source_idx, row_idx) pairs across N sources; implemented as a stacked
    slab + single flat gather, the N-source gather that backs merge output
    building (reference merge.rs:35).

Dictionary policy: concat of dict columns requires (for now) the *same*
dictionary arrays — the analogue of the reference's ptr_eq interning test
(arrow-select/src/dictionary.rs:152 should_merge_dictionary_values);
otherwise callers decode first.  Full dictionary merging lands with the
dictionary-merge kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import schema as st
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col


def _concat_arrays(arrays, lengths, out_cap: int):
    """Place each array's first `length` rows back-to-back (traced offsets)."""
    shape = (out_cap,) + arrays[0].shape[1:]
    out = jnp.zeros(shape, dtype=arrays[0].dtype)
    offset = jnp.int32(0)
    for arr, ln in zip(arrays, lengths):
        # write the whole slab at the running offset; rows beyond `ln` are
        # overwritten by the next slab (or remain padding)
        pad_rows = out_cap - arr.shape[0]
        if pad_rows > 0:
            arr = jnp.concatenate(
                [arr, jnp.zeros((pad_rows,) + arr.shape[1:], arr.dtype)]
            )
        out = _masked_update(out, arr[:out_cap], offset, ln)
        offset = offset + jnp.int32(ln)
    return out


def _masked_update(out, slab, offset, ln):
    """out[offset : offset+ln] = slab[:ln], keeping out elsewhere."""
    cap = out.shape[0]
    rolled = _roll_rows(slab, offset, cap)
    pos = jnp.arange(cap, dtype=jnp.int32)
    sel = (pos >= offset) & (pos < offset + jnp.int32(ln))
    sel = sel.reshape((cap,) + (1,) * (out.ndim - 1))
    return jnp.where(sel, rolled, out)


def _roll_rows(slab, offset, cap):
    idx = (jnp.arange(cap, dtype=jnp.int32) - offset) % cap
    return slab[idx]


def concat_full_capacity(columns: Sequence[col.Column]) -> col.Column:
    """Concatenate columns as whole capacity blocks (padding included) so
    that row indices within each source stay valid after adding a static
    per-source rebase — the child-concat mode ListView columns need (their
    starts address child *positions*, not live-row ranks)."""
    return concat([c.with_length(c.capacity) for c in columns])


def concat(columns: Sequence[col.Column]) -> col.Column:
    """reference concat.rs:495."""
    if not columns:
        raise st.ComputeError("concat: no inputs")
    first = columns[0]
    if any(type(c) is not type(first) for c in columns):
        raise st.ComputeError("concat: mixed column kinds")
    out_cap = sum(c.capacity for c in columns)
    lengths = [c.length for c in columns]
    total = sum((jnp.int64(l) for l in lengths), jnp.int64(0)).astype(jnp.int32)

    if isinstance(first, col.NullColumn):
        return col.NullColumn(total, out_cap)

    if isinstance(first, col.DictionaryColumn):
        v0 = first.values
        for c in columns[1:]:
            same = (
                type(c.values) is type(v0)
                and all(
                    a is b
                    for a, b in zip(
                        jax.tree_util.tree_leaves(c.values),
                        jax.tree_util.tree_leaves(v0),
                    )
                )
            )
            if not same:
                raise st.ComputeError(
                    "concat: dictionary merge across distinct dictionaries "
                    "not yet supported — decode first"
                )
        keys = concat([c.keys for c in columns])
        return dataclasses.replace(first, keys=keys)

    # validity as bools (traced offsets break word alignment)
    any_nulls = any(c.validity is not None for c in columns)
    validity = None
    if any_nulls:
        ok = _concat_arrays([c.valid_bool() for c in columns], lengths, out_cap)
        validity = bm.pack(ok)

    if isinstance(first, col.BooleanColumn):
        vals = _concat_arrays([c.values_bool() for c in columns], lengths, out_cap)
        return col.BooleanColumn(bm.pack(vals), validity, total)

    if isinstance(first, col.StringViewColumn):
        # concatenate arenas at static offsets; rebase each source's
        # non-inline view offsets by its arena's static start
        arena_caps = [c.arena.shape[0] for c in columns]
        arena = jnp.concatenate([c.arena for c in columns])
        views_list = []
        start = 0
        for c in columns:
            v = c.views
            non_inline = v[:, 0] > 12
            v = v.at[:, 3].set(
                jnp.where(non_inline, v[:, 3] + jnp.uint32(start), v[:, 3])
            )
            views_list.append(v)
            start += c.arena.shape[0]
        views = _concat_arrays(views_list, lengths, out_cap)
        bounds = [c.len_bound for c in columns]
        lb = None if any(b is None for b in bounds) else max(bounds, default=0)
        return col.StringViewColumn(views, arena, validity, total, first.dtype, lb)

    if isinstance(first, col.PrimitiveColumn):
        vals = _concat_arrays([c.values for c in columns], lengths, out_cap)
        return col.PrimitiveColumn(vals, validity, total, first.dtype)

    if isinstance(first, col.ListViewColumn):
        # children concatenate at static offsets (full capacities, like the
        # string-arena path); each source's starts rebase by its child's
        # static start in the combined child
        child = concat_full_capacity([c.child for c in columns])
        starts_list, rebase = [], 0
        for c in columns:
            starts_list.append(c.starts + jnp.int32(rebase))
            rebase += c.child.capacity
        starts = _concat_arrays(starts_list, lengths, out_cap)
        sizes = _concat_arrays([c.sizes for c in columns], lengths, out_cap)
        return col.ListViewColumn(starts, sizes, child, validity, total, first.dtype)

    if isinstance(first, col.StructColumn):
        children = tuple(
            concat([c.children[i] for c in columns])
            for i in range(len(first.children))
        )
        return col.StructColumn(children, validity, total, first.dtype)

    if isinstance(first, col.FixedSizeListColumn):
        size = first.dtype.size
        child_cols = [c.child.with_length(c.length * size) for c in columns]
        child = concat(child_cols)
        return col.FixedSizeListColumn(child, validity, total, first.dtype)

    raise st.ComputeError(f"concat: unsupported column {type(first).__name__}")


def concat_batches(batches: Sequence[bt.RecordBatch]) -> bt.RecordBatch:
    """reference concat.rs:607."""
    if not batches:
        raise st.ComputeError("concat_batches: no inputs")
    schema = batches[0].schema
    for b in batches[1:]:
        if b.schema.names != schema.names:
            raise st.SchemaError("concat_batches: schema mismatch")
    cols = tuple(
        concat([b.columns[i] for b in batches]) for i in range(len(schema))
    )
    return bt.RecordBatch(schema, cols)


def interleave(columns: Sequence[col.Column], src_idx: col.PrimitiveColumn,
               row_idx: col.PrimitiveColumn) -> col.Column:
    """reference interleave.rs:74: out[i] = columns[src_idx[i]][row_idx[i]].

    Implemented as a stacked slab (static per-source offsets, no
    compaction) + one flat gather — padding inside slabs is never selected
    because row_idx < source length."""
    from .take import take as _take

    if not columns:
        raise st.ComputeError("interleave: no inputs")
    import numpy as np

    caps = [c.capacity for c in columns]
    offsets = jnp.asarray(np.concatenate([[0], np.cumsum(caps)[:-1]]), jnp.int32)

    def _as_i32(ix: col.PrimitiveColumn):
        if ix.wide is not None:
            from ..core import wide as wd

            return wd.lo(ix.values).astype(jnp.int32)
        return ix.values.astype(jnp.int32)

    stacked = _stack_slabs(columns)
    flat = offsets[_as_i32(src_idx)] + _as_i32(row_idx)
    # an index row is valid iff both parts valid
    validity = bm.union(src_idx.validity, row_idx.validity)
    flat_col = col.PrimitiveColumn(
        flat, validity, src_idx.length, st.int32
    )
    return _take(stacked, flat_col)


def _stack_slabs(columns):
    """Concatenate capacity slabs WITHOUT compaction (padding kept)."""
    first = columns[0]
    out_cap = sum(c.capacity for c in columns)
    total = sum((jnp.int32(c.length) for c in columns), jnp.int32(0))
    if isinstance(first, col.PrimitiveColumn):
        vals = jnp.concatenate([c.values for c in columns])
        oks = jnp.concatenate([c.valid_bool() for c in columns])
        # slab form: length must cover all slabs for take()'s bound check,
        # so use full capacity and rely on validity for padding rows
        return col.PrimitiveColumn(
            vals, bm.pack(oks), jnp.int32(out_cap), first.dtype
        )
    if isinstance(first, col.BooleanColumn):
        vals = jnp.concatenate([c.values_bool() for c in columns])
        oks = jnp.concatenate([c.valid_bool() for c in columns])
        return col.BooleanColumn(bm.pack(vals), bm.pack(oks), jnp.int32(out_cap))
    if isinstance(first, col.StringViewColumn):
        arena = jnp.concatenate([c.arena for c in columns])
        views_list = []
        start = 0
        for c in columns:
            v = c.views
            non_inline = v[:, 0] > 12
            v = v.at[:, 3].set(
                jnp.where(non_inline, v[:, 3] + jnp.uint32(start), v[:, 3])
            )
            views_list.append(v)
            start += c.arena.shape[0]
        views = jnp.concatenate(views_list)
        oks = jnp.concatenate([c.valid_bool() for c in columns])
        bounds = [c.len_bound for c in columns]
        lb = None if any(b is None for b in bounds) else max(bounds, default=0)
        return col.StringViewColumn(
            views, arena, bm.pack(oks), jnp.int32(out_cap), first.dtype, lb
        )
    raise st.ComputeError(f"interleave: unsupported column {type(first).__name__}")
