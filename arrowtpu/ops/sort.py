"""Sort, lexsort, rank, partition.

Capability mirror of /root/reference/arrow-ord/src/sort.rs
(sort_to_indices :277, lexsort_to_indices :940, SortColumn/SortOptions,
limit handling :1114), rank.rs:57 and partition.rs:127.

TPU-native design: the reference's comparison sorts (pdqsort on (idx,
value) pairs, LexicographicalComparator fallback) are replaced by one
mechanism — encode sort keys into order-preserving uint32 planes
(rowformat.encode, the arrow-row trick the reference docs themselves
recommend for multi-column sorts, sort.rs:937-939) and run XLA's tuned
variadic TPU sort (jax.lax.sort, stable, multi-key lexicographic).
A most-significant padding plane keeps capacity-padding rows at the end,
so the returned index column's first `length` entries are the sorted
permutation of live rows.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import schema as st
from ..config import SortOptions
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col
from ..rowformat import encode as rf
from ..rowformat import pack as rp
from .take import take


def _sorted_iota(planes: List[jax.Array], capacity: int, length) -> jax.Array:
    """Stable-sort row ids by (padding, *planes) — via runtime-packed
    minimal key words (rowformat/pack.py; the TPU-native replacement for
    the reference's row-format radix sort, arrow-row/src/lib.rs:17-23)."""
    iota = jnp.arange(capacity, dtype=jnp.int32)
    _, extras = rp.sort_by_planes(planes, capacity, length, [iota],
                                  return_planes=False)
    return extras[0]


def _sorted_iota_any(columns, options, capacity, length) -> jax.Array:
    """Grouped sort when a long varlen key is present (prefix planes +
    rank-chained refinement sorts, pack.sort_by_plane_groups); single
    packed sort otherwise."""
    groups = rf.encode_columns_grouped(columns, options)
    iota = jnp.arange(capacity, dtype=jnp.int32)
    if len(groups) == 1:
        return _sorted_iota(groups[0], capacity, length)
    out = rp.sort_by_plane_groups(groups, capacity, length, [iota])
    return out[0]


def sort_to_indices(c: col.Column, options: SortOptions = SortOptions(),
                    limit: Optional[int] = None) -> col.PrimitiveColumn:
    """reference sort.rs:277.  Returns an index column (int32) whose first
    `length` (or limit) entries sort c per options."""
    idx = _sorted_iota_any([c], [options], c.capacity, c.length)
    out_len = c.length if limit is None else jnp.minimum(jnp.int32(limit), jnp.int32(c.length))
    if limit is not None:
        # capacity shrink for small limits (reference partial_sort :1114)
        from ..config import round_up

        cap = round_up(min(limit, c.capacity))
        idx = idx[:cap]
    return col.PrimitiveColumn(idx, None, out_len, st.int32)


def sort(c: col.Column, options: SortOptions = SortOptions(),
         limit: Optional[int] = None) -> col.Column:
    """reference sort.rs sort(): take(values, sort_to_indices(values))."""
    return take(c, sort_to_indices(c, options, limit))


def lexsort_to_indices(columns: Sequence[col.Column],
                       options: Optional[Sequence[SortOptions]] = None,
                       limit: Optional[int] = None) -> col.PrimitiveColumn:
    """reference sort.rs:940 — multi-column lexicographic sort via the
    row-format planes."""
    if not columns:
        raise st.ComputeError("lexsort: no sort columns")
    caps = {c.capacity for c in columns}
    if len(caps) != 1:
        raise st.ComputeError(f"lexsort: capacity mismatch {caps}")
    first = columns[0]
    idx = _sorted_iota_any(
        list(columns),
        list(options) if options is not None else None,
        first.capacity, first.length)
    out_len = first.length if limit is None else jnp.minimum(
        jnp.int32(limit), jnp.int32(first.length)
    )
    if limit is not None:
        from ..config import round_up

        idx = idx[: round_up(min(limit, first.capacity))]
    return col.PrimitiveColumn(idx, None, out_len, st.int32)


def sort_batch(batch: bt.RecordBatch, by: Sequence[str],
               options: Optional[Sequence[SortOptions]] = None,
               limit: Optional[int] = None) -> bt.RecordBatch:
    idx = lexsort_to_indices([batch[n] for n in by], options, limit)
    from .take import take_record_batch

    return take_record_batch(batch, idx)


def rank(c: col.Column, options: SortOptions = SortOptions()) -> col.PrimitiveColumn:
    """reference rank.rs:57: 1-based 'max' rank with ties sharing the rank
    of their last member (rank of [1,2,2,3] -> [1,3,3,4])."""
    cap = c.capacity
    planes = rf.encode_column(c, options)
    iota = jnp.arange(cap, dtype=jnp.int32)
    sorted_planes, extras = rp.sort_by_planes(planes, cap, c.length, [iota])
    idx = extras[0]
    pos = jnp.arange(cap, dtype=jnp.int32)
    neq_next = jnp.zeros(cap, dtype=jnp.bool_)
    for p in sorted_planes:
        diff = jnp.concatenate([p[:-1] != p[1:], jnp.array([True])])
        neq_next = neq_next | diff
    # row `length-1` is the last live row — group must end there
    neq_next = neq_next | (pos == jnp.int32(c.length) - 1)
    end = jnp.where(neq_next, pos + 1, jnp.int32(2**31 - 1))
    # reverse cummin: each sorted position gets the nearest group end at or
    # after it (ends increase with position, so suffix-min = nearest)
    group_end = jnp.flip(jax.lax.cummin(jnp.flip(end)))
    ranks = jnp.zeros(cap, dtype=jnp.int32).at[idx].set(group_end)
    return col.PrimitiveColumn(ranks, c.validity, c.length, st.int32)


def partition(columns: Sequence[col.Column],
              options: Optional[Sequence[SortOptions]] = None) -> col.BooleanColumn:
    """reference partition.rs:127: given columns already sorted, mark rows
    that start a new group (row 0 is always a boundary).  The reference
    returns Partitions (ranges); `partition_ranges` materializes those on
    host."""
    if options is None:
        options = [SortOptions()] * len(columns)
    planes = rf.encode_columns(columns, options)
    cap = columns[0].capacity
    neq_prev = jnp.zeros(cap, dtype=jnp.bool_)
    for p in planes:
        neq_prev = neq_prev | jnp.concatenate([jnp.array([True]), p[1:] != p[:-1]])
    neq_prev = neq_prev & bm.row_mask_bool(cap, columns[0].length)
    return col.BooleanColumn(bm.pack(neq_prev), None, columns[0].length)


def partition_ranges(boundaries: col.BooleanColumn) -> List[Tuple[int, int]]:
    """Host-side materialization of partition ranges
    (reference partition.rs Partitions::ranges)."""
    import numpy as np

    n = boundaries.concrete_length()
    b = bm.to_numpy_bools(boundaries.values, n)
    starts = np.flatnonzero(b)
    ends = np.append(starts[1:], n)
    return list(zip(starts.tolist(), ends.tolist()))
