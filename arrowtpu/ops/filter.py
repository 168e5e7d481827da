"""Filter: masked compaction of columns and batches.

Capability mirror of /root/reference/arrow-select/src/filter.rs
(filter :201, filter_record_batch :225, FilterBuilder :256,
prep_null_mask_filter :167 — a null predicate row selects nothing).

TPU-native design (SURVEY §7): the reference's adaptive IterationStrategy
(slices-vs-indices by selectivity, filter.rs:328) collapses into a single
mask -> prefix-sum -> scatter-compaction pass, which is one fused
bandwidth-bound kernel under XLA for every input type:

    keep    = mask_values AND mask_validity AND row_bound
    pos     = exclusive_prefix_sum(keep)            # output slot per row
    out     = scatter(values, where(keep, pos, OOB))  # OOB rows dropped
    length' = popcount(keep)

Selection stays capacity-shaped (static) with a new traced length — the
engine-wide answer to data-dependent output sizes (XLA static shapes).

The FilterBuilder "optimize once, filter many columns" pattern
(filter.rs:285) maps to `FilterPlan`, which precomputes keep/pos once and
applies them to any number of columns (XLA CSE would do this anyway inside
one jit, but the plan makes it explicit across jit boundaries).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import schema as st
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col


@dataclasses.dataclass(frozen=True)
class FilterPlan:
    """Precomputed selection (reference FilterPredicate, filter.rs:442)."""

    keep: jax.Array  # (capacity,) bool
    pos: jax.Array  # (capacity,) int32 output slot
    count: jax.Array  # scalar int32 selected rows

    @property
    def capacity(self) -> int:
        return self.keep.shape[0]


jax.tree_util.register_dataclass(
    FilterPlan, data_fields=["keep", "pos", "count"], meta_fields=[]
)


def build_plan(mask: col.BooleanColumn) -> FilterPlan:
    if not isinstance(mask, col.BooleanColumn):
        raise st.ComputeError("filter mask must be a BooleanColumn")
    keep = mask.values_bool()
    if mask.validity is not None:
        # prep_null_mask_filter (filter.rs:167): null predicate -> false
        keep = keep & bm.unpack(mask.validity)
    keep = keep & bm.row_mask_bool(mask.capacity, mask.length)
    incl = jnp.cumsum(keep.astype(jnp.int32))
    pos = incl - 1  # inclusive-1 == exclusive prefix sum
    return FilterPlan(keep, pos, incl[-1])


def _scatter_compact(values: jax.Array, plan: FilterPlan) -> jax.Array:
    """Scatter selected rows to the front; dropped rows go out-of-bounds
    (mode='drop').  Works for any trailing value shape (views are (cap,4))."""
    cap = plan.capacity
    idx = jnp.where(plan.keep, plan.pos, cap)  # cap = OOB -> dropped
    out = jnp.zeros_like(values)
    return out.at[idx].set(values, mode="drop")


def apply_plan(c: col.Column, plan: FilterPlan) -> col.Column:
    if c.capacity != plan.capacity:
        raise st.ComputeError("filter: capacity mismatch")
    new_len = plan.count
    if isinstance(c, col.NullColumn):
        return col.NullColumn(new_len, c.capacity)
    if isinstance(c, col.DictionaryColumn):
        # filter keys only (reference filter_dict, filter.rs:588)
        return dataclasses.replace(c, keys=apply_plan(c.keys, plan))
    if isinstance(c, col.BooleanColumn):
        vals = bm.pack(_scatter_compact(c.values_bool(), plan))
        validity = _filter_validity(c, plan)
        return col.BooleanColumn(vals, validity, new_len)
    if isinstance(c, col.StringViewColumn):
        # gather fixed-width views; the arena is shared untouched
        # (reference filter_byte_view keeps data buffers, filter.rs:560s)
        views = _scatter_compact(c.views, plan)
        validity = _filter_validity(c, plan)
        return col.StringViewColumn(views, c.arena, validity, new_len, c.dtype, c.len_bound)
    if isinstance(c, col.PrimitiveColumn):
        vals = _scatter_compact(c.values, plan)
        validity = _filter_validity(c, plan)
        return col.PrimitiveColumn(vals, validity, new_len, c.dtype)
    if isinstance(c, col.ListViewColumn):
        # compact (start, size) views, share the child (list_view semantics
        # replace the reference's MutableArrayData nested fallback,
        # filter.rs:598)
        validity = _filter_validity(c, plan)
        return col.ListViewColumn(
            _scatter_compact(c.starts, plan),
            _scatter_compact(c.sizes, plan),
            c.child,
            validity,
            new_len,
            c.dtype,
        )
    if isinstance(c, col.StructColumn):
        validity = _filter_validity(c, plan)
        children = tuple(apply_plan(ch, plan) for ch in c.children)
        return col.StructColumn(children, validity, new_len, c.dtype)
    if isinstance(c, col.FixedSizeListColumn):
        # expand the plan to child granularity
        size = c.dtype.size
        keep = jnp.repeat(plan.keep, size)
        pos = (plan.pos[:, None] * size + jnp.arange(size, dtype=jnp.int32)).reshape(-1)
        child_plan = FilterPlan(keep, pos, plan.count * size)
        validity = _filter_validity(c, plan)
        return col.FixedSizeListColumn(
            apply_plan(c.child, child_plan), validity, new_len, c.dtype
        )
    raise st.ComputeError(f"filter: unsupported column {type(c).__name__}")


def _filter_validity(c: col.Column, plan: FilterPlan) -> Optional[jax.Array]:
    if c.validity is None:
        return None
    ok = bm.unpack(c.validity)
    return bm.pack(_scatter_compact(ok, plan))


def filter_(c: col.Column, mask: col.BooleanColumn) -> col.Column:
    """reference filter.rs:201 filter()."""
    return apply_plan(c, build_plan(mask))


def filter_record_batch(batch: bt.RecordBatch, mask: col.BooleanColumn) -> bt.RecordBatch:
    """reference filter.rs:225: one plan, all columns."""
    plan = build_plan(mask)
    return bt.RecordBatch(
        batch.schema, tuple(apply_plan(c, plan) for c in batch.columns)
    )
