"""Hash-aggregate: GROUP BY with SUM/COUNT/MIN/MAX/MEAN.

The reference deliberately has no group-by (aggregates are whole-array,
/root/reference/arrow-arith/src/aggregate.rs; grouped aggregation lives
downstream in DataFusion).  BASELINE config 4 makes it first-class here.

TPU-native design: group keys encode to order-preserving planes
(rowformat.encode), rows sort by the planes (XLA's tuned sort), group
boundaries come from adjacent-plane inequality — the reference's
`partition` primitive (arrow-ord/src/partition.rs:127) applied to its own
sort output — and the aggregates are segment reductions over the sorted
values.  Null keys form their own group (SQL GROUP BY semantics); null
values are skipped by every aggregate (arity contract).  Output has the
input's capacity with traced group-count length.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import schema as st
from ..config import SortOptions
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col
from ..rowformat import encode as rf
from .take import take

AGGS = ("sum", "count", "min", "max", "mean")


def group_by(batch: bt.RecordBatch, keys: Sequence[str],
             aggs: Sequence[Tuple[str, str]]) -> bt.RecordBatch:
    """aggs: [(column_name, agg_name)] with agg in {sum,count,min,max,mean}.
    Output columns: keys..., then '<agg>_<column>' per aggregate."""
    key_cols = [batch[k] for k in keys]
    cap = batch.capacity
    length = batch.length

    planes = rf.encode_columns(key_cols)
    pad = rf.padding_plane(cap, length)
    iota = jnp.arange(cap, dtype=jnp.int32)
    sorted_ops = jax.lax.sort([pad] + planes + [iota], dimension=0,
                              is_stable=True, num_keys=1 + len(planes))
    idx = sorted_ops[-1]
    sorted_planes = sorted_ops[1 : 1 + len(planes)]

    live = bm.row_mask_bool(cap, length)  # in sorted order live rows lead
    boundary = jnp.zeros(cap, dtype=jnp.bool_)
    for p in sorted_planes:
        boundary = boundary | jnp.concatenate([jnp.array([True]), p[1:] != p[:-1]])
    boundary = boundary & live
    seg_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    num_groups = jnp.where(jnp.int32(length) > 0, seg_id[-1] + 1, 0)
    seg_id_safe = jnp.where(live, seg_id, cap)  # padding -> dropped segment

    # representative source row per group (first row of each segment)
    first_pos = jnp.where(boundary, seg_id, cap)
    group_row = jnp.zeros(cap, dtype=jnp.int32).at[first_pos].set(idx, mode="drop")
    group_row_col = col.PrimitiveColumn(group_row, None, num_groups, st.int32)

    out_fields = []
    out_cols = []
    for k, c in zip(keys, key_cols):
        out_fields.append(st.Field(k, c.dtype))
        out_cols.append(take(c, group_row_col))

    for name, agg in aggs:
        if agg not in AGGS:
            raise st.ComputeError(f"unknown aggregate {agg!r}")
        c = batch[name]
        agg_col = _segment_agg(c, idx, seg_id_safe, cap, num_groups, agg)
        out_fields.append(st.Field(f"{agg}_{name}", agg_col.dtype))
        out_cols.append(agg_col)

    return bt.RecordBatch(st.Schema(tuple(out_fields)), tuple(out_cols))


def _segment_agg(c: col.Column, idx, seg_id_safe, cap: int, num_groups, agg: str):
    if isinstance(c, col.BooleanColumn):
        vals = c.values_bool().astype(jnp.int64)
    elif isinstance(c, col.PrimitiveColumn):
        vals = c.values
    else:
        raise st.ComputeError(f"aggregate on {type(c).__name__} unsupported")
    vals_sorted = vals[idx]
    ok_sorted = c.valid_bool()[idx]
    nseg = cap  # static bound on group count

    cnt = jax.ops.segment_sum(ok_sorted.astype(jnp.int64), seg_id_safe, nseg)
    has = cnt > 0

    if agg == "count":
        return col.PrimitiveColumn(cnt, None, num_groups, st.int64)

    if agg == "sum" or agg == "mean":
        z = jnp.where(ok_sorted, vals_sorted, jnp.zeros_like(vals_sorted))
        s = jax.ops.segment_sum(z, seg_id_safe, nseg)
        if agg == "sum":
            validity = bm.pack(has)
            dt = st.from_jnp(s.dtype)
            return col.PrimitiveColumn(s, validity, num_groups, dt)
        mean = s.astype(jnp.float64) / jnp.maximum(cnt, 1).astype(jnp.float64)
        return col.PrimitiveColumn(mean, bm.pack(has), num_groups, st.float64)

    if agg in ("min", "max"):
        if jnp.issubdtype(vals_sorted.dtype, jnp.floating):
            ident = jnp.array(jnp.inf if agg == "min" else -jnp.inf, vals_sorted.dtype)
        else:
            info = jnp.iinfo(vals_sorted.dtype)
            ident = jnp.array(info.max if agg == "min" else info.min, vals_sorted.dtype)
        z = jnp.where(ok_sorted, vals_sorted, ident)
        fn = jax.ops.segment_min if agg == "min" else jax.ops.segment_max
        r = fn(z, seg_id_safe, nseg)
        # empty segments come back as +/-inf or int extremes -> null them
        r = jnp.where(has, r, jnp.zeros_like(r))
        return col.PrimitiveColumn(r, bm.pack(has), num_groups, st.from_jnp(r.dtype))

    raise st.ComputeError(f"unknown aggregate {agg!r}")
