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

64-bit value columns aggregate exactly on their uint32 limb pairs via an
inclusive *segmented scan* (associative_scan with a segment-reset
combine): sums are exact wrapping 64-bit adds, min/max compare
total-order planes — no 64-bit element types touch the device.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col
from ..core import wide as wd
from ..rowformat import encode as rf
from .take import take

AGGS = ("sum", "count", "min", "max", "mean")


@dataclasses.dataclass
class _Ctx:
    idx: jax.Array  # sorted row order
    seg_id_safe: jax.Array  # per sorted row; cap for padding
    boundary: jax.Array  # per sorted row: starts a new group
    live: jax.Array  # per sorted row: is a real row
    cap: int
    num_groups: jax.Array


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

    live = jnp.arange(cap, dtype=jnp.int32) < jnp.int32(length)  # sorted: live first
    boundary = jnp.zeros(cap, dtype=jnp.bool_)
    for p in sorted_planes:
        boundary = boundary | jnp.concatenate([jnp.array([True]), p[1:] != p[:-1]])
    boundary = boundary & live
    seg_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    num_groups = jnp.where(jnp.int32(length) > 0, seg_id[-1] + 1, 0)
    seg_id_safe = jnp.where(live, seg_id, cap)  # padding -> dropped segment

    ctx = _Ctx(idx, seg_id_safe, boundary, live, cap, num_groups)

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
        agg_col = _segment_agg(batch[name], ctx, agg)
        out_fields.append(st.Field(f"{agg}_{name}", agg_col.dtype))
        out_cols.append(agg_col)

    return bt.RecordBatch(st.Schema(tuple(out_fields)), tuple(out_cols))


def _segmented_scan_to_groups(ctx: _Ctx, sorted_vals, combine, is_limb: bool):
    """Inclusive segmented scan over sorted rows, then gather each
    segment's final (= aggregated) value into its group slot."""

    def op(a, b):
        fa, va = a
        fb, vb = b
        f = fa | fb
        sel = fb[..., None] if is_limb else fb
        return f, jnp.where(sel, vb, combine(va, vb))

    _, scanned = jax.lax.associative_scan(op, (ctx.boundary, sorted_vals), axis=0)
    pos_ids = jnp.arange(ctx.cap, dtype=jnp.int32)
    n_live = jnp.sum(ctx.live.astype(jnp.int32))
    is_last = (
        jnp.concatenate([ctx.boundary[1:], jnp.array([True])])
        | (pos_ids == n_live - 1)  # final live row ends the last segment
    ) & ctx.live
    pos = jnp.where(is_last, ctx.seg_id_safe, ctx.cap)
    out_shape = (ctx.cap,) + sorted_vals.shape[1:]
    out = jnp.zeros(out_shape, scanned.dtype).at[pos].set(scanned, mode="drop")
    return out


def _segment_agg(c: col.Column, ctx: _Ctx, agg: str) -> col.Column:
    cap, num_groups = ctx.cap, ctx.num_groups
    wide_kind = c.wide if isinstance(c, col.PrimitiveColumn) else None

    ok_sorted = c.valid_bool()[ctx.idx]
    cnt = jax.ops.segment_sum(
        ok_sorted.astype(jnp.int32), ctx.seg_id_safe, cap
    )
    has = cnt > 0
    has_v = bm.pack(has)

    if agg == "count":
        return col.PrimitiveColumn(wd.from_int32(cnt), None, num_groups, st.int64)

    if isinstance(c, col.BooleanColumn):
        vals = c.values_bool().astype(jnp.int32)
        wide_kind = None
    elif isinstance(c, col.PrimitiveColumn):
        vals = c.values
    else:
        raise st.ComputeError(f"aggregate on {type(c).__name__} unsupported")

    vals_sorted = vals[ctx.idx]

    if (isinstance(c, col.PrimitiveColumn)
            and st.decimal_limbs(c.dtype) is not None):
        return _segment_agg_decimal(
            c, ctx, agg, vals_sorted, ok_sorted, cnt, has, has_v)

    if wide_kind is None:
        return _segment_agg_narrow(c, ctx, agg, vals_sorted, ok_sorted, cnt, has, has_v)

    # ---- wide (64-bit limb) paths --------------------------------------
    if agg in ("sum", "mean"):
        if wide_kind == "f64":
            v = wd.f64_to_value(vals_sorted)
            z = jnp.where(ok_sorted, v, 0.0)
            s = jax.ops.segment_sum(z, ctx.seg_id_safe, cap)
            if agg == "mean":
                mean = s / jnp.maximum(cnt, 1).astype(jnp.float64)
                return col.PrimitiveColumn(
                    wd.f64_from_value(mean), has_v, num_groups, st.float64
                )
            return col.PrimitiveColumn(
                wd.f64_from_value(s), has_v, num_groups, st.float64
            )
        masked = jnp.where(ok_sorted[..., None], vals_sorted,
                           jnp.zeros_like(vals_sorted))
        s = _segmented_scan_to_groups(ctx, masked, wd.add, is_limb=True)
        if agg == "mean":
            fv = (wd.i64_to_float(s) if wide_kind == "i64" else wd.u64_to_float(s))
            mean = fv / jnp.maximum(cnt, 1).astype(jnp.float64)
            return col.PrimitiveColumn(
                wd.f64_from_value(mean), has_v, num_groups, st.float64
            )
        return col.PrimitiveColumn(s, has_v, num_groups, c.dtype)

    if agg in ("min", "max"):
        is_min = agg == "min"
        # transform to unsigned-sortable limbs
        if wide_kind == "f64":
            ph, pl = wd.f64_total_order_planes(vals_sorted)
            key = wd.make(pl, ph)
        elif wide_kind == "i64":
            key = wd.make(wd.lo(vals_sorted),
                          wd.hi(vals_sorted) ^ wd.U32(0x80000000))
        else:
            key = vals_sorted
        ident_np = wd.split_numpy(
            np.array(np.iinfo(np.uint64).max if is_min else 0, np.uint64).reshape(())
        )
        identb = jnp.asarray(ident_np, wd.U32)
        masked = jnp.where(ok_sorted[..., None], key,
                           jnp.broadcast_to(identb, key.shape))
        if is_min:
            combine = lambda x, y: jnp.where(wd.lt_unsigned(x, y)[..., None], x, y)
        else:
            combine = lambda x, y: jnp.where(wd.lt_unsigned(x, y)[..., None], y, x)
        best = _segmented_scan_to_groups(ctx, masked, combine, is_limb=True)
        # untransform
        if wide_kind == "f64":
            ph, pl = wd.hi(best), wd.lo(best)
            was_negative = (ph >> 31) == 0
            mask_hi = jnp.where(was_negative, wd.U32(0xFFFFFFFF), wd.U32(0x80000000))
            mask_lo = jnp.where(was_negative, wd.U32(0xFFFFFFFF), wd.U32(0))
            best = wd.make(pl ^ mask_lo, ph ^ mask_hi)
        elif wide_kind == "i64":
            best = wd.make(wd.lo(best), wd.hi(best) ^ wd.U32(0x80000000))
        best = jnp.where(has[..., None], best, jnp.zeros_like(best))
        return col.PrimitiveColumn(best, has_v, num_groups, c.dtype)

    raise st.ComputeError(f"unknown aggregate {agg!r}")


def _segment_agg_decimal(c, ctx, agg, vals_sorted, ok_sorted, cnt, has, has_v):
    """Decimal SUM/MIN/MAX/MEAN via N-limb segmented scans (core/limbs.py).
    Sum keeps the input scale; precision widens to the width max
    (reference decimal aggregate semantics, arrow-arith aggregate.rs)."""
    from ..core import limbs as lb

    num_groups = ctx.num_groups
    nl = vals_sorted.shape[-1]
    if agg in ("sum", "mean"):
        masked = jnp.where(ok_sorted[..., None], vals_sorted,
                           jnp.zeros_like(vals_sorted))
        s = _segmented_scan_to_groups(ctx, masked, lb.add, is_limb=True)
        out_dt = st.decimal_for_limbs(
            nl, st.MAX_DECIMAL_PRECISION[nl], c.dtype.scale)
        if agg == "mean":
            fv = lb.to_float(s) / jnp.maximum(cnt, 1).astype(jnp.float64)
            fv = fv / float(10 ** c.dtype.scale)
            return col.PrimitiveColumn(
                wd.f64_from_value(fv), has_v, num_groups, st.float64)
        return col.PrimitiveColumn(s, has_v, num_groups, out_dt)
    if agg in ("min", "max"):
        is_min = agg == "min"
        key = vals_sorted.at[..., -1].set(
            vals_sorted[..., -1] ^ jnp.uint32(0x80000000))
        ident = jnp.full((nl,), 0xFFFFFFFF if is_min else 0, jnp.uint32)
        masked = jnp.where(ok_sorted[..., None], key,
                           jnp.broadcast_to(ident, key.shape))
        if is_min:
            combine = lambda x, y: jnp.where(
                lb.lt_unsigned(x, y)[..., None], x, y)
        else:
            combine = lambda x, y: jnp.where(
                lb.lt_unsigned(x, y)[..., None], y, x)
        best = _segmented_scan_to_groups(ctx, masked, combine, is_limb=True)
        best = best.at[..., -1].set(best[..., -1] ^ jnp.uint32(0x80000000))
        best = jnp.where(has[..., None], best, jnp.zeros_like(best))
        return col.PrimitiveColumn(best, has_v, num_groups, c.dtype)
    raise st.ComputeError(f"decimal aggregate {agg!r} unsupported")


def _segment_agg_narrow(c, ctx, agg, vals_sorted, ok_sorted, cnt, has, has_v):
    cap, num_groups = ctx.cap, ctx.num_groups
    if agg in ("sum", "mean"):
        z = jnp.where(ok_sorted, vals_sorted, jnp.zeros_like(vals_sorted))
        s = jax.ops.segment_sum(z, ctx.seg_id_safe, cap)
        if agg == "sum":
            return col.PrimitiveColumn(s, has_v, num_groups, st.from_jnp(s.dtype))
        mean = s.astype(jnp.float64) / jnp.maximum(cnt, 1).astype(jnp.float64)
        return col.PrimitiveColumn(
            wd.f64_from_value(mean), has_v, num_groups, st.float64
        )
    if agg in ("min", "max"):
        if jnp.issubdtype(vals_sorted.dtype, jnp.floating):
            ident = jnp.array(jnp.inf if agg == "min" else -jnp.inf, vals_sorted.dtype)
        else:
            info = jnp.iinfo(vals_sorted.dtype)
            ident = jnp.array(info.max if agg == "min" else info.min, vals_sorted.dtype)
        z = jnp.where(ok_sorted, vals_sorted, ident)
        fn = jax.ops.segment_min if agg == "min" else jax.ops.segment_max
        r = fn(z, ctx.seg_id_safe, cap)
        r = jnp.where(has, r, jnp.zeros_like(r))
        return col.PrimitiveColumn(r, has_v, num_groups, st.from_jnp(r.dtype))
    raise st.ComputeError(f"unknown aggregate {agg!r}")
