"""Distributed operators: hash join and group-by over a device mesh.

New components relative to the reference (SURVEY §2.5: arrow-rs is
single-node; BASELINE config 5 requires the distributed hash join).
Composition, called inside shard_map (mesh.shard_map_batches):

  distributed_hash_join = exchange(left) + exchange(right) + local join
  distributed_group_by  = local partial agg + exchange(partials by key)
                          + final re-aggregation (sum-of-sums etc.)

Skew handling (BASELINE config 5 "skewed-key equi-join"): heavy-hitter
keys are detected with a global hashed histogram (psum over a small
bucket count array); probe rows of hot keys stay LOCAL and the matching
build rows are replicated to every device with an all_gather — the
broadcast-join escape hatch that keeps a zipf head from flooding one
device's bucket.  Cold keys take the normal hash-partition exchange.

Probe chunking: splitting the probe side into row chunks makes each
chunk's exchange independent of the previous chunk's join compute, so
XLA's async collectives overlap ICI transfer with probe compute
(shuffle/probe overlap named by BASELINE config 5).

The two-phase group-by mirrors the classic combiner pattern: the local
partial aggregation bounds exchange volume by (groups x ndev), which is
the TPU analogue of the reference's dictionary-delta trick for keeping
repeated values off the wire (arrow-flight writer.rs:1330).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import schema as st
from ..config import round_up
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col
from ..ops import groupby as gb
from ..ops import join as jn
from ..ops.concat import concat_batches
from ..ops.filter import FilterPlan, apply_plan
from ..ops.take import take_record_batch
from . import shuffle


def _shrink(batch: bt.RecordBatch, new_cap: int) -> bt.RecordBatch:
    """Reduce a front-packed batch's capacity (rows beyond are dropped)."""
    if new_cap >= batch.capacity:
        return batch
    idx = col.PrimitiveColumn(
        jnp.arange(new_cap, dtype=jnp.int32), None,
        jnp.minimum(batch.length, jnp.int32(new_cap)), st.int32,
    )
    return take_record_batch(batch, idx)


def _filter_bool(batch: bt.RecordBatch, keep: jax.Array) -> bt.RecordBatch:
    keep = keep & bm.row_mask_bool(batch.capacity, batch.length)
    plan = FilterPlan(keep, None, jnp.sum(keep, dtype=jnp.int32))
    return bt.RecordBatch(
        batch.schema, tuple(apply_plan(c, plan) for c in batch.columns)
    )


def _replicate(batch: bt.RecordBatch, axis_name: str, ndev: int) -> bt.RecordBatch:
    """all_gather every shard's rows; dead/padding rows become null rows
    (harmless on a build side: null keys never match)."""
    new_cols = []
    for c in batch.columns:
        ok = c.valid_bool() & bm.row_mask_bool(c.capacity, c.length) \
            if c.validity is not None else bm.row_mask_bool(c.capacity, c.length)
        ok_g = jax.lax.all_gather(ok, axis_name, axis=0, tiled=True)
        total = jnp.int32(ok_g.shape[0])
        if isinstance(c, col.PrimitiveColumn):
            vals = jax.lax.all_gather(c.values, axis_name, axis=0, tiled=True)
            new_cols.append(col.PrimitiveColumn(vals, bm.pack(ok_g), total, c.dtype))
        elif isinstance(c, col.BooleanColumn):
            vb = jax.lax.all_gather(c.values_bool(), axis_name, axis=0, tiled=True)
            new_cols.append(col.BooleanColumn(bm.pack(vb), bm.pack(ok_g), total))
        elif isinstance(c, col.StringViewColumn):
            views_g = jax.lax.all_gather(c.views, axis_name, axis=0)  # (ndev, cap, 4)
            arena_g = jax.lax.all_gather(c.arena, axis_name, axis=0, tiled=True)
            arena_cap = c.arena.shape[0]
            shard = jnp.arange(ndev, dtype=jnp.uint32)[:, None] * jnp.uint32(arena_cap)
            long = views_g[:, :, 0] > 12
            off = jnp.where(long, views_g[:, :, 3] + shard, views_g[:, :, 3])
            views_g = views_g.at[:, :, 3].set(off).reshape(-1, 4)
            new_cols.append(col.StringViewColumn(
                views_g, arena_g, bm.pack(ok_g), total, c.dtype, c.len_bound))
        else:
            raise st.ComputeError(
                f"replicate: unsupported column {type(c).__name__} "
                "(dictionary-encode or cast first)"
            )
    return bt.RecordBatch(batch.schema, tuple(new_cols))


def detect_hot_buckets(batch: bt.RecordBatch, on: Sequence[str], *,
                       axis_name: str, threshold_frac: float,
                       num_buckets: int = 4096):
    """Global hashed key histogram -> (num_buckets,) bool hot-bucket mask +
    this shard's per-row hot flag.  A bucket is hot when its global row
    count exceeds threshold_frac of the global row count (false positives
    just broadcast a little more build data; never incorrect)."""
    from ..rowformat import encode as rf
    from ..rowformat import hashing as hsh

    planes = rf.encode_columns([batch[k] for k in on])
    h = hsh.hash_planes(planes, seed=0x517E)
    live = bm.row_mask_bool(batch.capacity, batch.length)
    hb = (h % jnp.uint32(num_buckets)).astype(jnp.int32)
    hist = jnp.bincount(jnp.where(live, hb, num_buckets),
                        length=num_buckets + 1)[:num_buckets]
    ghist = jax.lax.psum(hist, axis_name)
    gtotal = jax.lax.psum(jnp.sum(live, dtype=jnp.int32), axis_name)
    hot = ghist.astype(jnp.float32) > (
        jnp.float32(threshold_frac) * gtotal.astype(jnp.float32)
    )
    return hot, hot[hb] & live


def _row_chunks(batch: bt.RecordBatch, k: int):
    cap = batch.capacity
    step = round_up(-(-cap // k))
    out = []
    for i in range(k):
        lo = i * step
        if lo >= cap:
            break
        n = min(step, cap - lo)
        ln = jnp.clip(batch.length - jnp.int32(lo), 0, n)
        idx = col.PrimitiveColumn(
            jnp.arange(lo, lo + n, dtype=jnp.int32), None, ln, st.int32
        )
        out.append(take_record_batch(batch, idx))
    return out


def distributed_hash_join(left: bt.RecordBatch, right: bt.RecordBatch,
                          on: Sequence[str], *, num_partitions: int,
                          axis_name: str = "d", how: str = "inner",
                          bucket_slack: float = 2.0,
                          out_capacity: Optional[int] = None,
                          skew_threshold: Optional[float] = None,
                          hot_capacity: Optional[int] = None,
                          probe_chunks: int = 1):
    """Both sides hash-partitioned on the join key over the mesh axis,
    then joined locally.  Equal keys meet on the same device because both
    exchanges use the same key hash.

    skew_threshold (e.g. 0.01): keys above this global row-fraction skip
    the exchange — their build rows replicate via all_gather and their
    probe rows join locally.  probe_chunks > 1 pipelines the cold-side
    exchange with join compute."""
    if skew_threshold is not None:
        # probe-side hotness decided by the PROBE key histogram; both sides
        # must agree on the predicate, so evaluate hot_l on each side's keys
        hot_l, _ = detect_hot_buckets(
            left.project(on), on, axis_name=axis_name,
            threshold_frac=skew_threshold)
        from ..rowformat import encode as rf
        from ..rowformat import hashing as hsh

        def hot_flag(b):
            planes = rf.encode_columns([b[k] for k in on])
            h = hsh.hash_planes(planes, seed=0x517E)
            hb = (h % jnp.uint32(hot_l.shape[0])).astype(jnp.int32)
            return hot_l[hb] & bm.row_mask_bool(b.capacity, b.length)

        l_hot_mask = hot_flag(left)
        r_hot_mask = hot_flag(right)
        l_cold = _filter_bool(left, ~l_hot_mask)
        r_cold = _filter_bool(right, ~r_hot_mask)
        cold_out, cold_info = distributed_hash_join(
            l_cold, r_cold, on, num_partitions=num_partitions,
            axis_name=axis_name, how=how, bucket_slack=bucket_slack,
            out_capacity=out_capacity, probe_chunks=probe_chunks,
        )
        hcap = hot_capacity or round_up(max(right.capacity // 4, 128))
        r_hot = _shrink(_filter_bool(right, r_hot_mask), hcap)
        hot_overflow = jnp.sum(r_hot_mask, dtype=jnp.int32) > jnp.int32(hcap)
        r_hot_all = _replicate(r_hot, axis_name, num_partitions)
        l_hot = _filter_bool(left, l_hot_mask)
        hot_out, hot_info = jn.hash_join(
            l_hot, r_hot_all, on, how=how, out_capacity=out_capacity)
        out = concat_batches([cold_out, hot_out])
        return out, jn.JoinInfo(
            cold_info.duplicates | hot_info.duplicates,
            cold_info.overflow | hot_info.overflow | hot_overflow,
        )

    r_ex = shuffle.exchange(right, on, axis_name=axis_name,
                            num_partitions=num_partitions,
                            bucket_slack=bucket_slack)
    if probe_chunks <= 1:
        l_ex = shuffle.exchange(left, on, axis_name=axis_name,
                                num_partitions=num_partitions,
                                bucket_slack=bucket_slack)
        return jn.hash_join(l_ex, r_ex, on, how=how,
                            out_capacity=out_capacity)
    # pipelined: chunk k+1's exchange is independent of chunk k's join, so
    # XLA's async collectives overlap ICI with probe compute
    table = jn.build_table([r_ex[k] for k in on])
    outs = []
    infos = []
    for chunk in _row_chunks(left, probe_chunks):
        c_ex = shuffle.exchange(chunk, on, axis_name=axis_name,
                                num_partitions=num_partitions,
                                bucket_slack=bucket_slack)
        o, info = _probe_join(table, c_ex, r_ex, on, how=how,
                              out_capacity=out_capacity)
        outs.append(o)
        infos.append(info)
    out = concat_batches(outs)
    dup = infos[0].duplicates
    ovf = infos[0].overflow
    for i in infos[1:]:
        dup = dup | i.duplicates
        ovf = ovf | i.overflow
    return out, jn.JoinInfo(dup, ovf)


def _probe_join(table, left, right, on, *, how, out_capacity):
    """Local join against a pre-built table (chunked-probe path)."""
    match = jn.probe_table(table, [left[k] for k in on])
    probe_live = bm.row_mask_bool(left.capacity, left.length)
    out_cap = round_up(out_capacity if out_capacity is not None
                       else left.capacity)
    left_idx, right_idx, out_len, overflow = jn._expand_matches(
        table, match, probe_live, out_cap, keep_unmatched=(how == "left")
    )
    lidx = col.PrimitiveColumn(left_idx, None, out_len, st.int32)
    ridx = col.PrimitiveColumn(right_idx, None, out_len, st.int32)
    from ..ops.take import take

    left_cols = [take(c, lidx) for c in left.columns]
    right_on = list(on)
    right_keep = [n for n in right.schema.names if n not in set(right_on)]
    right_cols = [take(right[n], ridx) for n in right_keep]
    out_names = jn._dedup_names(left.schema.names, right_keep)
    fields = list(left.schema.fields) + [
        st.Field(nm, c.dtype) for nm, c in zip(out_names, right_cols)
    ]
    return (
        bt.RecordBatch(st.Schema(tuple(fields)),
                       tuple(left_cols) + tuple(right_cols)),
        jn.JoinInfo(table.duplicates, overflow),
    )


_MERGE = {
    "sum": "sum",
    "count": "sum",  # counts re-aggregate by summing
    "min": "min",
    "max": "max",
}


def distributed_group_by(batch: bt.RecordBatch, keys: Sequence[str],
                         aggs: Sequence[Tuple[str, str]], *,
                         num_partitions: int, axis_name: str = "d",
                         bucket_slack: float = 2.0) -> bt.RecordBatch:
    """Two-phase grouped aggregation.  `mean` is decomposed into
    sum+count locally and finalized after the merge."""
    local_aggs = []
    finalizers = []  # (out_name, kind, source names in merged batch)
    for name, agg in aggs:
        if agg == "mean":
            local_aggs += [(name, "sum"), (name, "count")]
            finalizers.append((f"mean_{name}", "mean", f"sum_{name}", f"count_{name}"))
        elif agg in _MERGE:
            local_aggs.append((name, agg))
            finalizers.append((f"{agg}_{name}", "direct", f"{agg}_{name}", None))
        else:
            raise st.ComputeError(f"unknown aggregate {agg!r}")
    # de-dup local aggs (mean may duplicate an explicit sum/count)
    seen = set()
    local_aggs = [a for a in local_aggs if not (a in seen or seen.add(a))]

    partial = gb.group_by(batch, keys, local_aggs)
    merged_in = shuffle.exchange(partial, keys, axis_name=axis_name,
                                 num_partitions=num_partitions,
                                 bucket_slack=bucket_slack)
    merge_aggs = [
        (f"{agg}_{name}", _MERGE[agg]) for name, agg in local_aggs
    ]
    merged = gb.group_by(merged_in, keys, merge_aggs)
    # merged columns are named e.g. sum_sum_v / sum_count_v / min_min_v
    out_fields = [merged.schema.field(k) for k in keys]
    out_cols = [merged[k] for k in keys]
    for out_name, kind, src_a, src_b in finalizers:
        if kind == "direct":
            name, agg = src_a.split("_", 1)[1], src_a.split("_", 1)[0]
            c = merged[f"{_MERGE[agg]}_{src_a}"]
            out_fields.append(st.Field(out_name, c.dtype))
            out_cols.append(c)
        else:  # mean
            s = merged[f"sum_{src_a}"]
            n = merged[f"sum_{src_b}"]
            from ..ops import arity

            mean = arity.binary(
                s, n, lambda a, b: a.astype(jnp.float64)
                / jnp.maximum(b, 1).astype(jnp.float64),
                st.float64,
            )
            # group with zero valid values -> null mean
            zero = arity.binary_boolean_out(n, 0, lambda a, b: a > b)
            validity = bm.union(mean.validity, zero.values)
            mean = mean.with_validity(validity)
            out_fields.append(st.Field(out_name, st.float64))
            out_cols.append(mean)
    return bt.RecordBatch(st.Schema(tuple(out_fields)), tuple(out_cols))
