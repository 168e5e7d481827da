"""Distributed operators: hash join and group-by over a device mesh.

New components relative to the reference (SURVEY §2.5: arrow-rs is
single-node; BASELINE config 5 requires the distributed hash join).
Composition, called inside shard_map (mesh.shard_map_batches):

  distributed_hash_join = exchange(left) + exchange(right) + local join
  distributed_group_by  = local partial agg + exchange(partials by key)
                          + final re-aggregation (sum-of-sums etc.)

The two-phase group-by mirrors the classic combiner pattern: the local
partial aggregation bounds exchange volume by (groups x ndev), which is
the TPU analogue of the reference's dictionary-delta trick for keeping
repeated values off the wire (arrow-flight writer.rs:1330).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from .. import schema as st
from ..core import batch as bt
from ..ops import groupby as gb
from ..ops import join as jn
from . import shuffle


def distributed_hash_join(left: bt.RecordBatch, right: bt.RecordBatch,
                          on: Sequence[str], *, num_partitions: int,
                          axis_name: str = "d", how: str = "inner",
                          bucket_slack: float = 1.0):
    """Both sides hash-partitioned on the join key over the mesh axis,
    then joined locally.  Equal keys meet on the same device because both
    exchanges use the same key hash."""
    l_ex = shuffle.exchange(left, on, axis_name=axis_name,
                            num_partitions=num_partitions,
                            bucket_slack=bucket_slack)
    r_ex = shuffle.exchange(right, on, axis_name=axis_name,
                            num_partitions=num_partitions,
                            bucket_slack=bucket_slack)
    return jn.hash_join(l_ex, r_ex, on, how=how)


_MERGE = {
    "sum": "sum",
    "count": "sum",  # counts re-aggregate by summing
    "min": "min",
    "max": "max",
}


def distributed_group_by(batch: bt.RecordBatch, keys: Sequence[str],
                         aggs: Sequence[Tuple[str, str]], *,
                         num_partitions: int, axis_name: str = "d",
                         bucket_slack: float = 1.0) -> bt.RecordBatch:
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
            from ..core import bitmap as bm

            zero = arity.binary_boolean_out(n, 0, lambda a, b: a > b)
            validity = bm.union(mean.validity, zero.values)
            mean = mean.with_validity(validity)
            out_fields.append(st.Field(out_name, st.float64))
            out_cols.append(mean)
    return bt.RecordBatch(st.Schema(tuple(out_fields)), tuple(out_cols))
