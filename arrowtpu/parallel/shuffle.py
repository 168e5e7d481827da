"""Hash-partition exchange: the distributed shuffle operator.

The reference's exchange layer is Arrow Flight DoGet/DoPut streams of
IPC-framed batches (/root/reference/arrow-flight/src/encode.rs:269,
SURVEY §5.8).  TPU-native replacement: rows are hash-partitioned by their
row-format key hash and exchanged with one jax.lax.all_to_all over the
mesh axis — the device-resident layout IS the wire layout, no
serialization.  Per-destination row counts ride along, so the exchange is
logically ragged over statically padded buckets (the "ragged all-to-all"
of SURVEY §5.8; bucket capacity is a slack-factor knob, the analogue of
Flight's max_flight_data_size frame cap).

Runs INSIDE shard_map (see mesh.shard_map_batches): every function here
takes the local shard and an axis_name.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .. import schema as st
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col
from ..rowformat import encode as rf
from ..rowformat import hashing as hsh


def partition_ids(batch: bt.RecordBatch, key_names: Sequence[str],
                  num_partitions: int) -> jax.Array:
    """(capacity,) int32 destination partition for each live row."""
    planes = rf.encode_columns([batch[k] for k in key_names])
    h = hsh.hash_planes(planes, seed=0x5157)
    return (h % jnp.uint32(num_partitions)).astype(jnp.int32)


def _bucketize(values, dest, order, counts, starts, ndev: int, bucket_cap: int):
    """Gather rows (already sorted by dest via `order`) into (ndev,
    bucket_cap) slabs; rows beyond a bucket's count are padding."""
    p = jnp.arange(ndev * bucket_cap, dtype=jnp.int32)
    d = p // bucket_cap
    j = p % bucket_cap
    src_sorted = starts[d] + j
    valid = j < counts[d]
    src = order[jnp.clip(src_sorted, 0, order.shape[0] - 1)]
    out = values[src]
    shape = (ndev, bucket_cap) + values.shape[1:]
    zero = jnp.zeros((), out.dtype)
    sel = valid.reshape((ndev * bucket_cap,) + (1,) * (values.ndim - 1))
    return jnp.where(sel, out, zero).reshape(shape)


def _unbucketize(slabs, counts, total_cap: int):
    """Inverse: (ndev, bucket_cap, ...) + per-bucket counts -> flat
    (total_cap, ...) with live rows front-packed."""
    ndev, bucket_cap = slabs.shape[0], slabs.shape[1]
    flat = slabs.reshape((ndev * bucket_cap,) + slabs.shape[2:])
    ends = jnp.cumsum(counts)
    starts = ends - counts
    i = jnp.arange(total_cap, dtype=jnp.int32)
    d = jnp.searchsorted(ends, i, side="right").astype(jnp.int32)
    d_c = jnp.clip(d, 0, ndev - 1)
    j = i - starts[d_c]
    src = d_c * bucket_cap + jnp.clip(j, 0, bucket_cap - 1)
    ok = (d < ndev) & (j < counts[d_c])
    out = flat[src]
    sel = ok.reshape((total_cap,) + (1,) * (out.ndim - 1))
    return jnp.where(sel, out, jnp.zeros((), out.dtype)), ends[-1]


def exchange(batch: bt.RecordBatch, key_names: Sequence[str], *,
             axis_name: str = "d", num_partitions: int,
             bucket_slack: float = 1.0) -> bt.RecordBatch:
    """Shuffle rows so that rows with equal keys land on the same device
    (dest = key_hash % ndev).  Call inside shard_map.

    bucket_slack scales per-destination bucket capacity; 1.0 means each
    bucket can hold the full local capacity (always safe, ndev x memory).
    Output capacity = ndev * bucket_cap (worst-case receive)."""
    ndev = num_partitions
    cap = batch.capacity
    live = bm.row_mask_bool(cap, batch.length)
    dest = jnp.where(live, partition_ids(batch, key_names, ndev), ndev)

    # stable sort rows by destination
    order = jnp.argsort(dest, stable=True).astype(jnp.int32)
    counts = jnp.bincount(jnp.clip(dest, 0, ndev), length=ndev + 1)[:ndev]
    counts = counts.astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts

    from ..config import round_up

    bucket_cap = round_up(max(int(cap * bucket_slack), 128))

    def build_slabs(values):
        return _bucketize(values, dest, order, counts, starts, ndev, bucket_cap)

    # exchange per column (values + validity), plus counts
    recv_counts = jax.lax.all_to_all(
        counts.reshape(ndev, 1), axis_name, split_axis=0, concat_axis=0,
        tiled=False,
    ).reshape(ndev)

    out_cap = ndev * bucket_cap
    new_cols = []
    for c in batch.columns:
        new_cols.append(
            _exchange_column(c, build_slabs, recv_counts, axis_name, out_cap)
        )
    return bt.RecordBatch(batch.schema, tuple(new_cols))


def _a2a(slabs, axis_name):
    """(ndev, bucket_cap, ...) send -> receive, bucket d goes to device d."""
    return jax.lax.all_to_all(
        slabs, axis_name, split_axis=0, concat_axis=0, tiled=False
    )


def _exchange_column(c, build_slabs, recv_counts, axis_name, out_cap):
    if isinstance(c, col.DictionaryColumn):
        # dictionary values are replicated; exchange keys only
        import dataclasses

        keys = _exchange_column(
            c.keys, build_slabs, recv_counts, axis_name, out_cap
        )
        return dataclasses.replace(c, keys=keys)
    if isinstance(c, col.StringViewColumn):
        raise st.ComputeError(
            "exchange of plain string columns not supported yet — "
            "dictionary-encode first (dictionary_encode_host)"
        )
    ok_slabs = _a2a(build_slabs(c.valid_bool()), axis_name)
    ok_flat, total = _unbucketize(ok_slabs, recv_counts, out_cap)
    if isinstance(c, col.BooleanColumn):
        val_slabs = _a2a(build_slabs(c.values_bool()), axis_name)
        vals, _ = _unbucketize(val_slabs, recv_counts, out_cap)
        return col.BooleanColumn(bm.pack(vals), bm.pack(ok_flat), total)
    if isinstance(c, col.PrimitiveColumn):
        val_slabs = _a2a(build_slabs(c.values), axis_name)
        vals, _ = _unbucketize(val_slabs, recv_counts, out_cap)
        return col.PrimitiveColumn(vals, bm.pack(ok_flat), total, c.dtype)
    if isinstance(c, col.NullColumn):
        return col.NullColumn(jnp.int32(jnp.sum(recv_counts)), out_cap)
    raise st.ComputeError(f"exchange: unsupported column {type(c).__name__}")
