"""Hash-partition exchange: the distributed shuffle operator.

The reference's exchange layer is Arrow Flight DoGet/DoPut streams of
IPC-framed batches (/root/reference/arrow-flight/src/encode.rs:269,
SURVEY §5.8).  TPU-native replacement: rows are hash-partitioned by their
row-format key hash and exchanged over the mesh axis — the device-resident
layout IS the wire layout, no serialization.

Two physical strategies (the analogue of Flight's frame-size capping,
encode.rs:197):

  * ragged (TPU): rows are dest-sorted once, then ONE
    jax.lax.ragged_all_to_all moves exactly the live rows; receive side is
    front-packed by construction.  Memory = capacity in, ~slack*capacity
    out.  (XLA:CPU does not implement ragged-all-to-all, so tests fall
    back to:)
  * capped buckets: per-destination slabs of bucket_cap =
    round_up(slack * capacity / ndev) rows through a dense all_to_all.
    Memory is ~slack*capacity on both sides — NOT ndev*capacity; a
    traced `overflow` flag reports buckets that exceeded their cap
    (capacity+count contract: caller re-runs with more slack).

Variable-length strings exchange as fixed-width planes: the (rows, L)
byte matrix (L = static len_bound) rides the same primitive as any other
plane and the view column is rebuilt on the receive side
(ops/strings.from_byte_matrix) — the "ship arena bytes" strategy; callers
with low-cardinality strings should dictionary-encode first and exchange
keys only.

Runs INSIDE shard_map (see mesh.shard_map_batches): every function here
takes the local shard and an axis_name.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .. import schema as st
from ..config import round_up
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


@dataclasses.dataclass(frozen=True)
class ExchangePlan:
    """Dest-sort + per-bucket bookkeeping, computed once per batch and
    shared by every column (the FilterPlan pattern applied to shuffle)."""

    order: jax.Array        # (cap,) int32 row ids sorted by destination
    counts: jax.Array       # (ndev,) int32 rows to each destination
    starts: jax.Array       # (ndev,) int32 exclusive cumsum of counts
    recv_counts: jax.Array  # (ndev,) int32 rows from each source
    overflow: jax.Array     # traced bool: rows truncated somewhere
    ndev: int
    bucket_cap: int         # bucket path: rows per destination slab
    out_cap: int            # receive-side row capacity
    ragged: bool
    # ragged path only:
    send_sizes: jax.Array | None = None     # (ndev,) granted send sizes
    output_offsets: jax.Array | None = None  # (ndev,) dest-side offsets
    recv_sizes: jax.Array | None = None     # (ndev,) granted recv sizes


jax.tree_util.register_dataclass(
    ExchangePlan,
    data_fields=["order", "counts", "starts", "recv_counts", "overflow",
                 "send_sizes", "output_offsets", "recv_sizes"],
    meta_fields=["ndev", "bucket_cap", "out_cap", "ragged"],
)


def _ragged_supported() -> bool:
    return jax.default_backend() != "cpu"


def build_exchange_plan(batch: bt.RecordBatch, key_names: Sequence[str], *,
                        axis_name: str, num_partitions: int,
                        bucket_slack: float = 2.0,
                        use_ragged: str | bool = "auto") -> ExchangePlan:
    ndev = num_partitions
    cap = batch.capacity
    live = bm.row_mask_bool(cap, batch.length)
    dest = jnp.where(live, partition_ids(batch, key_names, ndev), ndev)

    order = jnp.argsort(dest, stable=True).astype(jnp.int32)
    counts = jnp.bincount(jnp.clip(dest, 0, ndev), length=ndev + 1)[:ndev]
    counts = counts.astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts

    recv_counts = jax.lax.all_to_all(
        counts.reshape(ndev, 1), axis_name, split_axis=0, concat_axis=0,
        tiled=False,
    ).reshape(ndev)

    ragged = _ragged_supported() if use_ragged == "auto" else bool(use_ragged)
    if ragged:
        out_cap = round_up(max(int(cap * bucket_slack), 128))
        # clamp receives to out_cap; grant the clamped sizes back to senders
        recv_starts = jnp.cumsum(recv_counts) - recv_counts
        granted = jnp.clip(jnp.int32(out_cap) - recv_starts, 0, recv_counts)
        send_sizes = jax.lax.all_to_all(
            granted.reshape(ndev, 1), axis_name, split_axis=0, concat_axis=0,
            tiled=False,
        ).reshape(ndev)
        output_offsets = jax.lax.all_to_all(
            recv_starts.reshape(ndev, 1), axis_name, split_axis=0,
            concat_axis=0, tiled=False,
        ).reshape(ndev)
        overflow = jnp.any(granted < recv_counts) | jnp.any(send_sizes < counts)
        return ExchangePlan(order, counts, starts, granted, overflow,
                            ndev, 0, out_cap, True,
                            send_sizes=send_sizes,
                            output_offsets=output_offsets,
                            recv_sizes=granted)
    bucket_cap = round_up(max(-(-int(cap * bucket_slack) // ndev), 128), 128)
    out_cap = ndev * bucket_cap
    overflow = jnp.any(counts > jnp.int32(bucket_cap))
    recv_clamped = jnp.minimum(recv_counts, jnp.int32(bucket_cap))
    return ExchangePlan(order, counts, starts, recv_clamped, overflow,
                        ndev, bucket_cap, out_cap, False)


# ---------------------------------------------------------------------------
# plane movement (shared by both strategies)
# ---------------------------------------------------------------------------


def _bucketize(values, order, counts, starts, ndev: int, bucket_cap: int):
    """Gather rows (already dest-sorted via `order`) into (ndev,
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


def _move_plane(values: jax.Array, plan: ExchangePlan, axis_name: str):
    """Exchange one (cap, ...) plane; returns (out_cap, ...) front-packed."""
    if plan.ragged:
        sorted_vals = values[plan.order]
        out_buf = jnp.zeros((plan.out_cap,) + values.shape[1:], values.dtype)
        return jax.lax.ragged_all_to_all(
            sorted_vals, out_buf, plan.starts, plan.send_sizes,
            plan.output_offsets, plan.recv_sizes, axis_name=axis_name,
        )
    slabs = _bucketize(values, plan.order, plan.counts, plan.starts,
                       plan.ndev, plan.bucket_cap)
    recv = jax.lax.all_to_all(
        slabs, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    out, _ = _unbucketize(recv, plan.recv_counts, plan.out_cap)
    return out


def _move_bool(values_bool, plan, axis_name):
    return _move_plane(values_bool.astype(jnp.uint8), plan, axis_name) != 0


# ---------------------------------------------------------------------------
# column / batch exchange
# ---------------------------------------------------------------------------


def exchange_column(c: col.Column, plan: ExchangePlan, axis_name: str):
    total = jnp.sum(plan.recv_counts)
    if isinstance(c, col.NullColumn):
        return col.NullColumn(total, plan.out_cap)
    if isinstance(c, col.DictionaryColumn):
        # dictionary values are replicated; exchange keys only
        keys = exchange_column(c.keys, plan, axis_name)
        return dataclasses.replace(c, keys=keys)
    ok = _move_bool(c.valid_bool(), plan, axis_name)
    if isinstance(c, col.BooleanColumn):
        vals = _move_bool(c.values_bool(), plan, axis_name)
        return col.BooleanColumn(bm.pack(vals), bm.pack(ok), total)
    if isinstance(c, col.PrimitiveColumn):
        vals = _move_plane(c.values, plan, axis_name)
        return col.PrimitiveColumn(vals, bm.pack(ok), total, c.dtype)
    if isinstance(c, col.StringViewColumn):
        # fixed-width reshipping of the byte matrix; L is static len_bound
        from ..ops.strings import byte_matrix, from_byte_matrix, max_byte_length

        L = max_byte_length(c)
        mat, lens = byte_matrix(c, L)
        # words, not bytes: byte gathers lower to one-hot matmuls on TPU
        mat32 = jax.lax.bitcast_convert_type(mat.reshape(-1, L // 4, 4),
                                             jnp.uint32)
        recv32 = _move_plane(mat32, plan, axis_name)
        recv_mat = jax.lax.bitcast_convert_type(recv32, jnp.uint8).reshape(
            plan.out_cap, L)
        recv_lens = _move_plane(lens.astype(jnp.int32), plan, axis_name)
        return from_byte_matrix(recv_mat, recv_lens, bm.pack(ok), total, c.dtype)
    raise st.ComputeError(f"exchange: unsupported column {type(c).__name__}")


def exchange(batch: bt.RecordBatch, key_names: Sequence[str], *,
             axis_name: str = "d", num_partitions: int,
             bucket_slack: float = 2.0, use_ragged: str | bool = "auto",
             return_overflow: bool = False):
    """Shuffle rows so that rows with equal keys land on the same device
    (dest = key_hash % ndev).  Call inside shard_map.

    bucket_slack scales receive capacity relative to the local capacity
    (2.0 = receive side can hold 2x the expected uniform share).  Returns
    the exchanged batch (capacity ~ slack * cap); with return_overflow,
    also the traced truncation flag."""
    plan = build_exchange_plan(batch, key_names, axis_name=axis_name,
                               num_partitions=num_partitions,
                               bucket_slack=bucket_slack,
                               use_ragged=use_ragged)
    new_cols = tuple(
        exchange_column(c, plan, axis_name) for c in batch.columns
    )
    out = bt.RecordBatch(batch.schema, new_cols)
    if return_overflow:
        return out, plan.overflow
    return out
