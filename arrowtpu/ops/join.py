"""Hash equi-join: HBM open-addressing build/probe.

The reference has no join (BASELINE names the hash build/probe layer as
first-class new work; the reference's contribution is the key layout —
row-format planes — and the selection algebra used to materialize
results).  Single-chip kernel here; the distributed layer
(parallel.distributed) wraps it with hash partitioning + all-to-all.

Design (TPU-first):
  * keys -> order-preserving uint32 planes (rowformat.encode) -> murmur
    hash (rowformat.hashing).  SQL semantics: a NULL key never matches.
  * build: open-addressing table of size next_pow2(2*capacity) in HBM,
    slots hold build row-ids.  Insertion is a vectorized linear-probe
    loop (lax.while_loop): every pending row scatter-mins its row-id into
    its candidate slot; winners retire; losers bump their probe offset.
    Terminates in O(max chain) rounds, each a full-vector scatter/gather —
    no per-row serial loop.
  * probe: vectorized chase — gather slot, compare planes, advance
    colliding rows until all resolved.
  * duplicate build keys: first occurrence wins and a traced
    `duplicates` flag reports that the build side was not unique (PK-join
    contract; N:M join lands with the sort-merge path).

Outputs use the engine's selection machinery: inner join = FilterPlan
compaction of matched probe rows + take() on both sides.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import schema as st
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col
from ..rowformat import encode as rf
from ..rowformat import hashing as hsh
from .filter import FilterPlan, apply_plan
from .take import take


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _key_planes_and_valid(columns: Sequence[col.Column]):
    """Planes (sentinel included) + 'all key parts non-null & live' mask."""
    planes = rf.encode_columns(columns)
    valid = bm.row_mask_bool(columns[0].capacity, columns[0].length)
    for c in columns:
        if c.validity is not None:
            valid = valid & bm.unpack(c.validity)
    return planes, valid


@dataclasses.dataclass(frozen=True)
class HashTable:
    """Built hash side (reference-free; new component)."""

    slots: jax.Array  # (table_size,) int32 build row id or -1
    hashes: jax.Array  # (build_cap,) uint32
    planes: Tuple[jax.Array, ...]  # build key planes
    valid: jax.Array  # (build_cap,) bool
    duplicates: jax.Array  # traced bool: build keys not unique


jax.tree_util.register_dataclass(
    HashTable,
    data_fields=["slots", "hashes", "planes", "valid", "duplicates"],
    meta_fields=[],
)


def build_table(key_cols: Sequence[col.Column], *, slack: int = 2) -> HashTable:
    cap = key_cols[0].capacity
    size = _next_pow2(max(slack * cap, 16))
    mask = jnp.uint32(size - 1)
    planes, valid = _key_planes_and_valid(key_cols)
    h = hsh.hash_planes(planes)
    rowid = jnp.arange(cap, dtype=jnp.int32)

    EMPTY = jnp.int32(2**31 - 1)  # in-loop empty sentinel (min-friendly)
    slots0 = jnp.full((size,), EMPTY, dtype=jnp.int32)
    pending0 = valid
    offset0 = jnp.zeros(cap, dtype=jnp.uint32)
    dup0 = jnp.zeros((), dtype=jnp.bool_)

    def planes_eq(rows_a, rows_b):
        """Compare build keys of two row-id vectors plane-by-plane."""
        eq = jnp.ones(rows_a.shape, jnp.bool_)
        for p in planes:
            eq = eq & (p[rows_a] == p[rows_b])
        return eq

    def cond(state):
        _, pending, _, _ = state
        return jnp.any(pending)

    def body(state):
        slots, pending, offset, dup = state
        pos = ((h + offset) & mask).astype(jnp.int32)
        scatter_pos = jnp.where(pending, pos, size)  # inactive -> OOB drop
        # candidates compete in a fresh array; occupied slots never change
        # (scatter-min directly into `slots` would let a smaller row-id
        # steal a slot won in an earlier round, losing that entry)
        cand = jnp.full_like(slots, EMPTY).at[scatter_pos].min(rowid, mode="drop")
        slots2 = jnp.where(slots == EMPTY, cand, slots)
        occupant = slots2[pos]
        won = pending & (occupant == rowid)
        same_key = (
            pending
            & ~won
            & (occupant != EMPTY)
            & planes_eq(jnp.clip(occupant, 0, cap - 1), rowid)
        )
        dup = dup | jnp.any(same_key)
        pending2 = pending & ~won & ~same_key  # dup keys retire, first wins
        offset2 = jnp.where(pending2, offset + 1, offset)
        return slots2, pending2, offset2, dup

    slots, _, _, dup = jax.lax.while_loop(
        cond, body, (slots0, pending0, offset0, dup0)
    )
    slots = jnp.where(slots == EMPTY, jnp.int32(-1), slots)
    return HashTable(slots, h, tuple(planes), valid, dup)


def probe_table(table: HashTable, key_cols: Sequence[col.Column]) -> jax.Array:
    """Returns (probe_cap,) int32: matching build row id, or -1."""
    cap = key_cols[0].capacity
    size = table.slots.shape[0]
    mask = jnp.uint32(size - 1)
    planes, valid = _key_planes_and_valid(key_cols)
    h = hsh.hash_planes(planes)

    build_cap = table.valid.shape[0]

    def planes_eq(build_rows, probe_rows):
        eq = jnp.ones(build_rows.shape, jnp.bool_)
        for bp, pp in zip(table.planes, planes):
            eq = eq & (bp[build_rows] == pp[probe_rows])
        return eq

    probe_rowid = jnp.arange(cap, dtype=jnp.int32)
    state0 = (
        jnp.full((cap,), -1, dtype=jnp.int32),  # result
        valid,  # pending
        jnp.zeros(cap, dtype=jnp.uint32),  # offset
    )

    def cond(state):
        _, pending, _ = state
        return jnp.any(pending)

    def body(state):
        result, pending, offset = state
        pos = ((h + offset) & mask).astype(jnp.int32)
        occupant = table.slots[pos]
        empty = occupant == -1
        occ_clamped = jnp.clip(occupant, 0, build_cap - 1)
        match = pending & ~empty & planes_eq(occ_clamped, probe_rowid)
        result2 = jnp.where(match, occupant, result)
        pending2 = pending & ~match & ~empty
        offset2 = jnp.where(pending2, offset + 1, offset)
        return result2, pending2, offset2

    result, _, _ = jax.lax.while_loop(cond, body, state0)
    return result


def _suffix_names(schema_l: st.Schema, schema_r: st.Schema):
    left_names = set(schema_l.names)
    return [
        (n + "_right") if n in left_names else n for n in schema_r.names
    ]


def hash_join(left: bt.RecordBatch, right: bt.RecordBatch,
              on: Sequence[str], *, how: str = "inner",
              right_on: Sequence[str] | None = None):
    """PK equi-join: right (build) side keys must be unique.
    how in {inner, left, semi, anti}.  Returns (batch, duplicates_flag)."""
    right_on = list(right_on or on)
    table = build_table([right[k] for k in right_on])
    match = probe_table(table, [left[k] for k in on])
    matched = match >= 0

    if how in ("semi", "anti"):
        keepb = matched if how == "semi" else (
            ~matched & bm.row_mask_bool(left.capacity, left.length)
        )
        plan = _plan_from_bool(keepb, left.capacity, left.length)
        out = bt.RecordBatch(
            left.schema, tuple(apply_plan(c, plan) for c in left.columns)
        )
        return out, table.duplicates

    if how == "inner":
        keepb = matched & bm.row_mask_bool(left.capacity, left.length)
        plan = _plan_from_bool(keepb, left.capacity, left.length)
        left_cols = [apply_plan(c, plan) for c in left.columns]
        match_col = col.PrimitiveColumn(
            _scatter_vals(match, plan), None, plan.count, st.int32
        )
    elif how == "left":
        keepb = bm.row_mask_bool(left.capacity, left.length)
        left_cols = list(left.columns)
        match_col = col.PrimitiveColumn(
            match, bm.pack(matched & keepb), left.length, st.int32
        )
    else:
        raise st.ComputeError(f"join: unknown how={how!r}")

    right_keep = [n for n in right.schema.names if n not in set(right_on)]
    right_cols = [take(right[n], match_col) for n in right_keep]
    out_names = _dedup_names(left.schema.names, right_keep)
    fields = list(left.schema.fields) + [
        st.Field(nm, c.dtype) for nm, c in zip(out_names, right_cols)
    ]
    return (
        bt.RecordBatch(st.Schema(tuple(fields)), tuple(left_cols) + tuple(right_cols)),
        table.duplicates,
    )


def _dedup_names(left_names, right_names):
    taken = set(left_names)
    return [n + "_right" if n in taken else n for n in right_names]


def _plan_from_bool(keep, cap, length):
    incl = jnp.cumsum(keep.astype(jnp.int32))
    return FilterPlan(keep, incl - 1, incl[-1])


def _scatter_vals(values, plan: FilterPlan):
    cap = plan.keep.shape[0]
    idx = jnp.where(plan.keep, plan.pos, cap)
    return jnp.zeros_like(values).at[idx].set(values, mode="drop")
