"""Hash equi-join: HBM open-addressing build/probe with general N:M output.

The reference has no join (BASELINE names the hash build/probe layer as
first-class new work; the reference's contribution is the key layout —
row-format planes, arrow-row/src/lib.rs:568 — and the selection algebra
used to materialize results).  Single-chip kernel here; the distributed
layer (parallel.distributed) wraps it with hash partitioning + all-to-all
and hot-key handling.

Design (TPU-first):
  * keys -> order-preserving uint32 planes (rowformat.encode) -> murmur
    hash (rowformat.hashing).  SQL semantics: a NULL key never matches.
  * build, two structures sharing the key planes:
      1. an open-addressing table of size next_pow2(2*capacity) in HBM
         whose slots hold ONE representative build row-id per distinct
         key.  Insertion is a vectorized linear-probe loop
         (lax.while_loop): every pending row scatter-mins its row-id into
         its candidate slot; winners retire; rows that meet an equal key
         retire too (the group is reachable through the representative).
         Terminates in O(max chain) rounds, each a full-vector
         scatter/gather — no per-row serial loop.
      2. a *group index*: build rows stable-sorted by key planes
         (jax.lax.sort), plus per-row group start/size in that order.
         Any member row-id (e.g. the table representative) indexes the
         whole duplicate group — this is what lifts the join to N:M.
  * probe: vectorized chase — gather slot, compare planes, advance
    colliding rows until all resolved -> representative row id or -1.
  * N:M expansion: per-probe match counts -> cumsum -> each output slot
    finds its probe row by searchsorted and its duplicate ordinal by
    offset arithmetic; both sides materialize with take() gathers.
    Output is capacity+count shaped (static out_capacity, traced total,
    traced overflow flag) — the engine-wide answer to data-dependent
    sizes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

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
        elif isinstance(c, col.DictionaryColumn) and c.keys.validity is not None:
            valid = valid & bm.unpack(c.keys.validity)
    return planes, valid


@dataclasses.dataclass(frozen=True)
class JoinInfo:
    """Traced join diagnostics.

    duplicates: build keys were not unique (informational — N:M output is
    still exact).  overflow: the true output row count exceeded
    out_capacity and rows were truncated; callers re-run with a larger
    capacity (capacity+count contract)."""

    duplicates: jax.Array
    overflow: jax.Array


jax.tree_util.register_dataclass(
    JoinInfo, data_fields=["duplicates", "overflow"], meta_fields=[]
)


@dataclasses.dataclass(frozen=True)
class HashTable:
    """Built hash side: representative table + duplicate-group index."""

    slots: jax.Array  # (table_size,) int32 representative build row id or -1
    hashes: jax.Array  # (build_cap,) uint32
    planes: Tuple[jax.Array, ...]  # build key planes
    valid: jax.Array  # (build_cap,) bool
    duplicates: jax.Array  # traced bool: build keys not unique
    order: jax.Array  # (build_cap,) int32 row ids sorted by key
    grp_start: jax.Array  # (build_cap,) int32 per-ROW group start in `order`
    grp_size: jax.Array  # (build_cap,) int32 per-ROW group size


jax.tree_util.register_dataclass(
    HashTable,
    data_fields=[
        "slots", "hashes", "planes", "valid", "duplicates",
        "order", "grp_start", "grp_size",
    ],
    meta_fields=[],
)


def _group_index(planes: List[jax.Array], valid: jax.Array):
    """Stable-sort rows by key; compute per-row group start/size.

    The duplicate-group index is the sort+partition trick of
    arrow-ord/src/partition.rs:127 applied to build keys: equal keys are
    adjacent after the sort, group boundaries are plane inequality with
    the previous row."""
    from ..rowformat import pack as rp

    cap = valid.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    sorted_planes, sorted_extras = rp.sort_by_planes(
        list(planes), cap, None, [iota], live=valid)
    order = sorted_extras[0]
    # boundary detection also needs the valid/invalid split: after the
    # sort the first n_live rows are the valid ones, so the pad plane is
    # simply pos >= n_live
    n_live = jnp.sum(valid.astype(jnp.int32))
    sorted_pad = (jnp.arange(cap, dtype=jnp.int32) >= n_live).astype(
        jnp.uint32)
    sorted_keys = [sorted_pad] + sorted_planes
    pos = jnp.arange(cap, dtype=jnp.int32)
    neq_prev = jnp.concatenate([jnp.ones(1, jnp.bool_),
                                jnp.zeros(cap - 1, jnp.bool_)])
    for p in sorted_keys:
        neq_prev = neq_prev | jnp.concatenate(
            [jnp.ones(1, jnp.bool_), p[1:] != p[:-1]]
        )
    start_sorted = jax.lax.cummax(jnp.where(neq_prev, pos, 0))
    # group end = next boundary at or after pos+1 (suffix-min trick)
    nxt = jnp.concatenate([
        jnp.where(neq_prev[1:], pos[1:], jnp.int32(cap)),
        jnp.array([cap], jnp.int32),
    ])
    end_sorted = jnp.flip(jax.lax.cummin(jnp.flip(nxt)))
    size_sorted = end_sorted - start_sorted
    grp_start = jnp.zeros(cap, jnp.int32).at[order].set(start_sorted)
    grp_size = jnp.zeros(cap, jnp.int32).at[order].set(size_sorted)
    return order, grp_start, grp_size


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

    # round cap (round-3 hardening): linear probing provably terminates
    # within `size` rounds (load factor < 1 guarantees an empty slot per
    # cluster), but adversarial clustering can force many serial
    # full-vector rounds.  The cap makes the worst case a hard bound
    # instead of an assumption; duplicate keys retire to the sorted group
    # index on their FIRST collision, so equal-key floods never loop.
    max_rounds = size

    def cond(state):
        _, pending, _, _, rounds = state
        return jnp.any(pending) & (rounds < max_rounds)

    def body(state):
        slots, pending, offset, dup, rounds = state
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
        pending2 = pending & ~won & ~same_key  # dup keys retire: the group
        offset2 = jnp.where(pending2, offset + 1, offset)  # index covers them
        return slots2, pending2, offset2, dup, rounds + 1

    slots, _, _, dup, _ = jax.lax.while_loop(
        cond, body, (slots0, pending0, offset0, dup0, jnp.int32(0))
    )
    slots = jnp.where(slots == EMPTY, jnp.int32(-1), slots)
    order, grp_start, grp_size = _group_index(planes, valid)
    return HashTable(slots, h, tuple(planes), valid, dup,
                     order, grp_start, grp_size)


def probe_table(table: HashTable, key_cols: Sequence[col.Column]) -> jax.Array:
    """Returns (probe_cap,) int32: representative build row id, or -1."""
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
    max_rounds = size  # termination bound (see build_table round cap)
    state0 = (
        jnp.full((cap,), -1, dtype=jnp.int32),  # result
        valid,  # pending
        jnp.zeros(cap, dtype=jnp.uint32),  # offset
        jnp.int32(0),
    )

    def cond(state):
        _, pending, _, rounds = state
        return jnp.any(pending) & (rounds < max_rounds)

    def body(state):
        result, pending, offset, rounds = state
        pos = ((h + offset) & mask).astype(jnp.int32)
        occupant = table.slots[pos]
        empty = occupant == -1
        occ_clamped = jnp.clip(occupant, 0, build_cap - 1)
        match = pending & ~empty & planes_eq(occ_clamped, probe_rowid)
        result2 = jnp.where(match, occupant, result)
        pending2 = pending & ~match & ~empty
        offset2 = jnp.where(pending2, offset + 1, offset)
        return result2, pending2, offset2, rounds + 1

    result, _, _, _ = jax.lax.while_loop(cond, body, state0)
    return result


def _expand_matches(table: HashTable, match: jax.Array, probe_live: jax.Array,
                    out_cap: int, *, keep_unmatched: bool):
    """N:M expansion: output slot j -> (probe row, build row or -1).

    counts[i] = group size of probe i's match (1 for unmatched rows when
    keep_unmatched, i.e. LEFT join).  Slot j's probe row is the
    searchsorted bucket of j in cumsum(counts); its ordinal within the
    group picks the concrete duplicate via the sorted group index."""
    probe_cap = match.shape[0]
    build_cap = table.valid.shape[0]
    matched = (match >= 0) & probe_live
    m = jnp.clip(match, 0, build_cap - 1)
    sizes = table.grp_size[m]
    if keep_unmatched:
        counts = jnp.where(probe_live, jnp.where(matched, sizes, 1), 0)
    else:
        counts = jnp.where(matched, sizes, 0)
    ends = jnp.cumsum(counts.astype(jnp.int32))
    total = ends[-1]
    j = jnp.arange(out_cap, dtype=jnp.int32)
    pi = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    pic = jnp.clip(pi, 0, probe_cap - 1)
    begin = ends[pic] - counts[pic]
    k = j - begin
    ok = j < jnp.minimum(total, jnp.int32(out_cap))
    sorted_pos = jnp.clip(table.grp_start[m[pic]] + k, 0, build_cap - 1)
    brow = table.order[sorted_pos]
    left_idx = jnp.where(ok, pic, -1)
    right_idx = jnp.where(ok & matched[pic], brow, -1)
    overflow = total > jnp.int32(out_cap)
    out_len = jnp.minimum(total, jnp.int32(out_cap))
    return left_idx, right_idx, out_len, overflow


def _suffix_names(schema_l: st.Schema, schema_r: st.Schema):
    left_names = set(schema_l.names)
    return [
        (n + "_right") if n in left_names else n for n in schema_r.names
    ]


def hash_join(left: bt.RecordBatch, right: bt.RecordBatch,
              on: Sequence[str], *, how: str = "inner",
              right_on: Sequence[str] | None = None,
              out_capacity: Optional[int] = None):
    """General N:M equi-join (build side = right; duplicate build keys
    produce one output row per pair, like SQL / pandas.merge).
    how in {inner, left, semi, anti}.  Returns (batch, JoinInfo).

    out_capacity (inner/left only): static output capacity; the traced
    JoinInfo.overflow reports truncation.  Defaults to left.capacity
    (exact when build keys are unique)."""
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
        return out, JoinInfo(table.duplicates, jnp.zeros((), jnp.bool_))

    if how not in ("inner", "left"):
        raise st.ComputeError(f"join: unknown how={how!r}")

    from ..config import round_up

    out_cap = round_up(out_capacity if out_capacity is not None
                       else left.capacity)
    probe_live = bm.row_mask_bool(left.capacity, left.length)
    left_idx, right_idx, out_len, overflow = _expand_matches(
        table, match, probe_live, out_cap, keep_unmatched=(how == "left")
    )
    lidx = col.PrimitiveColumn(left_idx, None, out_len, st.int32)
    ridx = col.PrimitiveColumn(right_idx, None, out_len, st.int32)
    left_cols = [take(c, lidx) for c in left.columns]

    right_keep = [n for n in right.schema.names if n not in set(right_on)]
    right_cols = [take(right[n], ridx) for n in right_keep]
    out_names = _dedup_names(left.schema.names, right_keep)
    fields = list(left.schema.fields) + [
        st.Field(nm, c.dtype) for nm, c in zip(out_names, right_cols)
    ]
    return (
        bt.RecordBatch(st.Schema(tuple(fields)), tuple(left_cols) + tuple(right_cols)),
        JoinInfo(table.duplicates, overflow),
    )


def _dedup_names(left_names, right_names):
    taken = set(left_names)
    return [n + "_right" if n in taken else n for n in right_names]


def _plan_from_bool(keep, cap, length):
    incl = jnp.cumsum(keep.astype(jnp.int32))
    return FilterPlan(keep, incl - 1, incl[-1])
