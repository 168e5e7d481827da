"""Filter: masked compaction of columns and batches.

Capability mirror of /root/reference/arrow-select/src/filter.rs
(filter :201, filter_record_batch :225, FilterBuilder :256,
prep_null_mask_filter :167 — a null predicate row selects nothing).

TPU-native design (SURVEY §7): the reference's adaptive IterationStrategy
(slices-vs-indices by selectivity, filter.rs:328) collapses into a single
mask -> compaction pass:

  * On TPU backends, compaction runs in the Pallas kernel
    (pallas/compact.py): per-tile rank/offset prefix sums on the MXU,
    log-shift lane compaction + one-hot row-scatter matmuls, sequential
    window appends — a bandwidth-bound streaming kernel.  Any fixed-width
    plane lowers to it: 4-byte dtypes as u32 words; multi-word rows
    (64-bit limb pairs, string views) as flat words with the keep mask
    repeated; 1/2-byte dtypes as byte planes.
  * Off-TPU (tests, host fallback) the same contract is computed with an
    XLA prefix-sum + scatter (out.at[pos].set, mode='drop').

Selection stays capacity-shaped (static) with a new traced length — the
engine-wide answer to data-dependent output sizes (XLA static shapes).

The FilterBuilder "optimize once, filter many columns" pattern
(filter.rs:285) maps to `FilterPlan`, which precomputes the keep mask and
count once and applies them to any number of columns.
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
from ..pallas import compact as pc
from ..pallas import compact3 as pc3


@dataclasses.dataclass(frozen=True)
class FilterPlan:
    """Precomputed selection (reference FilterPredicate, filter.rs:442).

    `pos` (per-row output slot, an O(capacity) prefix sum) is only needed
    by the XLA scatter fallback and by join materialization; it is None
    until `positions()` computes it, so the Pallas path never pays for it.

    `keep_words`: the same selection PACKED (uint32 bitmap words).  The
    row count comes from a popcount over it (1 bit/row of traffic instead
    of summing the bool vector), and under jit the unpacked `keep` fuses
    into its consumer (the kernel's u8 mask) so neither representation
    costs a standalone pass.

    `folded_validity`: the packed validity words that were ANDed into
    `keep` (prep_null_mask_filter).  When a filtered column's validity IS
    this object, every kept row is valid, so the output needs no validity
    bitmap at all — the compaction pass over the validity plane (unpack /
    kernel / repack) is skipped entirely.
    """

    keep: jax.Array  # (capacity,) bool
    pos: Optional[jax.Array]  # (capacity,) int32 output slot, or None
    count: jax.Array  # scalar int32 selected rows
    folded_validity: Optional[jax.Array] = None
    keep_words: Optional[jax.Array] = None  # (capacity/32,) packed uint32

    @property
    def capacity(self) -> int:
        return self.keep.shape[0]

    def positions(self) -> jax.Array:
        if self.pos is not None:
            return self.pos
        incl = jnp.cumsum(self.keep.astype(jnp.int32))
        return incl - 1


jax.tree_util.register_dataclass(
    FilterPlan,
    data_fields=["keep", "pos", "count", "folded_validity", "keep_words"],
    meta_fields=[],
)


def build_plan(mask: col.BooleanColumn) -> FilterPlan:
    if not isinstance(mask, col.BooleanColumn):
        raise st.ComputeError("filter mask must be a BooleanColumn")
    keepw = mask.values
    if mask.validity is not None:
        # prep_null_mask_filter (filter.rs:167): null predicate -> false
        keepw = keepw & mask.validity
    keepw = keepw & bm.row_mask_words(mask.capacity, mask.length)
    count = bm.count_set_bits(keepw)
    return FilterPlan(bm.unpack(keepw), None, count, mask.validity, keepw)


# ---------------------------------------------------------------------------
# plane compaction: Pallas fast path + XLA scatter fallback
# ---------------------------------------------------------------------------


def _pallas_eligible(values: jax.Array, capacity: int) -> bool:
    if jax.default_backend() == "cpu":
        return False
    itemsize = jnp.dtype(values.dtype).itemsize
    return pc.supported(values.shape[0]) and itemsize in (1, 2, 4, 8)


def _pallas_compact(values: jax.Array, plan: FilterPlan) -> jax.Array:
    """Compact (cap,) or (cap, W) values through the Pallas kernels.

    4-byte-word planes run the v3 kernel (pallas/compact3.py): keep
    arrives as a u8 vector whose materialization fuses with the unpack of
    the packed plan words; per-tile output offsets come from a fused XLA
    prefix pass (scalar-prefetched, so the kernel grid has no serial
    position chain); data planes move via hardware lane gathers.  Byte
    planes (u8/bool) stay on the v1 kernel.  Multi-word rows (64-bit limb
    pairs, string views) compact all W planes in ONE kernel call with
    shared movement bookkeeping.
    """
    dt = values.dtype
    isz = jnp.dtype(dt).itemsize
    keep_u8 = plan.keep.astype(jnp.uint8)
    n = values.shape[0]

    def go32(planes):  # (P, n) u32 -> (P, n) compacted
        return pc3.compact_planes(planes, keep_u8)

    def go8(plane8):  # (n,) u8 -> (n,) compacted (v1 byte kernel)
        tile_r = pc.pick_tile_r(n)
        info = pc.tile_info(keep_u8, tile_r)
        out, _ = pc.compact_planes_info(plane8[None], keep_u8, info, tile_r,
                                        is_u32=False)
        return out[0]

    if values.ndim == 2 and isz == 4:
        p32 = jax.lax.bitcast_convert_type(values, jnp.uint32)
        out = go32(jnp.transpose(p32))                 # (W, n)
        return jax.lax.bitcast_convert_type(jnp.transpose(out), dt)
    if values.ndim == 2:
        planes = [
            _pallas_compact_plane(values[:, j], go32, go8)
            for j in range(values.shape[1])
        ]
        return jnp.stack(planes, axis=-1)
    return _pallas_compact_plane(values, go32, go8)


def _pallas_compact_plane(plane, go32, go8):
    dt = plane.dtype
    isz = jnp.dtype(dt).itemsize
    if dt == jnp.bool_:
        return go8(plane.astype(jnp.uint8)) != 0
    if isz == 1:
        p8 = jax.lax.bitcast_convert_type(plane, jnp.uint8)
        return jax.lax.bitcast_convert_type(go8(p8), dt)
    if isz == 2:
        # widen 16-bit to 32-bit: a byte-interleaved view would be a
        # transpose pass; widening is two cheap elementwise converts
        if dt == jnp.float16:
            wide = jax.lax.bitcast_convert_type(
                plane, jnp.uint16).astype(jnp.uint32)
            out = go32(wide[None])[0].astype(jnp.uint16)
            return jax.lax.bitcast_convert_type(out, dt)
        wide = plane.astype(jnp.uint32)
        return go32(wide[None])[0].astype(dt)
    if isz == 4:
        p32 = jax.lax.bitcast_convert_type(plane, jnp.uint32)
        return jax.lax.bitcast_convert_type(go32(p32[None])[0], dt)
    # 8-byte plane: two u32 sub-planes, one shared call
    p2 = jax.lax.bitcast_convert_type(plane, jnp.uint32)      # (n, 2)
    out = go32(jnp.transpose(p2))                              # (2, n)
    return jax.lax.bitcast_convert_type(jnp.transpose(out), dt)


def _scatter_compact(values: jax.Array, plan: FilterPlan) -> jax.Array:
    """Compact selected rows to the front.

    Pallas streaming kernel on TPU; XLA scatter (mode='drop') elsewhere.
    Works for any trailing value shape (views are (cap,4), limbs (cap,2)).
    """
    if _pallas_eligible(values, plan.capacity):
        return _pallas_compact(values, plan)
    cap = plan.capacity
    idx = jnp.where(plan.keep, plan.positions(), cap)  # cap = OOB -> dropped
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
        child_plan = FilterPlan(keep, None, plan.count * size)
        validity = _filter_validity(c, plan)
        return col.FixedSizeListColumn(
            apply_plan(c.child, child_plan), validity, new_len, c.dtype
        )
    raise st.ComputeError(f"filter: unsupported column {type(c).__name__}")


def _filter_validity(c: col.Column, plan: FilterPlan) -> Optional[jax.Array]:
    if c.validity is None:
        return None
    if plan.folded_validity is c.validity:
        # keep already folded this exact bitmap to false (build_plan), so
        # every kept row is valid: no output bitmap, no compaction pass
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
