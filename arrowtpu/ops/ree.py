"""Run-end encoded kernels.

Capability mirror of the reference's RunArray support: physical-index
mapping (arrow-buffer/src/buffer/run.rs:232-258 get_physical_index),
take_run (arrow-select/src/take.rs:951), REE casts through the value type
(arrow-cast/src/cast/run.rs) and `RunArray::from` construction.

TPU-native design: the binary search of run.rs becomes a vectorized
`searchsorted` over the run_ends array; encode is an adjacent-neq
boundary mask + prefix-sum segment compaction — the same
mask->scan->compact shape as the filter kernel, fully fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col


def run_end_decode(c: col.RunEndColumn) -> col.Column:
    """Materialize a REE column to its plain value column (reference
    cast REE -> value type, arrow-cast/src/cast/mod.rs run path).

    Output capacity is the run_ends capacity times the max expressible
    rows — impossible statically, so the caller supplies implicit capacity
    via the column's logical capacity: we decode into a column of
    `capacity` = run_ends.shape[0] only when lengths are concrete.  For
    jit-friendly use, decode_to(c, capacity) fixes the output size."""
    from ..config import round_up

    return run_end_decode_to(c, round_up(max(int(c.length), 1)))


def run_end_decode_to(c: col.RunEndColumn, capacity: int) -> col.Column:
    """Decode with a static output capacity (>= logical length, a multiple
    of the capacity granule)."""
    from .take import take as _take

    idx = jnp.arange(capacity, dtype=jnp.int32)
    phys = c.physical_index(idx)
    indices = col.PrimitiveColumn(phys, None, c.length, st.int32)
    return _take(c.values, indices)


def run_end_encode(c: col.Column) -> col.RunEndColumn:
    """Device-side run-length compression: adjacent-equality boundary mask
    -> prefix sum -> compact runs (reference RunArray::from_iter; the
    TPU shape is the filter kernel's mask->scan->gather).

    Works on any column with an equality kernel; physical runs are
    compacted to the front, padding runs get run_end = length."""
    from . import cmp as cm
    from .filter import filter_ as _filter

    cap = c.capacity
    # boundary[i] = row i starts a new run (i == 0 or row i != row i-1)
    shifted = _shift_one(c)
    neq = cm.distinct(c, shifted)  # NULL-aware: (a IS DISTINCT FROM b)
    nb = neq.values_bool()
    live = bm.row_mask_bool(cap, c.length)
    boundary = nb & live
    boundary = boundary.at[0].set(c.length > 0)
    # physical index of each run start; run_ends[j] = start of run j+1 (or length)
    starts_mask = col.BooleanColumn(bm.pack(boundary), None, c.length)
    run_starts = _filter(
        col.PrimitiveColumn(jnp.arange(cap, dtype=jnp.int32), None, c.length, st.int32),
        starts_mask,
    )
    n_runs = run_starts.length
    # run end j = start of run j+1, last run ends at length
    next_start = jnp.roll(run_starts.values, -1)
    is_last = jnp.arange(cap, dtype=jnp.int32) == (n_runs - 1)
    ends = jnp.where(is_last, jnp.int32(c.length), next_start)
    pad = jnp.arange(cap, dtype=jnp.int32) >= n_runs
    ends = jnp.where(pad, jnp.maximum(jnp.int32(c.length), 1), ends)
    values = _filter(c, starts_mask)
    return col.RunEndColumn(
        ends, values, c.length, st.RunEndEncoded(st.int32, c.dtype)
    )


def _shift_one(c: col.Column):
    """Column shifted down one row (row i holds old row i-1); row 0 null."""
    from .take import take as _take

    cap = c.capacity
    idx = jnp.maximum(jnp.arange(cap, dtype=jnp.int32) - 1, 0)
    validity = bm.pack(jnp.arange(cap) > 0)
    indices = col.PrimitiveColumn(idx, validity, c.length, st.int32)
    return _take(c, indices)


def take_run(c: col.RunEndColumn, indices: col.PrimitiveColumn) -> col.Column:
    """Gather logical rows from a REE column (reference take_run
    take.rs:951: gathers touch only run_ends + per-run values)."""
    from .take import take as _take

    if indices.wide is not None:
        from ..core import wide as wd

        raw = wd.lo(indices.values).astype(jnp.int32)
    else:
        raw = indices.values.astype(jnp.int32)
    phys = c.physical_index(jnp.clip(raw, 0, None))
    inner = col.PrimitiveColumn(phys, indices.validity, indices.length, st.int32)
    return _take(c.values, inner)
