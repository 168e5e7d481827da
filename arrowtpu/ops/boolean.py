"""Boolean logic kernels on packed bitmaps, including SQL Kleene logic.

Capability mirror of /root/reference/arrow-arith/src/boolean.rs:
and_kleene/or_kleene (:60, :156), non-Kleene and/or/not/and_not (:256-310),
is_null/is_not_null (:327-347).

All ops are word-wise on the packed uint32 bitmaps — 32 rows per VPU lane
op, the same trick as the reference's 64-bit chunk ops
(arrow-buffer/src/util/bit_chunk_iterator.rs) — no unpacking.

Kleene truth tables (boolean.rs:60 docs):
  and: false AND NULL = false;  NULL AND NULL = NULL;  true AND NULL = NULL
  or:  true  OR  NULL = true;   NULL OR  NULL = NULL;  false OR NULL = NULL
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col


def _check(a: col.BooleanColumn, b: col.BooleanColumn):
    if not isinstance(a, col.BooleanColumn) or not isinstance(b, col.BooleanColumn):
        raise st.ComputeError("boolean kernels require BooleanColumn inputs")
    if a.capacity != b.capacity:
        raise st.ComputeError("capacity mismatch")


def and_(a: col.BooleanColumn, b: col.BooleanColumn) -> col.BooleanColumn:
    _check(a, b)
    return col.BooleanColumn(a.values & b.values, bm.union(a.validity, b.validity), a.length)


def or_(a: col.BooleanColumn, b: col.BooleanColumn) -> col.BooleanColumn:
    _check(a, b)
    return col.BooleanColumn(a.values | b.values, bm.union(a.validity, b.validity), a.length)


def xor(a: col.BooleanColumn, b: col.BooleanColumn) -> col.BooleanColumn:
    _check(a, b)
    return col.BooleanColumn(a.values ^ b.values, bm.union(a.validity, b.validity), a.length)


def not_(a: col.BooleanColumn) -> col.BooleanColumn:
    # mask padding back to 0 to keep bitmap words canonical beyond length
    vals = ~a.values & bm.row_mask_words(a.capacity, a.length)
    return col.BooleanColumn(vals, a.validity, a.length)


def and_not(a: col.BooleanColumn, b: col.BooleanColumn) -> col.BooleanColumn:
    """a AND NOT b (reference boolean.rs and_not)."""
    _check(a, b)
    return col.BooleanColumn(a.values & ~b.values, bm.union(a.validity, b.validity), a.length)


def and_kleene(a: col.BooleanColumn, b: col.BooleanColumn) -> col.BooleanColumn:
    """reference boolean.rs:60."""
    _check(a, b)
    av = a.validity if a.validity is not None else bm.all_valid(a.capacity)
    bv = b.validity if b.validity is not None else bm.all_valid(b.capacity)
    value = a.values & b.values
    # valid iff (both valid) or (a is a valid false) or (b is a valid false)
    validity = (av & bv) | (av & ~a.values) | (bv & ~b.values)
    if a.validity is None and b.validity is None:
        validity = None
    return col.BooleanColumn(value, validity, a.length)


def or_kleene(a: col.BooleanColumn, b: col.BooleanColumn) -> col.BooleanColumn:
    """reference boolean.rs:156."""
    _check(a, b)
    av = a.validity if a.validity is not None else bm.all_valid(a.capacity)
    bv = b.validity if b.validity is not None else bm.all_valid(b.capacity)
    value = a.values | b.values
    # valid iff (both valid) or (a is a valid true) or (b is a valid true)
    validity = (av & bv) | (av & a.values) | (bv & b.values)
    if a.validity is None and b.validity is None:
        validity = None
    return col.BooleanColumn(value, validity, a.length)


def is_null(a: col.Column) -> col.BooleanColumn:
    """reference boolean.rs:327 — result is never null."""
    live = bm.row_mask_words(a.capacity, a.length)
    if a.validity is None:
        vals = jnp.zeros_like(live)
    else:
        vals = ~a.validity & live
    return col.BooleanColumn(vals, None, a.length)


def is_not_null(a: col.Column) -> col.BooleanColumn:
    """reference boolean.rs:347."""
    live = bm.row_mask_words(a.capacity, a.length)
    if a.validity is None:
        vals = live
    else:
        vals = a.validity & live
    return col.BooleanColumn(vals, None, a.length)
