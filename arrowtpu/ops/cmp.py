"""Vectorized comparison kernels -> BooleanColumn.

Capability mirror of /root/reference/arrow-ord/src/cmp.rs:79-200
(eq/neq/lt/lt_eq/gt/gt_eq on Datum pairs) and :~distinct/not_distinct.
These are single fused VPU passes under jit; combined predicates
((a > b) & (c % k == 0)) fuse into one pass over HBM — the TPU analogue of
the reference's per-kernel loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col
from . import arity


def _vals(x):
    if isinstance(x, col.DictionaryColumn):
        raise st.ComputeError("cmp on dictionary: decode or compare keys explicitly")
    if isinstance(x, col.BooleanColumn):
        return x.values_bool()
    if isinstance(x, col.Column):
        return x.values
    return x


def _cmp(a, b, fn) -> col.BooleanColumn:
    a_col = isinstance(a, col.Column)
    b_col = isinstance(b, col.Column)
    base = a if a_col else b
    av = _vals(a) if a_col else jnp.asarray(a)
    bv = _vals(b) if b_col else jnp.asarray(b)
    validity = bm.union(
        a.validity if a_col else None, b.validity if b_col else None
    )
    bools = fn(av, bv)
    return col.BooleanColumn(bm.pack(bools), validity, base.length)


def eq(a, b):
    return _cmp(a, b, lambda x, y: x == y)


def neq(a, b):
    return _cmp(a, b, lambda x, y: x != y)


def lt(a, b):
    return _cmp(a, b, lambda x, y: x < y)


def lt_eq(a, b):
    return _cmp(a, b, lambda x, y: x <= y)


def gt(a, b):
    return _cmp(a, b, lambda x, y: x > y)


def gt_eq(a, b):
    return _cmp(a, b, lambda x, y: x >= y)


def _valid_bits(x, capacity):
    if isinstance(x, col.Column):
        if x.validity is None:
            return bm.all_valid(capacity)
        return x.validity
    return bm.all_valid(capacity)


def distinct(a, b) -> col.BooleanColumn:
    """SQL IS DISTINCT FROM (reference cmp.rs distinct): never null.
    true iff exactly one side is null, or both valid and values differ."""
    base = a if isinstance(a, col.Column) else b
    cap = base.capacity
    av = _valid_bits(a, cap)
    bv = _valid_bits(b, cap)
    ne = neq(a, b)  # values-differ with union validity
    ne_bits = ne.values
    result = (av ^ bv) | (av & bv & ne_bits)
    return col.BooleanColumn(result, None, base.length)


def not_distinct(a, b) -> col.BooleanColumn:
    """SQL IS NOT DISTINCT FROM (reference cmp.rs not_distinct)."""
    d = distinct(a, b)
    cap = d.capacity
    vals = ~d.values & bm.row_mask_words(cap, d.length)
    return col.BooleanColumn(vals, None, d.length)
