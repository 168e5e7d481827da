"""Vectorized comparison kernels -> BooleanColumn.

Capability mirror of /root/reference/arrow-ord/src/cmp.rs:79-200
(eq/neq/lt/lt_eq/gt/gt_eq on Datum pairs) and distinct/not_distinct.
These are single fused VPU passes under jit; combined predicates fuse into
one pass over HBM.

64-bit columns compare on their uint32 limb pairs (core/wide.py) — exact,
including Float64 IEEE semantics (NaN compares false, -0 == +0) derived
from the stored bit patterns.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col
from ..core import wide as wd


def _wide_kind(a, b):
    for x in (a, b):
        if isinstance(x, col.PrimitiveColumn) and x.wide is not None:
            return x.wide
    return None


def _limb_operand(x, kind):
    if isinstance(x, col.PrimitiveColumn):
        if x.wide is not None:
            return x.values
        if jnp.issubdtype(x.values.dtype, jnp.unsignedinteger):
            return wd.from_uint32(x.values)
        return wd.from_int32(x.values)
    npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
    return jnp.asarray(wd.split_numpy(np.asarray(x, dtype=npdt).reshape(1)))[0]


def _wide_fns(kind):
    if kind == "f64":
        eq_ = wd.f64_ieee_eq
        lt_ = wd.f64_ieee_lt
    elif kind == "u64":
        eq_ = wd.eq
        lt_ = wd.lt_unsigned
    else:
        eq_ = wd.eq
        lt_ = wd.lt_signed
    return eq_, lt_


def _vals(x):
    if isinstance(x, col.DictionaryColumn):
        raise st.ComputeError("cmp on dictionary: decode or compare keys explicitly")
    if isinstance(x, col.BooleanColumn):
        return x.values_bool()
    if isinstance(x, col.Column):
        return x.values
    return x


def _cmp(a, b, op: str) -> col.BooleanColumn:
    a_col = isinstance(a, col.Column)
    b_col = isinstance(b, col.Column)
    base = a if a_col else b
    for x, y in ((a, b), (b, a)):
        if (isinstance(x, col.PrimitiveColumn)
                and st.decimal_limbs(x.dtype) is not None):
            from . import decimal as dec

            if x is a:
                return dec.cmp(a, b, op)
            flip = {"lt": "gt", "gt": "lt", "lt_eq": "gt_eq",
                    "gt_eq": "lt_eq"}.get(op, op)
            return dec.cmp(b, a, flip)
    validity = bm.union(
        a.validity if a_col else None, b.validity if b_col else None
    )
    kind = _wide_kind(a, b)
    if kind is not None:
        av = _limb_operand(a, kind)
        bv = _limb_operand(b, kind)
        eq_, lt_ = _wide_fns(kind)
        if op == "eq":
            bools = eq_(av, bv)
        elif op == "neq":
            if kind == "f64":
                # IEEE !=: true also when either side is NaN
                bools = ~eq_(av, bv)
            else:
                bools = ~eq_(av, bv)
        elif op == "lt":
            bools = lt_(av, bv)
        elif op == "lt_eq":
            bools = lt_(av, bv) | eq_(av, bv)
        elif op == "gt":
            bools = lt_(bv, av)
        else:  # gt_eq
            bools = lt_(bv, av) | eq_(av, bv)
        bools = jnp.broadcast_to(bools, (base.capacity,))
        return col.BooleanColumn(bm.pack(bools), validity, base.length)

    av = _vals(a) if a_col else jnp.asarray(a)
    bv = _vals(b) if b_col else jnp.asarray(b)
    fn = {
        "eq": lambda x, y: x == y,
        "neq": lambda x, y: x != y,
        "lt": lambda x, y: x < y,
        "lt_eq": lambda x, y: x <= y,
        "gt": lambda x, y: x > y,
        "gt_eq": lambda x, y: x >= y,
    }[op]
    bools = jnp.broadcast_to(fn(av, bv), (base.capacity,))
    return col.BooleanColumn(bm.pack(bools), validity, base.length)


def eq(a, b):
    return _cmp(a, b, "eq")


def neq(a, b):
    return _cmp(a, b, "neq")


def lt(a, b):
    return _cmp(a, b, "lt")


def lt_eq(a, b):
    return _cmp(a, b, "lt_eq")


def gt(a, b):
    return _cmp(a, b, "gt")


def gt_eq(a, b):
    return _cmp(a, b, "gt_eq")


def _valid_bits(x, capacity):
    if isinstance(x, col.Column) and x.validity is not None:
        return x.validity
    return bm.all_valid(capacity)


def distinct(a, b) -> col.BooleanColumn:
    """SQL IS DISTINCT FROM (reference cmp.rs distinct): never null.
    true iff exactly one side is null, or both valid and values differ.
    Note: uses value (not IEEE) equality for floats, i.e. NaN IS NOT
    DISTINCT FROM NaN, matching the reference's not_distinct on total
    values."""
    base = a if isinstance(a, col.Column) else b
    cap = base.capacity
    av = _valid_bits(a, cap)
    bv = _valid_bits(b, cap)
    kind = _wide_kind(a, b)
    if kind is not None:
        x = _limb_operand(a, kind)
        y = _limb_operand(b, kind)
        ne_bools = jnp.broadcast_to(~wd.eq(x, y), (cap,))
        ne_bits = bm.pack(ne_bools)
    else:
        ne = neq(a, b)
        ne_bits = ne.values
    result = (av ^ bv) | (av & bv & ne_bits)
    return col.BooleanColumn(result, None, base.length)


def not_distinct(a, b) -> col.BooleanColumn:
    """SQL IS NOT DISTINCT FROM (reference cmp.rs not_distinct)."""
    d = distinct(a, b)
    cap = d.capacity
    vals = ~d.values & bm.row_mask_words(cap, d.length)
    return col.BooleanColumn(vals, None, d.length)
