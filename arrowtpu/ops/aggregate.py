"""Whole-column reduction kernels.

Capability mirror of /root/reference/arrow-arith/src/aggregate.rs:
sum (:943), min/max (:1012/:1027), product, bool_and/bool_or (:880),
count.  Arrow's aggregates skip nulls and return Option::None when no
valid values exist; here each aggregate returns (value, has_value_flag)
with traced scalars — the Option materializes at a host sync point via
`finalize`.

64-bit columns: integer sum/min/max reduce on limb pairs (exact,
wrapping sum like the reference's `sum`); Float64 min/max reduce on
total-order planes (exact, NaN greatest — Rust total_cmp, matching the
row encoding fixed.rs:118); Float64 sum bridges to the platform float64
(exact on CPU, ~2^-48 on this TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..core import column as col
from ..core import wide as wd


def _masked(c: col.Column):
    if isinstance(c, col.BooleanColumn):
        vals = c.values_bool()
    elif isinstance(c, col.PrimitiveColumn):
        vals = c.values
    else:
        raise st.ComputeError(f"aggregate: unsupported column {type(c).__name__}")
    return vals, c.valid_bool()


def sum_(c: col.Column):
    """reference aggregate.rs:943 — wrapping sum, nulls skipped."""
    if (isinstance(c, col.PrimitiveColumn)
            and st.decimal_limbs(c.dtype) is not None):
        from . import decimal as dec

        s, cnt = dec.sum_(c)
        return s, cnt > 0
    if isinstance(c, col.PrimitiveColumn) and c.wide is not None:
        ok = c.valid_bool()
        if c.wide == "f64":
            v = wd.f64_to_value(c.values)
            s = jnp.sum(jnp.where(ok, v, 0.0))
            return wd.f64_from_value(s), jnp.any(ok)
        masked = jnp.where(ok[..., None], c.values, jnp.zeros_like(c.values))
        total = wd.tree_reduce(masked, wd.add, wd.from_scalar(0))
        return total, jnp.any(ok)
    vals, ok = _masked(c)
    filled = jnp.where(ok, vals, jnp.asarray(0, dtype=vals.dtype))
    return jnp.sum(filled), jnp.any(ok)


def product(c: col.Column):
    if isinstance(c, col.PrimitiveColumn) and c.wide is not None:
        ok = c.valid_bool()
        if c.wide == "f64":
            v = wd.f64_to_value(c.values)
            s = jnp.prod(jnp.where(ok, v, 1.0))
            return wd.f64_from_value(s), jnp.any(ok)
        one = jnp.asarray(wd.from_scalar(1), wd.U32)
        masked = jnp.where(ok[..., None], c.values, jnp.broadcast_to(one, c.values.shape))
        total = wd.tree_reduce(masked, wd.mul, wd.from_scalar(1))
        return total, jnp.any(ok)
    vals, ok = _masked(c)
    return jnp.prod(jnp.where(ok, vals, jnp.asarray(1, dtype=vals.dtype))), jnp.any(ok)


def _wide_minmax(c, is_min: bool):
    ok = c.valid_bool()
    kind = c.wide
    if kind == "f64":
        ph, pl = wd.f64_total_order_planes(c.values)
        key = wd.make(pl, ph)  # lo=low plane, hi=high plane -> unsigned cmp
        cmp = wd.lt_unsigned
        ident = wd.split_numpy(np.array(
            np.iinfo(np.uint64).max if is_min else 0, np.uint64).reshape(()))
    elif kind == "u64":
        key = c.values
        cmp = wd.lt_unsigned
        ident = wd.split_numpy(np.array(
            np.iinfo(np.uint64).max if is_min else 0, np.uint64).reshape(()))
    else:
        key = c.values
        cmp = wd.lt_signed
        ident = wd.split_numpy(np.array(
            np.iinfo(np.int64).max if is_min else np.iinfo(np.int64).min,
            np.int64).reshape(()))
    identb = jnp.asarray(ident, wd.U32)
    masked = jnp.where(ok[..., None], key, jnp.broadcast_to(identb, key.shape))

    if is_min:
        combine = lambda x, y: jnp.where(cmp(x, y)[..., None], x, y)
    else:
        combine = lambda x, y: jnp.where(cmp(x, y)[..., None], y, x)
    best = wd.tree_reduce(masked, combine, ident)
    if kind == "f64":
        # undo total-order plane transform: planes -> original bits
        ph, pl = wd.hi(best), wd.lo(best)
        negative = (ph >> 31) == 0  # transformed: originals with sign bit had hi flipped
        mask_hi = jnp.where(negative, wd.U32(0xFFFFFFFF), wd.U32(0x80000000))
        mask_lo = jnp.where(negative, wd.U32(0xFFFFFFFF), wd.U32(0))
        best = wd.make(pl ^ mask_lo, ph ^ mask_hi)
    return best, jnp.any(ok)


def _decimal_minmax(c, is_min):
    from . import decimal as dec

    return dec.min_max(c, is_min)


def min_(c: col.Column):
    if (isinstance(c, col.PrimitiveColumn)
            and st.decimal_limbs(c.dtype) is not None):
        return _decimal_minmax(c, True)
    """reference aggregate.rs:1012 — skips nulls."""
    if isinstance(c, col.PrimitiveColumn) and c.wide is not None:
        return _wide_minmax(c, True)
    vals, ok = _masked(c)
    if jnp.issubdtype(vals.dtype, jnp.floating):
        ident = jnp.array(jnp.inf, vals.dtype)
    elif vals.dtype == jnp.bool_:
        ident = jnp.array(True)
    else:
        ident = jnp.array(jnp.iinfo(vals.dtype).max, vals.dtype)
    return jnp.min(jnp.where(ok, vals, ident)), jnp.any(ok)


def max_(c: col.Column):
    if (isinstance(c, col.PrimitiveColumn)
            and st.decimal_limbs(c.dtype) is not None):
        return _decimal_minmax(c, False)
    """reference aggregate.rs:1027."""
    if isinstance(c, col.PrimitiveColumn) and c.wide is not None:
        return _wide_minmax(c, False)
    vals, ok = _masked(c)
    if jnp.issubdtype(vals.dtype, jnp.floating):
        ident = jnp.array(-jnp.inf, vals.dtype)
    elif vals.dtype == jnp.bool_:
        ident = jnp.array(False)
    else:
        ident = jnp.array(jnp.iinfo(vals.dtype).min, vals.dtype)
    return jnp.max(jnp.where(ok, vals, ident)), jnp.any(ok)


def bool_and(c: col.BooleanColumn):
    """reference aggregate.rs:880 — AND over valid values."""
    vals, ok = _masked(c)
    return jnp.all(jnp.where(ok, vals, True)), jnp.any(ok)


def bool_or(c: col.BooleanColumn):
    vals, ok = _masked(c)
    return jnp.any(jnp.where(ok, vals, False)), jnp.any(ok)


def count(c: col.Column):
    """Count of valid (non-null) live rows (int32 scalar)."""
    return jnp.int32(c.length) - c.null_count()


def finalize(pair, dtype: st.DataType = None):
    """Host sync: (value, has) -> python value or None (Arrow's Option).
    Wide results ((2,) uint32 limbs) need `dtype` to decode."""
    value, has = pair
    if not bool(has):
        return None
    v = np.asarray(value)
    if dtype is not None and st.decimal_limbs(dtype) is not None:
        import decimal as _pydec

        from ..core import limbs as lb

        with _pydec.localcontext(_pydec.Context(prec=80)):
            return _pydec.Decimal(
                lb.join_ints(v[None])[0]).scaleb(-dtype.scale)
    if v.shape == (2,) and v.dtype == np.uint32:
        kind = st.wide_kind(dtype) if dtype is not None else "i64"
        npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
        return wd.join_numpy(v[None], npdt)[0].item()
    return v.item()
