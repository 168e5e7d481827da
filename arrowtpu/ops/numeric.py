"""Numeric arithmetic kernels with Arrow null semantics.

Capability mirror of /root/reference/arrow-arith/src/numeric.rs:36-103
(add/sub/mul/div/rem + _wrapping variants on Datum operands).

Physical dispatch: narrow types use native jnp ops; 64-bit logical types
run on uint32 limb pairs (core/wide.py) — integer ops are exact carry
math, Float64 ops bridge limbs -> float64 values -> limbs (exact on CPU;
~2^-48 relative on this TPU's emulated f64 — the documented Float64
arithmetic precision boundary; ordering/equality/movement of Float64 stay
bit-exact everywhere).

Semantics:
  * plain ops wrap (the `_wrapping` variants of the reference); checked
    variants return (column, error_flag) with a traced bool the caller
    raises on at a host sync (`raise_if`) — overflow detection without
    data-dependent control flow inside jit.
  * integer div/rem use C truncation semantics, matching Rust.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col
from ..core import wide as wd
from . import arity


def _operands(a, b):
    """Resolve Datum pair -> (av, bv, validity, length, out_dtype, kind)."""
    a_col = isinstance(a, col.Column)
    b_col = isinstance(b, col.Column)
    if not (a_col or b_col):
        raise st.ComputeError("binary op: need at least one column operand")
    base = a if a_col else b
    kind = None
    out_dtype = None
    for x in (a, b):
        if isinstance(x, col.PrimitiveColumn):
            k = x.wide
            if k is not None:
                kind = k
                out_dtype = x.dtype
    validity = bm.union(
        a.validity if a_col else None, b.validity if b_col else None
    )
    if kind is None:
        av = a.values if a_col else jnp.asarray(a)
        bv = b.values if b_col else jnp.asarray(b)
        return av, bv, validity, base.length, None, None

    def to_limbs(x):
        if isinstance(x, col.PrimitiveColumn):
            if x.wide is not None:
                return x.values
            if jnp.issubdtype(x.values.dtype, jnp.unsignedinteger):
                return wd.from_uint32(x.values)
            return wd.from_int32(x.values)
        # python/numpy scalar
        npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
        return jnp.asarray(wd.split_numpy(np.asarray(x, dtype=npdt).reshape(1)))[0]

    return to_limbs(a), to_limbs(b), validity, base.length, out_dtype, kind


def _emit(values, validity, length, dtype):
    return col.PrimitiveColumn(values, validity, length, dtype)


def _f64_binary(av, bv, f):
    return wd.f64_from_value(f(wd.f64_to_value(av), wd.f64_to_value(bv)))


def _int_binary(a, b, narrow_fn, wide_fn, f64_fn):
    av, bv, validity, length, out_dtype, kind = _operands(a, b)
    if kind is None:
        out = narrow_fn(av, bv)
        return _emit(out, validity, length, st.from_jnp(out.dtype))
    if kind == "f64":
        if f64_fn in _F64_EXACT:
            # bit-exact IEEE754 softfloat on limbs (core/wide.py): no
            # emulated-f64 bridge, no precision boundary
            return _emit(_F64_EXACT[f64_fn](av, bv), validity, length,
                         out_dtype)
        return _emit(_f64_binary(av, bv, f64_fn), validity, length, out_dtype)
    return _emit(wide_fn(av, bv), validity, length, out_dtype)


_F64_EXACT = {jnp.add: wd.f64_add_exact, jnp.subtract: wd.f64_sub_exact,
              jnp.multiply: wd.f64_mul_exact}


def _is_decimal(x):
    return (isinstance(x, col.PrimitiveColumn)
            and st.decimal_limbs(x.dtype) is not None)


def add(a, b):
    if _is_decimal(a) or _is_decimal(b):
        from . import decimal as dec

        return dec.add(a, b) if _is_decimal(a) else dec.add(b, a)
    return _int_binary(a, b, jnp.add, wd.add, jnp.add)


def sub(a, b):
    if _is_decimal(a):
        from . import decimal as dec

        return dec.sub(a, b)
    return _int_binary(a, b, jnp.subtract, wd.sub, jnp.subtract)


def mul(a, b):
    if _is_decimal(a) or _is_decimal(b):
        from . import decimal as dec

        return dec.mul(a, b) if _is_decimal(a) else dec.mul(b, a)
    return _int_binary(a, b, jnp.multiply, wd.mul, jnp.multiply)


def neg(a):
    if isinstance(a, col.PrimitiveColumn) and a.wide is not None:
        if a.wide == "f64":
            flipped = wd.make(wd.lo(a.values), wd.hi(a.values) ^ wd.U32(0x80000000))
            return _emit(flipped, a.validity, a.length, a.dtype)
        return _emit(wd.neg(a.values), a.validity, a.length, a.dtype)
    return arity.unary(a, jnp.negative)


def _safe_div_narrow(x, y):
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(y.dtype, jnp.integer):
        yy = jnp.where(y == 0, jnp.ones_like(y), y)
        return jax.lax.div(x, yy)
    return x / y


def _safe_rem_narrow(x, y):
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(y.dtype, jnp.integer):
        yy = jnp.where(y == 0, jnp.ones_like(y), y)
        return jax.lax.rem(x, yy)
    return x - jnp.trunc(x / y) * y


def _const_divisor(b):
    """Python-int scalar divisor usable by the multiply-high fast path."""
    if isinstance(b, (int, np.integer)) and not isinstance(b, bool) \
            and int(b) != 0:
        return int(b)
    return None


def div(a, b):
    d = _const_divisor(b)
    av, bv, validity, length, out_dtype, kind = _operands(a, b)
    if kind is None:
        out = _safe_div_narrow(av, bv)
        return _emit(out, validity, length, st.from_jnp(out.dtype))
    if kind == "f64":
        return _emit(_f64_binary(av, bv, jnp.divide), validity, length, out_dtype)
    if d is not None:
        # constant-divisor strength reduction: multiply-high, not the
        # 64-round shift/subtract loop (64x fewer HBM passes)
        q, _ = (wd.divmod_signed_const(av, d) if kind == "i64"
                else wd.divmod_unsigned_const(av, d))
    else:
        q, _ = wd.divmod_signed(av, bv) if kind == "i64" else wd.divmod_unsigned(av, bv)
    return _emit(q, validity, length, out_dtype)


def rem(a, b):
    d = _const_divisor(b)
    av, bv, validity, length, out_dtype, kind = _operands(a, b)
    if kind is None:
        out = _safe_rem_narrow(av, bv)
        return _emit(out, validity, length, st.from_jnp(out.dtype))
    if kind == "f64":
        return _emit(
            _f64_binary(av, bv, lambda x, y: x - jnp.trunc(x / y) * y),
            validity, length, out_dtype,
        )
    if d is not None:
        _, r = (wd.divmod_signed_const(av, d) if kind == "i64"
                else wd.divmod_unsigned_const(av, d))
    else:
        _, r = wd.divmod_signed(av, bv) if kind == "i64" else wd.divmod_unsigned(av, bv)
    return _emit(r, validity, length, out_dtype)


# wrapping aliases (reference numeric.rs add_wrapping etc.)
add_wrapping = add
sub_wrapping = sub
mul_wrapping = mul


def _live_valid(out_col):
    return out_col.valid_bool()


def add_checked(a, b):
    out = add(a, b)
    av, bv, _, _, _, kind = _operands(a, b)
    if kind in ("i64",):
        sa, sb, so = wd.is_negative(av), wd.is_negative(bv), wd.is_negative(out.values)
        bad = (sa == sb) & (so != sa)
    elif kind == "u64":
        bad = wd.lt_unsigned(out.values, av)
    elif kind == "f64":
        bad = jnp.zeros(out.capacity, jnp.bool_)
    else:
        bad = _narrow_add_overflow(av, bv, out.values)
    return out, jnp.any(bad & _live_valid(out))


def sub_checked(a, b):
    out = sub(a, b)
    av, bv, _, _, _, kind = _operands(a, b)
    if kind in ("i64",):
        sa, sb, so = wd.is_negative(av), wd.is_negative(bv), wd.is_negative(out.values)
        bad = (sa != sb) & (so != sa)
    elif kind == "u64":
        bad = wd.lt_unsigned(av, bv)
    elif kind == "f64":
        bad = jnp.zeros(out.capacity, jnp.bool_)
    else:
        bad = _narrow_sub_overflow(av, bv, out.values)
    return out, jnp.any(bad & _live_valid(out))


def mul_checked(a, b):
    out = mul(a, b)
    av, bv, _, _, _, kind = _operands(a, b)
    if kind == "i64":
        # check by dividing back
        q, _ = wd.divmod_signed(out.values, bv)
        bzero = wd._is_zero(bv)
        bad = ~bzero & ~wd.eq(q, av)
        # INT64_MIN * -1 wraps
    elif kind == "u64":
        q, _ = wd.divmod_unsigned(out.values, bv)
        bzero = wd._is_zero(bv)
        bad = ~bzero & ~wd.eq(q, av)
    elif kind == "f64":
        bad = jnp.zeros(out.capacity, jnp.bool_)
    else:
        bad = _narrow_mul_overflow(av, bv, out.values)
    return out, jnp.any(bad & _live_valid(out))


def div_checked(a, b):
    out = div(a, b)
    av, bv, _, _, _, kind = _operands(a, b)
    if kind in ("i64", "u64"):
        bad = wd._is_zero(bv)
    elif kind == "f64":
        bad = jnp.zeros(out.capacity, jnp.bool_)
    else:
        bad = _narrow_div_overflow(av, bv, out.values)
    return out, jnp.any(bad & _live_valid(out))


def rem_checked(a, b):
    out = rem(a, b)
    av, bv, _, _, _, kind = _operands(a, b)
    if kind in ("i64", "u64"):
        bad = wd._is_zero(bv)
    elif kind == "f64":
        bad = jnp.zeros(out.capacity, jnp.bool_)
    else:
        bad = _narrow_div_overflow(av, bv, out.values)
    return out, jnp.any(bad & _live_valid(out))


def _narrow_add_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    if jnp.issubdtype(r.dtype, jnp.signedinteger):
        return ((x >= 0) == (y >= 0)) & ((r >= 0) != (x >= 0))
    return r < x


def _narrow_sub_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    if jnp.issubdtype(r.dtype, jnp.signedinteger):
        return ((x >= 0) != (y >= 0)) & ((r >= 0) != (x >= 0))
    return x < y


def _narrow_mul_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    ok_zero = (x == 0) | (y == 0)
    yy = jnp.where(y == 0, jnp.ones_like(y), y)
    return ~ok_zero & (jax.lax.div(r, yy) != x)


def _narrow_div_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    return y == 0


def raise_if(flag, message: str = "arithmetic overflow"):
    """Host sync point turning a checked-op flag into ComputeError
    (reference returns ArrowError::ComputeError)."""
    if bool(flag):
        raise st.ComputeError(message)
