"""Bitwise integer kernels.

Capability mirror of /root/reference/arrow-arith/src/bitwise.rs:42-192:
and/or/xor/not + shifts, in array-array and array-scalar forms.  64-bit
columns run on their uint32 limb pairs; shift_right is arithmetic for
signed types (Rust >> semantics) and logical for unsigned."""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import column as col
from ..core import wide as wd
from . import arity


def _wide_shift_amount(b, cap):
    if isinstance(b, col.Column):
        v = b.values
        if v.ndim == 2:  # limb column used as shift amount
            return wd.lo(v)
        return v.astype(jnp.uint32)
    return jnp.broadcast_to(jnp.uint32(b), (cap,))


def _dispatch(a, b, narrow_fn, wide_fn):
    from .numeric import _emit, _operands

    av, bv, validity, length, out_dtype, kind = _operands(a, b)
    if kind is None:
        out = narrow_fn(av, bv)
        return _emit(out, validity, length, st.from_jnp(out.dtype))
    if kind == "f64":
        raise st.ComputeError("bitwise ops require integer columns")
    return _emit(wide_fn(av, bv), validity, length, out_dtype)


def bit_and(a, b):
    return _dispatch(a, b, jnp.bitwise_and, wd.and_)


def bit_or(a, b):
    return _dispatch(a, b, jnp.bitwise_or, wd.or_)


def bit_xor(a, b):
    return _dispatch(a, b, jnp.bitwise_xor, wd.xor)


def bit_not(a):
    if isinstance(a, col.PrimitiveColumn) and a.wide is not None:
        if a.wide == "f64":
            raise st.ComputeError("bitwise ops require integer columns")
        return col.PrimitiveColumn(wd.not_(a.values), a.validity, a.length, a.dtype)
    return arity.unary(a, jnp.bitwise_not)


def shift_left(a, b):
    if isinstance(a, col.PrimitiveColumn) and a.wide is not None:
        k = _wide_shift_amount(b, a.capacity)
        return col.PrimitiveColumn(wd.shl(a.values, k), a.validity, a.length, a.dtype)
    return arity.binary(a, b, jnp.left_shift)


def shift_right(a, b):
    if isinstance(a, col.PrimitiveColumn) and a.wide is not None:
        k = _wide_shift_amount(b, a.capacity)
        fn = wd.sar if a.wide == "i64" else wd.shr
        return col.PrimitiveColumn(fn(a.values, k), a.validity, a.length, a.dtype)
    return arity.binary(a, b, jnp.right_shift)
