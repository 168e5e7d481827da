"""Numeric arithmetic kernels with Arrow null semantics.

Capability mirror of /root/reference/arrow-arith/src/numeric.rs:36-103
(add/sub/mul/div/rem + _wrapping variants on Datum operands).

Semantics choices (TPU has no trapping arithmetic):
  * plain ops use wrapping integer semantics (the `_wrapping` variants of
    the reference); the checked variants return (column, error_flag) where
    error_flag is a traced bool scalar that the caller can raise on at a
    host sync point — overflow detection without data-dependent control
    flow inside jit.
  * integer div/rem use C truncation semantics (jax.lax.div/rem), matching
    the reference's Rust semantics; division by zero sets the error flag in
    checked form, and yields an unspecified (masked-safe) value in wrapping
    form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col
from . import arity


def _is_int(c) -> bool:
    dt = c.values.dtype if isinstance(c, col.Column) else jnp.asarray(c).dtype
    return jnp.issubdtype(dt, jnp.integer)


def add(a, b):
    return arity.binary(a, b, jnp.add)


def sub(a, b):
    return arity.binary(a, b, jnp.subtract)


def mul(a, b):
    return arity.binary(a, b, jnp.multiply)


def neg(a):
    return arity.unary(a, jnp.negative)


def _safe_div(x, y):
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(y.dtype, jnp.integer):
        yy = jnp.where(y == 0, jnp.ones_like(y), y)
        return jax.lax.div(x, yy)
    return x / y


def _safe_rem(x, y):
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(y.dtype, jnp.integer):
        yy = jnp.where(y == 0, jnp.ones_like(y), y)
        return jax.lax.rem(x, yy)
    # float rem with C truncation semantics (Rust %)
    return x - jnp.trunc(x / y) * y


def div(a, b):
    return arity.binary(a, b, _safe_div)


def rem(a, b):
    return arity.binary(a, b, _safe_rem)


# wrapping aliases (reference numeric.rs add_wrapping etc.)
add_wrapping = add
sub_wrapping = sub
mul_wrapping = mul


def _checked(op_fn, overflow_fn):
    def run(a, b):
        out = arity.binary(a, b, op_fn)
        a_col = isinstance(a, col.Column)
        b_col = isinstance(b, col.Column)
        av = a.values if a_col else jnp.asarray(a)
        bv = b.values if b_col else jnp.asarray(b)
        bad = overflow_fn(av, bv, out.values)
        # only live, valid rows can raise (reference: ops never observe nulls)
        live = out.valid_bool()
        flag = jnp.any(bad & live)
        return out, flag

    return run


def _add_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    # signed overflow iff operands share sign and result sign differs
    if jnp.issubdtype(r.dtype, jnp.signedinteger):
        return ((x >= 0) == (y >= 0)) & ((r >= 0) != (x >= 0))
    return r < x  # unsigned wraparound


def _sub_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    if jnp.issubdtype(r.dtype, jnp.signedinteger):
        return ((x >= 0) != (y >= 0)) & ((r >= 0) != (x >= 0))
    return x < y


def _mul_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    # check by dividing back (branchless)
    ok_zero = (x == 0) | (y == 0)
    yy = jnp.where(y == 0, jnp.ones_like(y), y)
    return ~ok_zero & (jax.lax.div(r, yy) != x)


def _div_overflow(x, y, r):
    if not jnp.issubdtype(r.dtype, jnp.integer):
        return jnp.zeros(r.shape, jnp.bool_)
    return y == 0


add_checked = _checked(jnp.add, _add_overflow)
sub_checked = _checked(jnp.subtract, _sub_overflow)
mul_checked = _checked(jnp.multiply, _mul_overflow)
div_checked = _checked(_safe_div, _div_overflow)
rem_checked = _checked(_safe_rem, _div_overflow)


def raise_if(flag, message: str = "arithmetic overflow"):
    """Host sync point turning a checked-op flag into ComputeError
    (reference returns ArrowError::ComputeError)."""
    if bool(flag):
        raise st.ComputeError(message)
