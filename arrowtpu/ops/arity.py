"""Arity helpers: apply elementwise ops with Arrow null semantics.

Capability mirror of the reference's arity layer
(/root/reference/arrow-arith/src/arity.rs:29 unary, :104 binary):
result validity = AND of input validities (NullBuffer::union,
arrow-buffer/src/buffer/null.rs:79), and the op itself never influences
rows that come out null.  Here the op *does* compute on null/padding slots
(branchless SIMD style — values at null slots are unspecified per the
column contract), which XLA fuses into a single VPU pass; consumers mask
with valid_bool().

Scalar broadcasting follows the reference's Datum trait
(arrow-array/src/scalar.rs:78): python/numpy scalars broadcast against a
column with all-valid semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col


def is_scalar(x) -> bool:
    return not isinstance(x, col.Column)


def unary(c: col.Column, fn, out_dtype: st.DataType = None) -> col.Column:
    """reference arity.rs:29 unary()."""
    if isinstance(c, col.DictionaryColumn):
        # apply to dictionary values only (reference dict fast-path policy)
        import dataclasses

        return dataclasses.replace(
            c,
            values=unary(c.values, fn, out_dtype),
            value_ranks=None,
            dtype=st.Dictionary(c.dtype.key, (out_dtype or c.values.dtype)),
        )
    if not isinstance(c, col.PrimitiveColumn):
        raise st.ComputeError(f"unary: unsupported column {type(c).__name__}")
    out_dtype = out_dtype or c.dtype
    values = fn(c.values).astype(out_dtype.to_jnp())
    return col.PrimitiveColumn(values, c.validity, c.length, out_dtype)


def binary(a, b, fn, out_dtype: st.DataType = None) -> col.Column:
    """reference arity.rs:104 binary(): null union + elementwise op."""
    a_col = isinstance(a, col.Column)
    b_col = isinstance(b, col.Column)
    if not a_col and not b_col:
        raise st.ComputeError("binary: need at least one column operand")
    if a_col and b_col and a.capacity != b.capacity:
        raise st.ComputeError(
            f"binary: capacity mismatch {a.capacity} vs {b.capacity}"
        )

    base = a if a_col else b
    av = a.values if a_col else jnp.asarray(a)
    bv = b.values if b_col else jnp.asarray(b)
    validity = bm.union(
        a.validity if a_col else None, b.validity if b_col else None
    )
    if out_dtype is None:
        out_dtype = st.from_jnp(
            jnp.result_type(av.dtype, bv.dtype)
        )
    values = fn(av, bv).astype(out_dtype.to_jnp())
    return col.PrimitiveColumn(values, validity, base.length, out_dtype)


def binary_boolean_out(a, b, fn) -> col.BooleanColumn:
    """Binary op producing a packed BooleanColumn (comparisons)."""
    a_col = isinstance(a, col.Column)
    b_col = isinstance(b, col.Column)
    base = a if a_col else b
    av = a.values if a_col else jnp.asarray(a)
    bv = b.values if b_col else jnp.asarray(b)
    validity = bm.union(
        a.validity if a_col else None, b.validity if b_col else None
    )
    bools = fn(av, bv)
    return col.BooleanColumn(bm.pack(bools), validity, base.length)
