"""Whole-column reduction kernels.

Capability mirror of /root/reference/arrow-arith/src/aggregate.rs:
sum (:943), min/max (:1012/:1027), product, bool_and/bool_or (:880),
count via null_count.  Arrow's aggregates skip nulls and return
Option::None when no valid values exist; here each aggregate returns
(value, has_value_flag) with traced scalars — the Option materializes at a
host sync point via `finalize`.

Each reduction is one fused masked pass over HBM (mask = validity AND
row-bound), bandwidth-bound on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import column as col


def _masked(c: col.Column):
    if isinstance(c, col.BooleanColumn):
        vals = c.values_bool()
    elif isinstance(c, col.PrimitiveColumn):
        vals = c.values
    else:
        raise st.ComputeError(f"aggregate: unsupported column {type(c).__name__}")
    return vals, c.valid_bool()


def _reduce(c, fold, identity):
    vals, ok = _masked(c)
    filled = jnp.where(ok, vals, jnp.asarray(identity, dtype=vals.dtype))
    return fold(filled), jnp.any(ok)


def sum_(c: col.Column):
    """reference aggregate.rs:943 — wrapping sum."""
    return _reduce(c, jnp.sum, 0)


def product(c: col.Column):
    return _reduce(c, jnp.prod, 1)


def min_(c: col.Column):
    """reference aggregate.rs:1012 — skips nulls."""
    vals, ok = _masked(c)
    if jnp.issubdtype(vals.dtype, jnp.floating):
        ident = jnp.array(jnp.inf, vals.dtype)
    elif vals.dtype == jnp.bool_:
        ident = jnp.array(True)
    else:
        ident = jnp.array(jnp.iinfo(vals.dtype).max, vals.dtype)
    return jnp.min(jnp.where(ok, vals, ident)), jnp.any(ok)


def max_(c: col.Column):
    """reference aggregate.rs:1027."""
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
    """Count of valid (non-null) live rows."""
    return jnp.int64(c.length) - c.null_count().astype(jnp.int64)


def finalize(pair):
    """Host sync: (value, has) -> python value or None (Arrow's Option)."""
    value, has = pair
    return value.item() if bool(has) else None
