"""zip (if/else select), nullif, and window shift.

Capability mirrors:
  * zip: /root/reference/arrow-select/src/zip.rs:99 — mask ? truthy : falsy,
    elementwise, with scalar broadcasting (ScalarZipper zip.rs:225).
  * nullif: /root/reference/arrow-select/src/nullif.rs:44 — null-out rows
    where the condition is a valid true.
  * shift: /root/reference/arrow-select/src/window.rs:54 — shift rows by
    +/- offset, filling vacated rows with null.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col


def zip_(mask: col.BooleanColumn, truthy, falsy) -> col.Column:
    """mask row true -> truthy row, false -> falsy, null mask -> null."""
    import numpy as np

    from ..core import wide as wd

    t_col = isinstance(truthy, col.Column)
    f_col = isinstance(falsy, col.Column)
    base = truthy if t_col else falsy
    if not (t_col or f_col):
        raise st.ComputeError("zip: need at least one column")
    m = mask.values_bool()
    kind = base.wide if isinstance(base, col.PrimitiveColumn) else None

    def operand(x):
        if isinstance(x, col.Column):
            return x.values
        if kind is not None:
            npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
            return jnp.asarray(wd.split_numpy(np.asarray(x, npdt).reshape(1)))[0]
        return jnp.asarray(x)

    tv, fv = operand(truthy), operand(falsy)
    values = jnp.where(m[..., None] if kind is not None else m, tv, fv)
    t_ok = bm.unpack(truthy.validity) if (t_col and truthy.validity is not None) else None
    f_ok = bm.unpack(falsy.validity) if (f_col and falsy.validity is not None) else None
    picked_ok = None
    if t_ok is not None or f_ok is not None:
        ones = jnp.ones_like(m)
        picked_ok = jnp.where(m, t_ok if t_ok is not None else ones,
                              f_ok if f_ok is not None else ones)
    if mask.validity is not None:
        mv = bm.unpack(mask.validity)
        picked_ok = mv if picked_ok is None else (picked_ok & mv)
    validity = bm.pack(picked_ok) if picked_ok is not None else None
    out_dtype = base.dtype if kind is not None else st.from_jnp(values.dtype)
    return col.PrimitiveColumn(values, validity, base.length, out_dtype)


def nullif(c: col.Column, cond: col.BooleanColumn) -> col.Column:
    """reference nullif.rs:44: result null where cond is true-and-valid."""
    if c.capacity != cond.capacity:
        raise st.ComputeError("nullif: capacity mismatch")
    kill = cond.values
    if cond.validity is not None:
        kill = kill & cond.validity
    keep = ~kill
    validity = keep if c.validity is None else (c.validity & keep)
    # canonical: mask to live rows so padding stays 0
    validity = validity & bm.row_mask_words(c.capacity, c.length)
    return c.with_validity(validity)


def shift(c: col.PrimitiveColumn, offset: int) -> col.PrimitiveColumn:
    """reference window.rs:54: shift(+n) moves rows down (nulls at top)."""
    if offset == 0:
        return c
    cap = c.capacity
    idx = jnp.arange(cap, dtype=jnp.int32) - offset
    in_bounds = (idx >= 0) & (idx < jnp.int32(c.length))
    src = jnp.clip(idx, 0, cap - 1)
    sel = in_bounds[..., None] if c.wide is not None else in_bounds
    values = jnp.where(sel, c.values[src], jnp.zeros_like(c.values))
    ok = c.valid_bool()[src] & in_bounds
    return col.PrimitiveColumn(values, bm.pack(ok), c.length, c.dtype)
