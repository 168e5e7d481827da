"""Logical equality of columns and batches, computed device-side.

Capability mirror of /root/reference/arrow-data/src/equal/mod.rs:168
(`equal(lhs, rhs)`): two arrays are logically equal when they have the
same dtype, the same length, the same validity at live rows, and equal
values at VALID live rows — physical representation differences
(capacities, padding, arena layouts, dictionary key spaces, offsets) must
not matter.

TPU-native design: every comparison reduces to fused elementwise
compares + a single AND-reduction, so `equal_columns` is one traced pass
that can run under jit on device — no host `to_pylist` detour.  This is
also the engine's cheap CPU-vs-TPU bit-exactness harness: evaluate the
same program on both backends and compare batches on either.

Variable-length data (strings/binary) compares by gathering both sides'
bytes through their own views into a common padded byte matrix
(ops/strings.py byte_matrix), so different arena layouts of the same
logical strings still compare equal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import schema as st
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col


def _live(c: col.Column) -> jax.Array:
    """(cap,) bool: row < length."""
    return bm.row_mask_bool(c.capacity, c.length)


def _all_live(pred: jax.Array, live: jax.Array) -> jax.Array:
    return jnp.all(pred | ~live)


def _validity_equal(a: col.Column, b: col.Column, live) -> jax.Array:
    va, vb = a.valid_bool(), b.valid_bool()
    n = min(va.shape[0], vb.shape[0])
    return _all_live(va[:n] == vb[:n], live[:n])


def _values_equal_where_valid(pa, pb, ok, live):
    n = min(pa.shape[0], pb.shape[0])
    eq = pa[:n] == pb[:n]
    if eq.ndim == 2:
        eq = jnp.all(eq, axis=-1)
    return _all_live(eq | ~ok[:n], live[:n])


def equal_columns(a: col.Column, b: col.Column) -> jax.Array:
    """Traced scalar bool: logical equality (reference equal/mod.rs:168)."""
    if a.dtype != b.dtype:
        return jnp.asarray(False)
    same_len = a.length == b.length
    n = min(a.capacity, b.capacity)
    live = _live(a)[:n] & _live(b)[:n]
    ok = (a.valid_bool()[:n] & b.valid_bool()[:n])
    res = _validity_equal(a, b, live)

    if isinstance(a, col.NullColumn):
        return same_len
    if isinstance(a, col.BooleanColumn):
        res = res & _values_equal_where_valid(
            a.values_bool(), b.values_bool(), ok, live)
        return same_len & res
    if isinstance(a, col.DictionaryColumn):
        # decode-free when key spaces match is an optimization; the
        # general contract compares DECODED values: gather each side's
        # values through its keys (reference equal/dictionary)
        from .take import take

        da = take(a.values, a.keys)
        db = take(b.values, b.keys)
        return same_len & res & equal_columns(da, db)
    if isinstance(a, col.StringViewColumn):
        from .strings import byte_matrix

        w = -(-max(int(a.len_bound), int(b.len_bound), 1) // 4) * 4
        ma, la_ = byte_matrix(a, w)
        mb, lb_ = byte_matrix(b, w)
        la = jnp.where(ok, la_[:n], 0)
        lb = jnp.where(ok, lb_[:n], 0)
        res = res & _all_live(la == lb, live)
        res = res & _values_equal_where_valid(ma, mb, ok, live)
        return same_len & res
    if isinstance(a, col.PrimitiveColumn):
        res = res & _values_equal_where_valid(a.values, b.values, ok, live)
        return same_len & res
    if isinstance(a, col.ListViewColumn):
        # normalize offsets: compare per-row sizes + element-wise gathered
        # children at a common width
        sa = jnp.where(ok, a.sizes[:n], 0)
        sb = jnp.where(ok, b.sizes[:n], 0)
        res = res & _all_live(sa == sb, live)
        res = res & _list_values_equal(a, b, ok, live)
        return same_len & res
    if isinstance(a, col.StructColumn):
        for ca, cb in zip(a.children, b.children):
            res = res & _masked_child_equal(ca, cb, ok, live)
        return same_len & res
    if isinstance(a, col.FixedSizeListColumn):
        size = a.dtype.size
        ok_child = jnp.repeat(ok, size)
        live_child = jnp.repeat(live, size)
        res = res & _masked_child_equal(
            a.child, b.child, ok_child, live_child)
        return same_len & res
    raise st.ComputeError(f"equal: unsupported column {type(a).__name__}")


def _masked_child_equal(ca, cb, ok_parent, live_parent):
    n = min(ca.capacity, cb.capacity, ok_parent.shape[0])
    okc = ok_parent[:n] & ca.valid_bool()[:n] & cb.valid_bool()[:n]
    livec = live_parent[:n]
    vis = ok_parent[:n]
    # validity must match where the parent row is valid+live
    veq = (ca.valid_bool()[:n] == cb.valid_bool()[:n]) | ~vis
    if isinstance(ca, col.PrimitiveColumn):
        eq = ca.values[:n] == cb.values[:n]
        if eq.ndim == 2:
            eq = jnp.all(eq, axis=-1)
    elif isinstance(ca, col.BooleanColumn):
        eq = ca.values_bool()[:n] == cb.values_bool()[:n]
    elif isinstance(ca, col.StringViewColumn):
        from .strings import byte_matrix

        w = -(-max(int(ca.len_bound), int(cb.len_bound), 1) // 4) * 4
        mca, lca = byte_matrix(ca, w)
        mcb, lcb = byte_matrix(cb, w)
        eq = jnp.all(mca[:n] == mcb[:n], axis=-1)
        eq = eq & (lca[:n] == lcb[:n])
    else:
        return equal_columns(ca, cb)  # conservative recursion
    return jnp.all((veq & (eq | ~okc)) | ~livec)


_GATHER_CHUNK = 4096


def _list_values_equal(a: col.ListViewColumn, b: col.ListViewColumn,
                       ok, live):
    """Gather both children to (rows, chunk) windows with per-row size
    masks, iterating static chunks up to the TRUE child capacity — exact
    for any element count.  (Round-3 advisor medium finding: a silent
    4096 cap made equal-size lists that differ only past element 4095
    compare EQUAL; this API is the CPU-vs-TPU bit-exactness harness, so
    silent truncation could mask real mismatches.  Chunking keeps the
    gather working set bounded instead of materializing
    (rows, child_capacity).)"""
    n = ok.shape[0]
    cap_bound = int(max(a.child.capacity, b.child.capacity, 1))
    sizes = jnp.where(ok, a.sizes[:n], 0)[:, None]
    # the chunk loop is a while_loop bounded by the RUNTIME max list size
    # (round-4 advisor finding: a static unroll to child.capacity emitted
    # thousands of (rows, 4096) gathers and did O(rows x child_capacity)
    # work even when every list is short)
    max_sz = jnp.max(jnp.where(live[:, None], sizes, 0)).astype(jnp.int32)
    w = min(_GATHER_CHUNK, cap_bound)

    def body(state):
        off, res = state
        ar = _gather_list(a, n, off, w)
        br = _gather_list(b, n, off, w)
        pos = (off + jnp.arange(w, dtype=jnp.int32))[None, :]
        within = pos < sizes
        eq = ar == br
        if eq.ndim == 3:  # multi-word elements (64-bit limb pairs)
            eq = jnp.all(eq, axis=-1)
        eq = eq | ~within
        return (off + w, res & jnp.all(jnp.all(eq, axis=-1) | ~live))

    _, res = jax.lax.while_loop(
        lambda s: s[0] < max_sz, body, (jnp.int32(0), jnp.asarray(True)))
    return res


def _gather_list(c: col.ListViewColumn, n: int, off: int, w: int):
    idx = c.starts[:n, None] + (off + jnp.arange(w, dtype=jnp.int32))[None, :]
    idx = jnp.clip(idx, 0, c.child.capacity - 1)
    child = c.child
    if isinstance(child, col.PrimitiveColumn):
        return child.values[idx]
    if isinstance(child, col.BooleanColumn):
        return child.values_bool()[idx]
    raise st.ComputeError("equal: nested list child type unsupported")


def equal_batches(a: bt.RecordBatch, b: bt.RecordBatch) -> jax.Array:
    """Traced scalar bool: same schema AND all columns logically equal."""
    if tuple(a.schema.names) != tuple(b.schema.names):
        return jnp.asarray(False)
    if tuple(f.dtype for f in a.schema.fields) != tuple(
            f.dtype for f in b.schema.fields):
        return jnp.asarray(False)
    res = jnp.asarray(True)
    for ca, cb in zip(a.columns, b.columns):
        res = res & equal_columns(ca, cb)
    return res
