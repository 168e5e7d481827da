"""Three-tier validation of untrusted column data.

Capability mirror of /root/reference/arrow-data/src/data.rs — `validate`
(:881, cheap structural), `validate_nulls` (:1414), and the O(N)
`validate_full`/`validate_values` (:1388/:1495: UTF-8, offset
monotonicity/bounds, dictionary keys in range) — the guard the reference
runs on IPC/FFI input (reader `skip_validation` opt-out) and in CI under
`force_validate`.

TPU-native design: the O(N) value checks are vectorized device kernels
(reductions to a handful of scalar flags), not per-element host loops;
one `validate_column` call returns a dict of traced bool flags (True =
violation) so callers can batch many columns into one device round-trip.
`check_column` / `check_batch` are the host-side raising wrappers wired
into the IPC/Parquet readers (formats/ipc.py, formats/parquet.py) behind
`validate=True`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import schema as st
from . import batch as bt
from . import bitmap as bm
from . import column as col


def _utf8_invalid(mat: jax.Array, lens: jax.Array) -> jax.Array:
    """Vectorized UTF-8 validation over a (rows, L) byte matrix.

    The reference delegates to str::from_utf8 (arrow-data data.rs:1495
    validate_utf8); here the DFA collapses to shifted-mask algebra on the
    byte planes — entirely VPU-friendly:
      * classify each byte: ASCII, continuation (10xxxxxx), lead2/3/4;
      * expected continuation span from each lead must be exactly covered
        by continuation bytes, and continuations must be covered by some
        lead's span;
      * overlong/surrogate/too-large checks on (lead, first continuation)
        pairs.
    Returns per-row bool: True = invalid."""
    rows, L = mat.shape
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    inb = j < lens[:, None]
    b = jnp.where(inb, mat, 0).astype(jnp.uint32)

    cont = (b & 0xC0) == 0x80
    lead2 = (b & 0xE0) == 0xC0
    lead3 = (b & 0xF0) == 0xE0
    lead4 = (b & 0xF8) == 0xF0
    ascii_ = b < 0x80
    bad_byte = inb & ~(ascii_ | cont | lead2 | lead3 | lead4)

    def sh(x, k):
        """x shifted right by k positions along the byte axis (False in)."""
        if k == 0:
            return x
        pad = jnp.zeros((rows, k), dtype=x.dtype)
        return jnp.concatenate([pad, x[:, :-k]], axis=1)

    # continuation coverage: byte at j must be a continuation iff a lead
    # k positions back requires one
    need1 = sh(lead2 | lead3 | lead4, 1)
    need2 = sh(lead3 | lead4, 2)
    need3 = sh(lead4, 3)
    need = need1 | need2 | need3
    mismatch = inb & (need != cont)

    # overlong / surrogate / out-of-range on (lead, next byte) pairs
    nxt = jnp.concatenate([b[:, 1:], jnp.zeros((rows, 1), jnp.uint32)], axis=1)
    overlong2 = lead2 & (b < 0xC2)
    overlong3 = lead3 & (b == 0xE0) & (nxt < 0xA0)
    surrogate = lead3 & (b == 0xED) & (nxt >= 0xA0)
    overlong4 = lead4 & (b == 0xF0) & (nxt < 0x90)
    toolarge = lead4 & ((b > 0xF4) | ((b == 0xF4) & (nxt >= 0x90)))
    # a lead whose continuation span crosses the string end
    span_end = j + 1 + lead2 * 1 + lead3 * 2 + lead4 * 3
    truncated = (lead2 | lead3 | lead4) & (span_end > lens[:, None])

    bad = (bad_byte | mismatch | overlong2 | overlong3 | surrogate
           | overlong4 | toolarge | truncated) & inb
    return jnp.any(bad, axis=1)


def validate_column(c: col.Column, *, full: bool = True) -> Dict[str, jax.Array]:
    """Structural + value validation; returns {check_name: traced violation
    flag}.  Mirrors ArrayData::validate_full (data.rs:1388)."""
    flags: Dict[str, jax.Array] = {}
    cap = c.capacity
    live = bm.row_mask_bool(cap, c.length)

    # tier 1/2: structural — length within capacity, bitmap shape
    flags["length_exceeds_capacity"] = jnp.asarray(c.length, jnp.int32) > cap

    if isinstance(c, col.NullColumn):
        return flags

    if isinstance(c, col.DictionaryColumn):
        # dict keys in [0, len(values)) on live, valid rows (data.rs
        # validate_dictionary key-bounds check)
        keys = c.keys.values.astype(jnp.int64) if c.keys.wide is None else None
        if keys is None:
            from . import wide as wd

            keys = wd.lo(c.keys.values).astype(jnp.int64)
        ok = live if c.keys.validity is None else (
            live & bm.unpack(c.keys.validity))
        nvals = jnp.asarray(c.values.length, jnp.int64)
        flags["dict_key_out_of_bounds"] = jnp.any(
            ok & ((keys < 0) | (keys >= nvals)))
        return flags

    if isinstance(c, col.StringViewColumn):
        lens = c.views[:, 0].astype(jnp.int64)
        arena_cap = c.arena.shape[0]
        long = lens > 12
        offs = c.views[:, 3].astype(jnp.int64)
        ok = live if c.validity is None else (live & bm.unpack(c.validity))
        flags["view_out_of_bounds"] = jnp.any(
            ok & long & ((offs < 0) | (offs + lens > arena_cap)))
        flags["negative_length"] = jnp.any(ok & (lens < 0))
        if full and isinstance(c.dtype, st.Utf8):
            from ..ops.strings import byte_matrix, max_byte_length

            L = max_byte_length(c)
            mat, mlens = byte_matrix(c, L)
            bad = _utf8_invalid(mat, jnp.where(ok, mlens, 0))
            flags["invalid_utf8"] = jnp.any(bad & ok)
        return flags

    if isinstance(c, col.ListViewColumn):
        ok = live if c.validity is None else (live & bm.unpack(c.validity))
        starts = c.starts.astype(jnp.int64)
        sizes = c.sizes.astype(jnp.int64)
        child_cap = c.child.capacity
        flags["list_view_out_of_bounds"] = jnp.any(
            ok & ((starts < 0) | (sizes < 0) | (starts + sizes > child_cap)))
        if full:
            child_flags = validate_column(c.child, full=full)
            for k, v in child_flags.items():
                flags[f"child.{k}"] = v
        return flags

    if isinstance(c, col.StructColumn) and full:
        for i, ch in enumerate(c.children):
            for k, v in validate_column(ch, full=full).items():
                flags[f"child{i}.{k}"] = v
        return flags

    return flags


def validate_batch(batch: bt.RecordBatch, *, full: bool = True) -> Dict[str, jax.Array]:
    flags: Dict[str, jax.Array] = {}
    for f, c in zip(batch.schema.fields, batch.columns):
        for k, v in validate_column(c, full=full).items():
            flags[f"{f.name}.{k}"] = v
    return flags


def check_column(c: col.Column, *, full: bool = True, name: str = "") -> None:
    """Host-side raising wrapper (one device round-trip for all flags)."""
    flags = validate_column(c, full=full)
    _raise_on(flags, name)


def check_batch(batch: bt.RecordBatch, *, full: bool = True) -> None:
    _raise_on(validate_batch(batch, full=full), "batch")


def _raise_on(flags: Dict[str, jax.Array], name: str) -> None:
    if not flags:
        return
    keys = list(flags.keys())
    vals = np.asarray(jax.device_get(jnp.stack([flags[k] for k in keys])))
    bad = [k for k, v in zip(keys, vals) if bool(v)]
    if bad:
        where = f" in {name}" if name else ""
        raise st.ValidationError(
            f"invalid array data{where}: {', '.join(bad)}")
