"""Zero-copy-ish host bridge to pyarrow (Arrow C Data ecosystem).

Capability mirror of the reference's interop layer — `arrow-pyarrow`
(/root/reference/arrow-pyarrow/src/lib.rs:129-164 FromPyArrow/ToPyArrow over
the C Data Interface) and the C FFI structs
(arrow-schema/src/ffi.rs:77, arrow-data/src/ffi.rs:39) — re-targeted at a
device-resident engine: the conversion happens on host at the HBM boundary,
buffer-at-a-time with numpy (no per-row Python), then ships to/from device.

Layout notes:
  * device bitmaps use the TPU-native sublane-major bit order
    (core/bitmap.py) — NOT Arrow's sequential order — so every validity/
    boolean buffer converts through to_numpy_bools/from_numpy_bools at
    this boundary (vectorized numpy, no per-row Python);
  * our string views are arrow Utf8View/BinaryView views
    (arrow-data/src/byte_view.rs:70) with a single arena buffer; we convert
    to/from offset-encoded pa.utf8 with vectorized gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..core import batch as rb
from ..core import bitmap as bm
from ..core import column as col
from ..core import wide as wd
from ..config import round_up

try:  # gate: environments without pyarrow can still import arrowtpu
    import pyarrow as pa
except Exception:  # pragma: no cover
    pa = None


def _require_pa():
    if pa is None:  # pragma: no cover
        raise st.ArrowTpuError("pyarrow is not available in this environment")
    return pa


# ---------------------------------------------------------------------------
# Type conversion
# ---------------------------------------------------------------------------


def dtype_to_pa(dt: st.DataType):
    _require_pa()
    if isinstance(dt, st.Null):
        return pa.null()
    if isinstance(dt, st.Boolean):
        return pa.bool_()
    if isinstance(dt, st.Int):
        return getattr(pa, f"{'' if dt.signed else 'u'}int{dt.bits}")()
    if isinstance(dt, st.Float):
        return {16: pa.float16(), 32: pa.float32(), 64: pa.float64()}[dt.bits]
    if isinstance(dt, st.Timestamp):
        return pa.timestamp(dt.unit, dt.tz)
    if isinstance(dt, st.Date32):
        return pa.date32()
    if isinstance(dt, st.Date64):
        return pa.date64()
    if isinstance(dt, st.Time32):
        return pa.time32(dt.unit)
    if isinstance(dt, st.Time64):
        return pa.time64(dt.unit)
    if isinstance(dt, st.Duration):
        return pa.duration(dt.unit)
    if isinstance(dt, st.Utf8):
        return pa.utf8()
    if isinstance(dt, st.Binary):
        return pa.binary()
    if isinstance(dt, st.Dictionary):
        return pa.dictionary(dtype_to_pa(dt.key), dtype_to_pa(dt.value))
    if isinstance(dt, st.Decimal128):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, st.Decimal256):
        return pa.decimal256(dt.precision, dt.scale)
    if isinstance(dt, st.Decimal32):
        if hasattr(pa, "decimal32"):
            return pa.decimal32(dt.precision, dt.scale)
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, st.Decimal64):
        if hasattr(pa, "decimal64"):
            return pa.decimal64(dt.precision, dt.scale)
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, st.FixedSizeBinary):
        return pa.binary(dt.byte_width)
    if isinstance(dt, st.Interval):
        if dt.unit == "month_day_nano":
            return pa.month_day_nano_interval()
        if dt.unit == "day_time":
            return pa.day_time_interval()
        return pa.month_interval()
    if isinstance(dt, st.List):
        return pa.list_(dtype_to_pa(dt.value))
    if isinstance(dt, st.FixedSizeList):
        return pa.list_(dtype_to_pa(dt.value), dt.size)
    if isinstance(dt, st.Map):
        return pa.map_(dtype_to_pa(dt.key), dtype_to_pa(dt.item))
    if isinstance(dt, st.Struct):
        return pa.struct(
            [pa.field(f.name, dtype_to_pa(f.dtype), nullable=f.nullable) for f in dt.fields]
        )
    raise st.SchemaError(f"no pyarrow mapping for {dt}")


def dtype_from_pa(t) -> st.DataType:
    _require_pa()
    if pa.types.is_null(t):
        return st.null
    if pa.types.is_boolean(t):
        return st.boolean
    if pa.types.is_integer(t):
        return st.Int(t.bit_width, signed=pa.types.is_signed_integer(t))
    if pa.types.is_floating(t):
        return st.Float(t.bit_width)
    if pa.types.is_timestamp(t):
        return st.Timestamp(t.unit, t.tz)
    if pa.types.is_date32(t):
        return st.Date32()
    if pa.types.is_date64(t):
        return st.Date64()
    if pa.types.is_time32(t):
        return st.Time32(t.unit)
    if pa.types.is_time64(t):
        return st.Time64(t.unit)
    if pa.types.is_duration(t):
        return st.Duration(t.unit)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or (
        hasattr(pa.types, "is_string_view") and pa.types.is_string_view(t)
    ):
        return st.utf8
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or (
        hasattr(pa.types, "is_binary_view") and pa.types.is_binary_view(t)
    ):
        return st.binary
    if pa.types.is_fixed_size_binary(t):
        return st.FixedSizeBinary(t.byte_width)
    if pa.types.is_interval(t):
        if t == pa.month_day_nano_interval():
            return st.Interval("month_day_nano")
        if t == pa.day_time_interval():
            return st.Interval("day_time")
        return st.Interval("year_month")
    if pa.types.is_decimal(t):
        nl = t.bit_width // 32
        return st.decimal_for_limbs(nl, t.precision, t.scale)
    if pa.types.is_dictionary(t):
        return st.Dictionary(dtype_from_pa(t.index_type), dtype_from_pa(t.value_type))
    if pa.types.is_map(t):
        return st.Map(dtype_from_pa(t.key_type), dtype_from_pa(t.item_type))
    if pa.types.is_fixed_size_list(t):
        return st.FixedSizeList(dtype_from_pa(t.value_type), t.list_size)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or (
        hasattr(pa.types, "is_list_view") and pa.types.is_list_view(t)
    ):
        return st.List(dtype_from_pa(t.value_type))
    if pa.types.is_struct(t):
        return st.Struct(
            tuple(st.Field(f.name, dtype_from_pa(f.type), f.nullable) for f in t)
        )
    raise st.SchemaError(f"unsupported pyarrow type {t}")


def schema_to_pa(s: st.Schema):
    _require_pa()
    return pa.schema(
        [pa.field(f.name, dtype_to_pa(f.dtype), nullable=f.nullable) for f in s.fields],
        metadata=dict(s.metadata) or None,
    )


def schema_from_pa(s) -> st.Schema:
    md = tuple(
        (k.decode() if isinstance(k, bytes) else k, v.decode() if isinstance(v, bytes) else v)
        for k, v in (s.metadata or {}).items()
    )
    return st.Schema(
        tuple(st.Field(f.name, dtype_from_pa(f.type), f.nullable) for f in s),
        md,
    )


# ---------------------------------------------------------------------------
# arrowtpu -> pyarrow
# ---------------------------------------------------------------------------


def _validity_to_pa_buffer(c: col.Column):
    """Packed uint32 words -> arrow validity buffer bytes (same bit layout)."""
    if c.validity is None:
        return None, 0
    n = c.concrete_length()
    words = np.asarray(c.validity)
    # zero any garbage beyond the logical length, then count
    mask_bools = bm.to_numpy_bools(jnp.asarray(words), n)
    null_count = int(n - mask_bools.sum())
    if null_count == 0:
        return None, 0
    return pa.py_buffer(np.packbits(mask_bools, bitorder="little").tobytes()), null_count


def _primitive_to_pa(c: col.PrimitiveColumn):
    n = c.concrete_length()
    nlimb = st.decimal_limbs(c.dtype)
    if nlimb is not None:
        # limbs are little-endian u32: the flat bytes ARE the Arrow decimal
        # buffer layout (two's-complement little-endian words)
        vals = np.ascontiguousarray(np.asarray(c.values)[:n])
        patype = dtype_to_pa(c.dtype)
        # pyarrow < 18 has no decimal32/64: dtype_to_pa falls back to
        # decimal128, so widen 1/2-limb storage to 4 limbs sign-extended
        # (ADVICE r2: exporting the narrow buffer made from_buffers read
        # out of bounds)
        want_limbs = patype.byte_width // 4
        if want_limbs > nlimb:
            sign = (vals[:, -1:].astype(np.int32) < 0)
            ext = np.where(sign, np.uint32(0xFFFFFFFF), np.uint32(0))
            vals = np.concatenate(
                [vals, np.broadcast_to(ext, (n, want_limbs - nlimb))], axis=1)
            vals = np.ascontiguousarray(vals)
        validity, null_count = _validity_to_pa_buffer(c)
        return pa.Array.from_buffers(
            patype, n, [validity, pa.py_buffer(vals.tobytes())],
            null_count=null_count,
        )
    if isinstance(c.dtype, (st.FixedSizeBinary, st.Interval)):
        words = np.ascontiguousarray(np.asarray(c.values)[:n]).astype("<u4")
        if isinstance(c.dtype, st.FixedSizeBinary):
            w = c.dtype.byte_width
            by = words.view(np.uint8).reshape(n, -1)[:, :w]
            payload = np.ascontiguousarray(by).tobytes()
        else:
            payload = words.tobytes()
        validity, null_count = _validity_to_pa_buffer(c)
        return pa.Array.from_buffers(
            dtype_to_pa(c.dtype), n, [validity, pa.py_buffer(payload)],
            null_count=null_count)
    kind = c.wide
    if kind is not None:
        npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
        vals = wd.join_numpy(np.asarray(c.values)[:n], npdt)
    else:
        vals = np.asarray(c.values)[:n]
    validity, null_count = _validity_to_pa_buffer(c)
    patype = dtype_to_pa(c.dtype)
    return pa.Array.from_buffers(
        patype, n, [validity, pa.py_buffer(np.ascontiguousarray(vals).tobytes())],
        null_count=null_count,
    )


def _boolean_to_pa(c: col.BooleanColumn):
    n = c.concrete_length()
    vals = bm.to_numpy_bools(c.values, n)
    validity, null_count = _validity_to_pa_buffer(c)
    return pa.Array.from_buffers(
        pa.bool_(), n,
        [validity, pa.py_buffer(np.packbits(vals, bitorder="little").tobytes())],
        null_count=null_count,
    )


def _string_view_to_pa(c: col.StringViewColumn):
    """Views + arena -> offset-encoded pa.utf8/binary via one vectorized
    gather (two source pools: the arena for long strings, the view words
    themselves for inline <=12-byte strings)."""
    n = c.concrete_length()
    views = np.asarray(c.views)[:n]
    arena = np.asarray(c.arena)
    valid = (
        bm.to_numpy_bools(c.validity, n) if c.validity is not None else np.ones(n, bool)
    )
    lens = views[:, 0].astype(np.int64)
    lens_eff = np.where(valid, lens, 0)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_eff, out=offsets[1:])
    total = int(offsets[-1])
    # pool = [arena | view-bytes]; inline payload starts at byte 4 of a view
    view_bytes = np.ascontiguousarray(views).view(np.uint8).reshape(n, 16) if n else np.zeros((0, 16), np.uint8)
    pool = np.concatenate([arena, view_bytes.reshape(-1)])
    inline = lens <= 12
    src_start = np.where(inline, arena.shape[0] + np.arange(n) * 16 + 4, views[:, 3].astype(np.int64))
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets[:-1], lens_eff)
        + np.repeat(src_start, lens_eff)
    )
    data = pool[idx] if total else np.zeros(0, np.uint8)
    validity, null_count = _validity_to_pa_buffer(c)
    if total <= np.iinfo(np.int32).max:
        patype = pa.utf8() if isinstance(c.dtype, st.Utf8) else pa.binary()
        off_buf = pa.py_buffer(offsets.astype(np.int32).tobytes())
    else:
        patype = pa.large_utf8() if isinstance(c.dtype, st.Utf8) else pa.large_binary()
        off_buf = pa.py_buffer(offsets.tobytes())
    return pa.Array.from_buffers(
        patype, n, [validity, off_buf, pa.py_buffer(data.tobytes())],
        null_count=null_count,
    )


def _dictionary_to_pa(c: col.DictionaryColumn):
    keys = _primitive_to_pa(c.keys)
    values = column_to_pa(c.values)
    return pa.DictionaryArray.from_arrays(keys, values)


def _list_view_to_pa(c: col.ListViewColumn):
    """(start, size) views -> offset-encoded pa list: one vectorized
    repeat-gather of the child by flattened row ranges."""
    n = c.concrete_length()
    starts = np.asarray(c.starts)[:n].astype(np.int64)
    sizes = np.asarray(c.sizes)[:n].astype(np.int64)
    valid = (
        bm.to_numpy_bools(c.validity, n) if c.validity is not None else np.ones(n, bool)
    )
    sizes_eff = np.where(valid, sizes, 0)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes_eff, out=offsets[1:])
    total = int(offsets[-1])
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets[:-1], sizes_eff)
        + np.repeat(starts, sizes_eff)
    )
    child_pa = column_to_pa(c.child)
    flat = child_pa.take(pa.array(idx, type=pa.int64())) if total else child_pa.slice(0, 0)
    validity, null_count = _validity_to_pa_buffer(c)
    mask = pa.array(~valid) if null_count else None
    if isinstance(c.dtype, st.Map):
        return pa.MapArray.from_arrays(
            pa.array(offsets.astype(np.int32)),
            flat.field("key"),
            flat.field("value"),
            mask=mask,
        )
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32)), flat, mask=mask
    )


def _struct_to_pa(c: col.StructColumn):
    n = c.concrete_length()
    children = [column_to_pa(ch) for ch in c.children]
    valid = (
        bm.to_numpy_bools(c.validity, n) if c.validity is not None else None
    )
    return pa.StructArray.from_arrays(
        children,
        names=[f.name for f in c.dtype.fields],
        mask=pa.array(~valid) if valid is not None else None,
    )


def _fixed_size_list_to_pa(c: col.FixedSizeListColumn):
    n = c.concrete_length()
    size = c.dtype.size
    child = column_to_pa(c.child.with_length(n * size))
    arr = pa.FixedSizeListArray.from_arrays(child, size)
    if c.validity is not None:
        valid = bm.to_numpy_bools(c.validity, n)
        # re-wrap with a validity bitmap
        buf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        arr = pa.Array.from_buffers(
            arr.type, n, [buf], null_count=int((~valid).sum()), children=[child]
        )
    return arr


def column_to_pa(c: col.Column):
    _require_pa()
    if isinstance(c, col.PrimitiveColumn):
        return _primitive_to_pa(c)
    if isinstance(c, col.BooleanColumn):
        return _boolean_to_pa(c)
    if isinstance(c, col.StringViewColumn):
        return _string_view_to_pa(c)
    if isinstance(c, col.DictionaryColumn):
        return _dictionary_to_pa(c)
    if isinstance(c, col.ListViewColumn):
        return _list_view_to_pa(c)
    if isinstance(c, col.StructColumn):
        return _struct_to_pa(c)
    if isinstance(c, col.FixedSizeListColumn):
        return _fixed_size_list_to_pa(c)
    if isinstance(c, col.NullColumn):
        return pa.nulls(c.concrete_length())
    raise st.SchemaError(f"cannot convert {type(c).__name__} to pyarrow")


def to_pyarrow(x):
    """Column -> pa.Array; RecordBatch -> pa.RecordBatch."""
    _require_pa()
    if isinstance(x, rb.RecordBatch):
        arrays = [column_to_pa(c) for c in x.columns]
        return pa.RecordBatch.from_arrays(arrays, schema=schema_to_pa(x.schema))
    return column_to_pa(x)


# ---------------------------------------------------------------------------
# pyarrow -> arrowtpu
# ---------------------------------------------------------------------------


def _normalize(a):
    """Flatten chunks and non-zero offsets so buffer math is direct."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if a.offset != 0:
        a = a.take(pa.array(np.arange(len(a), dtype=np.int64)))
    return a


def _validity_from_pa(a, cap: int):
    """Arrow validity buffer -> packed uint32 words ((cap/32,) or None)."""
    if a.null_count == 0:
        return None
    n = len(a)
    buf = a.buffers()[0]
    raw = np.frombuffer(buf, dtype=np.uint8, count=(n + 7) // 8)
    bits = np.unpackbits(raw, bitorder="little")[:n]
    padded = np.zeros(cap, dtype=bool)
    padded[:n] = bits.astype(bool)
    return bm.from_numpy_bools(padded)


def _primitive_from_pa(a, dt: st.DataType) -> col.PrimitiveColumn:
    n = len(a)
    cap = round_up(max(n, 1))
    if isinstance(dt, (st.FixedSizeBinary, st.Interval)):
        itemsize = a.type.byte_width if isinstance(
            dt, st.FixedSizeBinary) else a.type.bit_width // 8
        nw = (-(-dt.byte_width // 4) if isinstance(dt, st.FixedSizeBinary)
              else dt.n_words)
        raw = (np.frombuffer(a.buffers()[1], np.uint8, count=n * itemsize)
               if n else np.zeros(0, np.uint8))
        by = raw.reshape(n, itemsize)
        if itemsize < nw * 4:
            by = np.concatenate(
                [by, np.zeros((n, nw * 4 - itemsize), np.uint8)], axis=1)
        words = np.ascontiguousarray(by).view("<u4").reshape(n, nw)
        validity = _validity_from_pa(a, cap)
        return col.primitive(words, dt, validity=validity, capacity=cap,
                             length=n)
    itemsize = a.type.bit_width // 8
    nlimb = st.decimal_limbs(dt)
    if nlimb is not None:
        raw = (np.frombuffer(a.buffers()[1], dtype=np.uint8, count=n * itemsize)
               if n else np.zeros(0, np.uint8))
        limbs_np = raw.view(np.uint32).reshape(n, nlimb).copy()
        validity = _validity_from_pa(a, cap)
        if a.null_count:
            bits = bm.to_numpy_bools(validity, n)
            limbs_np[~bits] = 0
        return col.primitive(limbs_np, dt, validity=validity, capacity=cap)
    raw = np.frombuffer(a.buffers()[1], dtype=np.uint8, count=n * itemsize) if n else np.zeros(0, np.uint8)
    npdt = np.dtype(dtype_to_pa(dt).to_pandas_dtype()) if not isinstance(dt, (st.Timestamp, st.Date32, st.Date64, st.Time32, st.Time64, st.Duration)) else None
    if npdt is None:
        npdt = np.dtype(np.int64) if itemsize == 8 else np.dtype(np.int32)
    vals = raw.view(npdt)[:n]
    validity = _validity_from_pa(a, cap)
    # zero value slots at null/padding rows per the padding contract
    if a.null_count:
        bits = bm.to_numpy_bools(validity, n)
        vals = np.where(bits, vals, np.zeros(1, dtype=npdt))
    return col.primitive(vals, dt, validity=validity, capacity=cap)


def _boolean_from_pa(a) -> col.BooleanColumn:
    n = len(a)
    cap = round_up(max(n, 1))
    raw = np.frombuffer(a.buffers()[1], dtype=np.uint8, count=(n + 7) // 8) if n else np.zeros(0, np.uint8)
    bits = np.unpackbits(raw, bitorder="little")[:n].astype(bool)
    padded = np.zeros(cap, dtype=bool)
    padded[:n] = bits
    validity = _validity_from_pa(a, cap)
    if a.null_count:
        padded[:n] &= bm.to_numpy_bools(validity, n)
    words = bm.from_numpy_bools(padded)
    return col.BooleanColumn(words, validity, jnp.int32(n))


def _string_from_pa(a, dt: st.DataType) -> col.StringViewColumn:
    """Offset-encoded pa string/binary -> views + arena, vectorized."""
    n = len(a)
    cap = round_up(max(n, 1))
    if pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type):
        offsets = np.frombuffer(a.buffers()[1], dtype=np.int64, count=n + 1)
    else:
        offsets = np.frombuffer(a.buffers()[1], dtype=np.int32, count=n + 1).astype(np.int64)
    data_buf = a.buffers()[2]
    data = np.frombuffer(data_buf, dtype=np.uint8, count=int(offsets[-1])) if data_buf is not None and offsets[-1] else np.zeros(0, np.uint8)
    lens = np.diff(offsets)
    valid = np.ones(n, bool)
    if a.null_count:
        raw = np.frombuffer(a.buffers()[0], dtype=np.uint8, count=(n + 7) // 8)
        valid = np.unpackbits(raw, bitorder="little")[:n].astype(bool)
        lens = np.where(valid, lens, 0)
    view_bytes = np.zeros((cap, 16), dtype=np.uint8)
    if n:
        view_bytes[:n, 0:4] = lens.astype(np.uint32)[:, None].view(np.uint8).reshape(n, 4)
        # first up-to-12 bytes of each string, clipped-gather
        padded_data = np.concatenate([data, np.zeros(12, np.uint8)])
        grab_idx = np.minimum(offsets[:n, None] + np.arange(12)[None, :], len(data))
        grab = padded_data[grab_idx] * (np.arange(12)[None, :] < lens[:, None])
        inline = lens <= 12
        view_bytes[:n, 4:8] = grab[:, :4]  # prefix always
        view_bytes[:n, 8:16] = np.where(inline[:, None], grab[:, 4:12], 0)
        # long strings: word3 = arena offset (arena is the data buffer itself)
        views_u32 = view_bytes.view(np.uint32).reshape(cap, 4)
        views_u32[:n, 3] = np.where(inline, views_u32[:n, 3], offsets[:n].astype(np.uint32))
    views = view_bytes.view(np.uint32).reshape(cap, 4)
    arena_cap = round_up(max(len(data), 1))
    arena = np.zeros(arena_cap, dtype=np.uint8)
    arena[: len(data)] = data
    validity = _validity_from_pa(a, cap)
    # null rows already have zero views: lens was zeroed at null slots, so
    # the length word, prefix grab, and inline payload are all zero there.
    return col.StringViewColumn(
        jnp.asarray(views), jnp.asarray(arena), validity, jnp.int32(n), dt,
        len_bound=int(lens.max()) if n else 0,
    )


def _dictionary_from_pa(a, dt: st.Dictionary) -> col.DictionaryColumn:
    keys = _primitive_from_pa(_normalize(a.indices), dt.key)
    values = column_from_pa(_normalize(a.dictionary))
    nvals = values.concrete_length()
    # precompute value sort-ranks on host (DictionaryColumn.value_ranks)
    pylist = values.to_pylist()
    order = sorted(range(nvals), key=lambda i: (pylist[i] is None, pylist[i]))
    ranks = np.zeros(values.capacity, dtype=np.int32)
    for r, i in enumerate(order):
        ranks[i] = r
    return col.DictionaryColumn(keys, values, jnp.asarray(ranks), dt)


def _valid_bools(a, n):
    if a.null_count == 0:
        return np.ones(n, bool)
    raw = np.frombuffer(a.buffers()[0], dtype=np.uint8, count=(n + 7) // 8)
    return np.unpackbits(raw, bitorder="little")[:n].astype(bool)


def _list_from_pa(a, dt) -> col.ListViewColumn:
    n = len(a)
    cap = round_up(max(n, 1))
    if pa.types.is_map(a.type):
        offsets = np.asarray(a.offsets).astype(np.int64)
        entries = pa.StructArray.from_arrays(
            [_normalize(a.keys), _normalize(a.items)], names=["key", "value"]
        )
        child = column_from_pa(entries)
    else:
        if pa.types.is_large_list(a.type):
            offsets = np.frombuffer(a.buffers()[1], dtype=np.int64, count=n + 1)
        else:
            offsets = np.frombuffer(a.buffers()[1], dtype=np.int32, count=n + 1).astype(np.int64)
        child = column_from_pa(_normalize(a.values))
    starts = np.zeros(cap, np.int32)
    sizes = np.zeros(cap, np.int32)
    starts[:n] = offsets[:-1]
    sizes[:n] = np.diff(offsets)
    valid = _valid_bools(a, n)
    starts[:n] = np.where(valid, starts[:n], 0)
    sizes[:n] = np.where(valid, sizes[:n], 0)
    return col.ListViewColumn(
        jnp.asarray(starts),
        jnp.asarray(sizes),
        child,
        _validity_from_pa(a, cap),
        jnp.int32(n),
        dt,
    )


def _struct_from_pa(a, dt: st.Struct) -> col.StructColumn:
    n = len(a)
    cap = round_up(max(n, 1))
    children = []
    for i, f in enumerate(dt.fields):
        children.append(_grow(column_from_pa(_normalize(a.field(i))), cap))
    return col.StructColumn(
        tuple(children), _validity_from_pa(a, cap), jnp.int32(n), dt
    )


def _fixed_size_list_from_pa(a, dt: st.FixedSizeList) -> col.FixedSizeListColumn:
    n = len(a)
    cap = round_up(max(n, 1))
    size = dt.size
    child = column_from_pa(_normalize(a.values))
    # child must span cap*size rows
    target = cap * size
    if child.capacity < target:
        child = _grow(child, target)  # target is already granule-aligned
    return col.FixedSizeListColumn(
        child, _validity_from_pa(a, cap), jnp.int32(n), dt
    )


def column_from_pa(a) -> col.Column:
    _require_pa()
    a = _normalize(a)
    t = a.type
    if hasattr(pa.types, "is_string_view") and (
        pa.types.is_string_view(t) or pa.types.is_binary_view(t)
    ):
        a = a.cast(pa.utf8() if pa.types.is_string_view(t) else pa.binary())
        t = a.type
    if hasattr(pa.types, "is_list_view") and pa.types.is_list_view(t):
        a = a.cast(pa.list_(t.value_type))
        t = a.type
    dt = dtype_from_pa(t)
    if isinstance(dt, st.Null):
        return col.null_column(len(a))
    if isinstance(dt, st.Boolean):
        return _boolean_from_pa(a)
    if isinstance(dt, st.Dictionary):
        return _dictionary_from_pa(a, dt)
    if isinstance(dt, (st.Utf8, st.Binary)):
        return _string_from_pa(a, dt)
    if isinstance(dt, (st.List, st.Map)):
        return _list_from_pa(a, dt)
    if isinstance(dt, st.Struct):
        return _struct_from_pa(a, dt)
    if isinstance(dt, st.FixedSizeList):
        return _fixed_size_list_from_pa(a, dt)
    return _primitive_from_pa(a, dt)


def from_pyarrow(x):
    """pa.Array/ChunkedArray -> Column; pa.RecordBatch/Table -> RecordBatch."""
    _require_pa()
    if isinstance(x, pa.Table):
        x = x.combine_chunks()
        cols = tuple(column_from_pa(c) for c in x.columns)
        return rb.RecordBatch(schema_from_pa(x.schema), _equalize(cols))
    if isinstance(x, pa.RecordBatch):
        cols = tuple(column_from_pa(c) for c in x.columns)
        return rb.RecordBatch(schema_from_pa(x.schema), _equalize(cols))
    return column_from_pa(x)


def _equalize(cols):
    """Pad columns of one batch to a shared capacity (they share length)."""
    if not cols:
        return cols
    cap = max(c.capacity for c in cols)
    return tuple(_grow(c, cap) for c in cols)


def _grow(c: col.Column, cap: int) -> col.Column:
    if c.capacity == cap:
        return c
    import dataclasses as dc

    if isinstance(c, col.PrimitiveColumn):
        pad = ((0, cap - c.capacity), (0, 0)) if c.values.ndim == 2 else (0, cap - c.capacity)
        values = jnp.pad(c.values, pad)
        validity = None if c.validity is None else bm.grow(c.validity, cap)
        return dc.replace(c, values=values, validity=validity)
    if isinstance(c, col.BooleanColumn):
        return dc.replace(
            c,
            values=bm.grow(c.values, cap),
            validity=None if c.validity is None else bm.grow(c.validity, cap),
        )
    if isinstance(c, col.StringViewColumn):
        validity = None if c.validity is None else bm.grow(c.validity, cap)
        return dc.replace(c, views=jnp.pad(c.views, ((0, cap - c.capacity), (0, 0))), validity=validity)
    if isinstance(c, col.DictionaryColumn):
        return dc.replace(c, keys=_grow(c.keys, cap))
    if isinstance(c, col.ListViewColumn):
        validity = None if c.validity is None else bm.grow(c.validity, cap)
        return dc.replace(
            c,
            starts=jnp.pad(c.starts, (0, cap - c.capacity)),
            sizes=jnp.pad(c.sizes, (0, cap - c.capacity)),
            validity=validity,
        )
    if isinstance(c, col.StructColumn):
        validity = None if c.validity is None else bm.grow(c.validity, cap)
        return dc.replace(
            c, children=tuple(_grow(ch, cap) for ch in c.children), validity=validity
        )
    if isinstance(c, col.FixedSizeListColumn):
        validity = None if c.validity is None else bm.grow(c.validity, cap)
        return dc.replace(
            c, child=_grow(c.child, cap * c.dtype.size), validity=validity
        )
    if isinstance(c, col.NullColumn):
        return col.NullColumn(c.length, cap)
    raise st.SchemaError(f"cannot grow {type(c).__name__}")
