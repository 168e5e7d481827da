"""Type cast kernel.

Capability mirror of the reference's arrow-cast crate
(/root/reference/arrow-cast/src/cast/mod.rs:753 `cast_with_options`,
can_cast_types mod.rs:115, CastOptions mod.rs:96; string parse/display
arrow-cast/src/{parse,display}.rs) re-designed TPU-first:

  * numeric/bool/temporal casts run on device and fuse in XLA; 64-bit
    logical types convert through their uint32 limb representation
    (core/wide.py) with explicit exact range checks;
  * `CastOptions.safe=True` turns per-row cast failures into nulls — the
    failure mask folds into the validity bitmap with zero control flow,
    exactly the shape XLA wants.  `safe=False` raises ComputeError at a
    host sync (the analogue of the reference returning Err);
  * string format/parse are host-side (the reference's display.rs/parse.rs
    are scalar code too — there is no vectorizable hot loop to win on TPU);
  * dictionary casts follow the reference's policy: cast the values and
    keep the keys (cast/dictionary.rs), decode = gather values by key.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import schema as st
from ..config import CastOptions
from ..core import bitmap as bm
from ..core import column as col
from ..core import wide as wd
from .numeric import raise_if

_INTISH = (st.Timestamp, st.Date32, st.Date64, st.Time32, st.Time64, st.Duration)

_UNIT_NS = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}


def _storage_int(dt: st.DataType) -> st.DataType:
    """The integer type a temporal type stores as (reference
    arrow-schema/src/datatype.rs: Date32/Time32 are i32; the rest i64)."""
    if isinstance(dt, (st.Date32, st.Time32)):
        return st.int32
    return st.int64


def can_cast_types(from_dt: st.DataType, to_dt: st.DataType) -> bool:
    """reference cast/mod.rs:115."""
    if from_dt == to_dt:
        return True
    if isinstance(from_dt, st.Null):
        return True
    if isinstance(from_dt, st.Dictionary):
        return can_cast_types(from_dt.value, to_dt)
    if isinstance(to_dt, st.Dictionary):
        return can_cast_types(from_dt, to_dt.value)
    if isinstance(from_dt, st.Union):
        return any(f.dtype == to_dt or can_cast_types(f.dtype, to_dt)
                   for f in from_dt.fields)
    if isinstance(to_dt, st.Union):
        return False
    if isinstance(from_dt, st.Map) and isinstance(to_dt, st.Map):
        return (can_cast_types(from_dt.key, to_dt.key)
                and can_cast_types(from_dt.item, to_dt.item))
    if isinstance(from_dt, st.Interval) or isinstance(to_dt, st.Interval):
        iv_pairs = (
            (isinstance(from_dt, st.Interval)
             and from_dt.unit in ("year_month", "day_time")
             and isinstance(to_dt, st.Interval)
             and to_dt.unit == "month_day_nano")
            or (isinstance(from_dt, st.Interval)
                and from_dt.unit == "month_day_nano"
                and isinstance(to_dt, st.Duration))
            or (isinstance(from_dt, st.Duration)
                and isinstance(to_dt, st.Interval)
                and to_dt.unit == "month_day_nano")
            or (isinstance(from_dt, st.Int) and isinstance(to_dt, st.Interval)
                and to_dt.unit == "year_month")
            or (isinstance(from_dt, st.Interval)
                and from_dt.unit == "year_month"
                and isinstance(to_dt, st.Int))
        )
        return iv_pairs
    if isinstance(to_dt, st.FixedSizeBinary):
        return isinstance(from_dt, (st.Binary, st.Utf8))
    if isinstance(from_dt, st.FixedSizeBinary):
        return isinstance(to_dt, (st.Binary, st.Utf8))
    numericish = lambda d: d.is_numeric or isinstance(d, st.Boolean)
    if numericish(from_dt) and numericish(to_dt):
        return True
    stringish = lambda d: isinstance(d, (st.Utf8, st.Binary))
    if stringish(from_dt) and stringish(to_dt):
        return True
    if stringish(to_dt) and not isinstance(from_dt, st.Struct):
        return True
    if stringish(from_dt) and (numericish(to_dt) or isinstance(to_dt, _INTISH)):
        return True
    if isinstance(from_dt, _INTISH) and isinstance(to_dt, _INTISH):
        # temporal-to-temporal families the reference supports
        date = (st.Date32, st.Date64)
        time = (st.Time32, st.Time64)
        if isinstance(from_dt, st.Timestamp) and isinstance(to_dt, (st.Timestamp,) + date + time):
            return True
        if isinstance(from_dt, date) and isinstance(to_dt, (st.Timestamp,) + date):
            return True
        if isinstance(from_dt, time) and isinstance(to_dt, time):
            return True
        if isinstance(from_dt, st.Duration) and isinstance(to_dt, st.Duration):
            return True
        return False
    if isinstance(from_dt, _INTISH) and to_dt.is_numeric:
        return True
    if from_dt.is_numeric and isinstance(to_dt, _INTISH):
        return True
    return False


# ---------------------------------------------------------------------------
# numeric value plane: a column's values as ("narrow", arr) | (kind, limbs)
# ---------------------------------------------------------------------------


def _numeric_repr(c: col.Column):
    if isinstance(c, col.BooleanColumn):
        return "narrow", c.values_bool().astype(jnp.uint8)
    if isinstance(c, col.PrimitiveColumn):
        k = c.wide
        if k is None:
            return "narrow", c.values
        return k, c.values
    raise st.CastError(f"not a numeric column: {type(c).__name__}")


def _f64_limbs_to_float_value(limbs):
    return wd.f64_to_value(limbs)


def _float_value_to_i64(v):
    """trunc(float) -> signed limbs + out-of-range mask."""
    t = jnp.trunc(v)
    neg = t < 0
    a = jnp.abs(t)
    hi = jnp.floor(a / jnp.float64(2.0**32))
    lo = a - hi * jnp.float64(2.0**32)
    mag = wd.make(lo, hi)
    out = jnp.where(neg[..., None], wd.neg(mag), mag)
    bad = ~(jnp.abs(t) < jnp.float64(2.0**63)) | jnp.isnan(v)
    # exactly -2^63 is representable
    bad = bad & ~(t == jnp.float64(-(2.0**63)))
    return out, bad


def _float_value_to_u64(v):
    t = jnp.trunc(v)
    hi = jnp.floor(t / jnp.float64(2.0**32))
    lo = t - hi * jnp.float64(2.0**32)
    out = wd.make(lo, hi)
    bad = (t < 0) | ~(t < jnp.float64(2.0**64)) | jnp.isnan(v)
    return out, bad


def _to_target(kind, vals, to_dt: st.DataType):
    """Convert (kind, vals) to the physical values of `to_dt`.
    Returns (values, bad_mask_bool or None)."""
    tk = st.wide_kind(to_dt)
    cap_shape = vals.shape[0]

    # ---- source as a "comparable" form per target ----
    if tk is None:  # narrow target (ints <=32, floats, bool storage uint8)
        jdt = to_dt.to_jnp() if not isinstance(to_dt, st.Boolean) else jnp.uint8
        if kind == "narrow":
            out = vals.astype(jdt)
            if jnp.issubdtype(jdt, jnp.integer):
                # round-trip check: value representable?
                if jnp.issubdtype(vals.dtype, jnp.floating):
                    t = jnp.trunc(vals)
                    info = jnp.iinfo(jdt)
                    bad = ~((t >= info.min) & (t <= info.max)) | jnp.isnan(vals)
                    out = jnp.where(bad, jnp.zeros_like(t), t).astype(jdt)
                    return out, bad
                bad = out.astype(vals.dtype) != vals
                # signedness flip: negative -> unsigned is bad even if bits match
                if jnp.issubdtype(vals.dtype, jnp.signedinteger) and jnp.issubdtype(
                    jdt, jnp.unsignedinteger
                ):
                    bad = bad | (vals < 0)
                if jnp.issubdtype(vals.dtype, jnp.unsignedinteger) and jnp.issubdtype(
                    jdt, jnp.signedinteger
                ):
                    bad = bad | (out < 0)
                return jnp.where(bad, jnp.zeros_like(out), out), bad
            return out, None
        if kind in ("i64", "u64"):
            if jnp.issubdtype(jdt, jnp.floating):
                v = wd.i64_to_float(vals) if kind == "i64" else wd.u64_to_float(vals)
                return v.astype(jdt), None
            lo = wd.lo(vals)
            hi = wd.hi(vals)
            if jnp.issubdtype(jdt, jnp.signedinteger):
                out32 = lo.astype(jnp.int32)
                sign_ext = jnp.where(out32 < 0, wd.U32(0xFFFFFFFF), wd.U32(0))
                bad = (hi != sign_ext) if kind == "i64" else (hi != 0) | (out32 < 0)
                out = out32.astype(jdt)
                bad = bad | (out.astype(jnp.int32) != out32)
            else:
                bad = hi != 0
                if kind == "i64":
                    bad = bad | wd.is_negative(vals)
                out = lo.astype(jdt)
                bad = bad | (out.astype(jnp.uint32) != lo)
            return jnp.where(bad, jnp.zeros_like(out), out), bad
        if kind == "f64":
            v = _f64_limbs_to_float_value(vals)
            if jnp.issubdtype(jdt, jnp.floating):
                return v.astype(jdt), None
            t = jnp.trunc(v)
            info = jnp.iinfo(jdt)
            bad = ~((t >= info.min) & (t <= info.max)) | jnp.isnan(v)
            return jnp.where(bad, jnp.zeros_like(t), t).astype(jdt), bad

    if tk in ("i64", "u64"):
        if kind == "narrow":
            if jnp.issubdtype(vals.dtype, jnp.floating):
                v = vals.astype(jnp.float64)
                out, bad = (
                    _float_value_to_i64(v) if tk == "i64" else _float_value_to_u64(v)
                )
                return out, bad
            if jnp.issubdtype(vals.dtype, jnp.signedinteger):
                out = wd.from_int32(vals)
                bad = (vals < 0) if tk == "u64" else None
                return out, bad
            return wd.from_uint32(vals), None
        if kind in ("i64", "u64"):
            if kind == tk:
                return vals, None
            if kind == "i64":  # -> u64
                return vals, wd.is_negative(vals)
            return vals, wd.hi(vals) >= wd.U32(0x80000000)  # u64 -> i64
        if kind == "f64":
            v = _f64_limbs_to_float_value(vals)
            return _float_value_to_i64(v) if tk == "i64" else _float_value_to_u64(v)

    if tk == "f64":
        if kind == "narrow":
            return wd.f64_from_value(vals.astype(jnp.float64)), None
        if kind == "i64":
            return wd.f64_from_value(wd.i64_to_float(vals)), None
        if kind == "u64":
            return wd.f64_from_value(wd.u64_to_float(vals)), None
        if kind == "f64":
            return vals, None
    raise st.CastError(f"unsupported numeric cast to {to_dt}")


def _apply_bad(c_validity, bad, cap, length, options: CastOptions, ctx: str):
    """Fold a per-row failure mask into validity (safe) or raise."""
    if bad is None:
        return c_validity
    live = bad & bm.unpack(c_validity, cap) if c_validity is not None else bad
    live = live & bm.row_mask_bool(cap, length)
    if not options.safe:
        raise_if(jnp.any(live), f"cast failure: {ctx}")
        return c_validity
    bad_words = bm.pack(live)
    base = c_validity if c_validity is not None else bm.all_valid(cap) & bm.row_mask_words(cap, length)
    return base & ~bad_words


# ---------------------------------------------------------------------------
# temporal helpers
# ---------------------------------------------------------------------------


def _unit_factor(from_unit: str, to_unit: str):
    """(multiplier, divisor): value * mult / div converts units."""
    a, b = _UNIT_NS[from_unit], _UNIT_NS[to_unit]
    if a >= b:
        return a // b, 1
    return 1, b // a


def _const_limbs(v: int):
    return jnp.asarray(wd.split_numpy(np.array([v], dtype=np.int64)))[0]


def _i64_scale(limbs, mult: int, div: int, floor: bool = False):
    """limbs * mult / div in exact wide math; division truncates (or floors)."""
    if mult != 1:
        limbs = wd.mul(limbs, jnp.broadcast_to(_const_limbs(mult), limbs.shape))
    if div != 1:
        d = jnp.broadcast_to(_const_limbs(div), limbs.shape)
        q, r = wd.divmod_signed(limbs, d)
        if floor:
            adjust = wd.is_negative(limbs) & ~wd._is_zero(r)
            q = jnp.where(adjust[..., None], wd.sub(q, jnp.broadcast_to(_const_limbs(1), q.shape)), q)
        limbs = q
    return limbs


def _temporal_to_i64_limbs(c: col.PrimitiveColumn):
    """Any temporal column -> its value as i64 limbs."""
    if c.wide is not None:
        return c.values
    return wd.from_int32(c.values)


# ---------------------------------------------------------------------------
# cast entry point
# ---------------------------------------------------------------------------


def cast(c: col.Column, to_dt: st.DataType, options: CastOptions = CastOptions()):
    """reference cast_with_options, cast/mod.rs:753."""
    from_dt = c.dtype
    if from_dt == to_dt:
        return c
    cap, length = c.capacity, c.length

    if isinstance(c, col.NullColumn):
        return _all_null(to_dt, c.concrete_length())

    # dictionary source: cast values, keep keys (cast/dictionary.rs) —
    # unless target is non-dict, then decode first (gather values by key)
    if isinstance(c, col.DictionaryColumn):
        if isinstance(to_dt, st.Dictionary):
            return col.DictionaryColumn(
                c.keys, cast(c.values, to_dt.value, options), None, to_dt
            )
        return cast(dictionary_decode(c), to_dt, options)
    if isinstance(to_dt, st.Dictionary):
        return dictionary_encode(cast(c, to_dt.value, options), to_dt)

    # union source: extract the first child castable to the target, rows
    # of other type ids become null (reference cast/mod.rs:130
    # resolve_child_array + :797 union_extract_by_type; casting TO a
    # union is not supported, mod.rs:802)
    if isinstance(c, col.UnionColumn):
        from .union import union_extract

        exact = [f for f in c.dtype.fields if f.dtype == to_dt]
        castable = exact or [f for f in c.dtype.fields
                             if can_cast_types(f.dtype, to_dt)]
        if not castable:
            raise st.CastError(f"union has no child castable to {to_dt}")
        child = union_extract(c, castable[0].name)
        return cast(child, to_dt, options)
    if isinstance(to_dt, st.Union):
        raise st.CastError("casting to a union is not supported "
                           "(reference cast/mod.rs:802)")

    # map -> map: entries cast element-wise (reference cast/map.rs,
    # mod.rs:163/:939)
    if isinstance(c, col.ListViewColumn) and isinstance(c.dtype, st.Map) \
            and isinstance(to_dt, st.Map):
        import dataclasses

        entries = cast(c.child, to_dt.entry_struct, options)
        return dataclasses.replace(c, child=entries, dtype=to_dt)

    # interval conversions (reference cast/mod.rs:324-339)
    if isinstance(from_dt, st.Interval) or isinstance(to_dt, st.Interval):
        out = _cast_interval(c, to_dt, options)
        if out is not None:
            return out
        raise st.CastError(f"cast {from_dt} -> {to_dt} unsupported")

    # fixed-size binary (reference cast/mod.rs:257-263)
    if isinstance(to_dt, st.FixedSizeBinary) and isinstance(
            c, col.StringViewColumn):
        return _binary_to_fsb(c, to_dt, options)
    if isinstance(from_dt, st.FixedSizeBinary) and isinstance(
            to_dt, (st.Binary, st.Utf8)):
        return _fsb_to_binary(c, to_dt)

    # nested casts: element-wise through children (reference cast/list.rs,
    # struct casts by position)
    if isinstance(c, col.ListViewColumn) and isinstance(to_dt, st.List):
        import dataclasses

        return dataclasses.replace(
            c, child=cast(c.child, to_dt.value, options), dtype=to_dt
        )
    if isinstance(c, col.FixedSizeListColumn) and isinstance(to_dt, st.FixedSizeList):
        import dataclasses

        if to_dt.size != c.dtype.size:
            raise st.CastError("fixed_size_list size mismatch")
        return dataclasses.replace(
            c, child=cast(c.child, to_dt.value, options), dtype=to_dt
        )
    if isinstance(c, col.StructColumn) and isinstance(to_dt, st.Struct):
        if len(to_dt.fields) != len(c.children):
            raise st.CastError("struct field count mismatch")
        children = tuple(
            cast(ch, f.dtype, options) for ch, f in zip(c.children, to_dt.fields)
        )
        return col.StructColumn(children, c.validity, c.length, to_dt)

    # decimal source / target (reference arrow-cast/src/cast/decimal.rs)
    from_dec = st.decimal_limbs(from_dt) is not None
    to_dec = st.decimal_limbs(to_dt) is not None
    if from_dec or to_dec:
        from . import decimal as dec

        if from_dec and to_dec:
            return dec.rescale(c, to_dt, safe=options.safe)
        if from_dec:
            if isinstance(to_dt, st.Int) and to_dt.bits == 64 and to_dt.signed:
                return dec.to_int(c, to_dt, safe=options.safe)
            if isinstance(to_dt, st.Int):
                return cast(dec.to_int(c, st.int64, safe=options.safe),
                            to_dt, options)
            if isinstance(to_dt, st.Float):
                out = dec.to_float(c)
                return out if to_dt.bits == 64 else cast(out, to_dt, options)
            if isinstance(to_dt, (st.Utf8, st.Binary)):
                return dec.to_string(c)
            raise st.CastError(f"cast {from_dt} -> {to_dt} unsupported")
        # to_dec from numeric/string
        if isinstance(c, col.StringViewColumn):
            return dec.from_string(c, to_dt)
        if isinstance(from_dt, st.Int):
            return dec.from_int(c, to_dt)
        if isinstance(from_dt, st.Float):
            return dec.from_float(c, to_dt)
        raise st.CastError(f"cast {from_dt} -> {to_dt} unsupported")

    # string source
    if isinstance(c, col.StringViewColumn):
        if isinstance(to_dt, (st.Utf8, st.Binary)):
            import dataclasses

            return dataclasses.replace(c, dtype=to_dt)  # views are identical
        return _cast_string_to(c, to_dt, options)

    # string target
    if isinstance(to_dt, (st.Utf8, st.Binary)):
        return _cast_to_string(c, to_dt)

    # temporal <-> temporal
    if isinstance(from_dt, _INTISH) and isinstance(to_dt, _INTISH):
        return _cast_temporal(c, to_dt, options)

    # numeric-plane cast (ints/floats/bool/temporal-as-int)
    kind, vals = _numeric_repr(c)
    if isinstance(to_dt, st.Boolean):
        if kind == "narrow":
            bits = vals != 0
        elif kind == "f64":
            bits = ~wd.f64_is_zero(vals)  # NaN is nonzero -> true
        else:
            bits = ~wd._is_zero(vals)
        return col.BooleanColumn(bm.pack(bits), c.validity, length)
    if not (to_dt.is_numeric or isinstance(to_dt, _INTISH)):
        raise st.CastError(f"cannot cast {from_dt} -> {to_dt}")
    tgt_num = _storage_int(to_dt) if isinstance(to_dt, _INTISH) else to_dt
    out_vals, bad = _to_target(kind, vals, tgt_num)
    validity = _apply_bad(c.validity, bad, cap, length, options, f"{from_dt}->{to_dt}")
    if bad is not None and options.safe:
        # zero failed slots to honor the padding/null contract
        if out_vals.ndim == 2:
            out_vals = jnp.where(bad[:, None], 0, out_vals)
        else:
            out_vals = jnp.where(bad, jnp.zeros_like(out_vals), out_vals)
    return col.PrimitiveColumn(out_vals, validity, length, to_dt)


def _cast_interval(c: col.Column, to_dt: st.DataType,
                   options: CastOptions):
    """Interval conversions (reference cast/mod.rs:324-339): YM/DT ->
    MonthDayNano, Duration <-> MonthDayNano, Int32/Int64 <-> YearMonth.
    Returns None for unsupported pairs."""
    from_dt = c.dtype
    cap, length = c.capacity, c.length
    U32 = jnp.uint32

    def mdn(months, days, nanos_limbs):
        vals = jnp.stack([
            months.astype(U32), days.astype(U32),
            nanos_limbs[..., 0], nanos_limbs[..., 1]], axis=-1)
        return col.PrimitiveColumn(vals, c.validity, length, to_dt)

    z = jnp.zeros(cap, jnp.int32)
    if isinstance(from_dt, st.Interval) and isinstance(to_dt, st.Interval):
        if from_dt.unit == "year_month" and to_dt.unit == "month_day_nano":
            return mdn(c.values[:, 0], z, wd.zeros((cap,)))
        if from_dt.unit == "day_time" and to_dt.unit == "month_day_nano":
            ms = c.values[:, 1].astype(jnp.int32)
            nanos = _i64_scale(wd.from_int32(ms), 10**6, 1)
            return mdn(z, c.values[:, 0], nanos)
        return None
    if isinstance(from_dt, st.Interval) and isinstance(to_dt, st.Duration):
        if from_dt.unit != "month_day_nano":
            return None
        months = c.values[:, 0].astype(jnp.int32)
        days = c.values[:, 1].astype(jnp.int32)
        nanos = jnp.stack([c.values[:, 2], c.values[:, 3]], axis=-1)
        bad = (months != 0) | (days != 0)
        out = _i64_scale(nanos, 1, _UNIT_NS[to_dt.unit])
        validity = _apply_bad(c.validity, bad, cap, length, options,
                              f"{from_dt}->{to_dt} (months/days nonzero)")
        out = jnp.where(bad[:, None], 0, out)
        return col.PrimitiveColumn(out, validity, length, to_dt)
    if isinstance(from_dt, st.Duration) and isinstance(to_dt, st.Interval):
        if to_dt.unit != "month_day_nano":
            return None
        nanos = _i64_scale(c.values, _UNIT_NS[from_dt.unit], 1)
        return mdn(z, z, nanos)
    if isinstance(from_dt, st.Int) and isinstance(to_dt, st.Interval) \
            and to_dt.unit == "year_month":
        months = (c.values.astype(jnp.int32) if c.values.ndim == 1
                  else wd.to_int32_wrap(c.values))
        return col.PrimitiveColumn(months.astype(U32)[:, None], c.validity,
                                   length, to_dt)
    if isinstance(from_dt, st.Interval) and from_dt.unit == "year_month" \
            and isinstance(to_dt, st.Int):
        months = c.values[:, 0].astype(jnp.int32)
        src = col.PrimitiveColumn(months, c.validity, length, st.int32)
        return cast(src, to_dt, options)
    return None


def _binary_to_fsb(c: col.StringViewColumn, to_dt: st.FixedSizeBinary,
                   options: CastOptions):
    """Binary/Utf8 -> FixedSizeBinary (reference cast/mod.rs:257):
    values whose length != byte_width become null (safe) or error."""
    from .strings import byte_matrix

    bw = to_dt.byte_width
    cap, length = c.capacity, c.length
    L = -(-max(bw, 1) // 4) * 4
    mat, lens = byte_matrix(c, L)
    bad = (lens != bw) & c.valid_bool()
    validity = _apply_bad(c.validity, bad, cap, length, options,
                          f"{c.dtype}->{to_dt} (length != {bw})")
    quads = mat.reshape(cap, L // 4, 4).astype(jnp.uint32)
    words = (quads[:, :, 0] | (quads[:, :, 1] << 8)
             | (quads[:, :, 2] << 16) | (quads[:, :, 3] << 24))
    nw = -(-bw // 4)
    words = words[:, :nw]
    words = jnp.where(bad[:, None], 0, words)
    return col.PrimitiveColumn(words, validity, length, to_dt)


def _fsb_to_binary(c: col.PrimitiveColumn, to_dt: st.DataType):
    """FixedSizeBinary -> Binary/Utf8 views sharing a device arena
    (reference cast/mod.rs:263)."""
    import jax

    bw = c.dtype.byte_width
    cap, length = c.capacity, c.length
    nw = c.values.shape[1]
    stride = nw * 4
    arena = jax.lax.bitcast_convert_type(
        c.values.reshape(-1), jnp.uint8).reshape(-1)
    iota = jnp.arange(cap, dtype=jnp.uint32)
    lens = jnp.full(cap, bw, jnp.uint32)
    if bw <= 12:
        w1 = c.values[:, 0] if nw >= 1 else jnp.zeros(cap, jnp.uint32)
        w2 = c.values[:, 1] if nw >= 2 else jnp.zeros(cap, jnp.uint32)
        w3 = c.values[:, 2] if nw >= 3 else jnp.zeros(cap, jnp.uint32)
        views = jnp.stack([lens, w1, w2, w3], axis=-1)
    else:
        views = jnp.stack([lens, c.values[:, 0],
                           jnp.zeros(cap, jnp.uint32), iota * stride],
                          axis=-1)
    return col.StringViewColumn(views, arena, c.validity, length, to_dt, bw)


def _all_null(to_dt: st.DataType, n: int) -> col.Column:
    if isinstance(to_dt, st.Null):
        return col.null_column(n)
    vals = [None] * n
    return col.from_pylist(vals, to_dt) if not isinstance(to_dt, st.Dictionary) else col.dictionary_encode_host(vals, to_dt)


def _cast_temporal(c: col.PrimitiveColumn, to_dt: st.DataType, options: CastOptions):
    from_dt = c.dtype
    limbs = _temporal_to_i64_limbs(c)

    def from_units(u):  # nanos per tick of unit u
        return _UNIT_NS[u]

    MS_PER_DAY = 86_400_000

    if isinstance(from_dt, st.Timestamp) and isinstance(to_dt, st.Timestamp):
        mult, div = _unit_factor(from_dt.unit, to_dt.unit)
        out = _i64_scale(limbs, mult, div)
        return _emit_temporal(out, c, to_dt)
    if isinstance(from_dt, st.Timestamp) and isinstance(to_dt, (st.Date32, st.Date64)):
        # floor-divide to days (reference cast: timestamp -> date floors)
        mult_ms, div_ms = _unit_factor(from_dt.unit, "ms")
        ms = _i64_scale(limbs, mult_ms, div_ms, floor=True)
        days = _i64_scale(ms, 1, MS_PER_DAY, floor=True)
        if isinstance(to_dt, st.Date32):
            return col.PrimitiveColumn(wd.to_int32_wrap(days), c.validity, c.length, to_dt)
        return _emit_temporal(_i64_scale(days, MS_PER_DAY, 1), c, to_dt)
    if isinstance(from_dt, st.Date32) and isinstance(to_dt, st.Date64):
        return _emit_temporal(_i64_scale(limbs, MS_PER_DAY, 1), c, to_dt)
    if isinstance(from_dt, st.Date64) and isinstance(to_dt, st.Date32):
        days = _i64_scale(limbs, 1, MS_PER_DAY, floor=True)
        return col.PrimitiveColumn(wd.to_int32_wrap(days), c.validity, c.length, to_dt)
    if isinstance(from_dt, (st.Date32, st.Date64)) and isinstance(to_dt, st.Timestamp):
        mult, div = _unit_factor("ms", to_dt.unit)
        ms = _i64_scale(limbs, MS_PER_DAY, 1) if isinstance(from_dt, st.Date32) else limbs
        return _emit_temporal(_i64_scale(ms, mult, div), c, to_dt)
    if isinstance(from_dt, (st.Time32, st.Time64)) and isinstance(to_dt, (st.Time32, st.Time64)):
        mult, div = _unit_factor(from_dt.unit, to_dt.unit)
        out = _i64_scale(limbs, mult, div)
        if isinstance(to_dt, st.Time32):
            return col.PrimitiveColumn(wd.to_int32_wrap(out), c.validity, c.length, to_dt)
        return _emit_temporal(out, c, to_dt)
    if isinstance(from_dt, st.Duration) and isinstance(to_dt, st.Duration):
        mult, div = _unit_factor(from_dt.unit, to_dt.unit)
        return _emit_temporal(_i64_scale(limbs, mult, div), c, to_dt)
    raise st.CastError(f"unsupported temporal cast {from_dt} -> {to_dt}")


def _emit_temporal(limbs, src: col.Column, to_dt: st.DataType):
    return col.PrimitiveColumn(limbs, src.validity, src.length, to_dt)


# ---------------------------------------------------------------------------
# string casts (host-side; reference display.rs / parse.rs are scalar too)
# ---------------------------------------------------------------------------


def _format_value(v, dt: st.DataType) -> str:
    if isinstance(dt, st.Boolean):
        return "true" if v else "false"
    if isinstance(dt, st.Float):
        return repr(float(v))
    return str(v)


def _cast_to_string(c: col.Column, to_dt: st.DataType) -> col.StringViewColumn:
    vals = c.to_pylist()
    out = [None if v is None else _format_value(v, c.dtype) for v in vals]
    if isinstance(to_dt, st.Binary):
        out = [None if s is None else s.encode() for s in out]
    return col.string_view(out, to_dt)


def _parse_one(s: str, dt: st.DataType):
    if isinstance(dt, st.Int):
        return int(s.strip())
    if isinstance(dt, st.Float):
        return float(s)
    if isinstance(dt, st.Boolean):
        ls = s.strip().lower()
        if ls in ("true", "t", "1"):
            return True
        if ls in ("false", "f", "0"):
            return False
        raise ValueError(s)
    if isinstance(dt, st.Timestamp):
        import datetime as _dt

        ts = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        delta = ts - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        ns = (delta.days * 86400 + delta.seconds) * 10**9 + delta.microseconds * 1000
        return ns // _UNIT_NS[dt.unit]
    if isinstance(dt, st.Date32):
        import datetime as _dt

        d = _dt.date.fromisoformat(s)
        return (d - _dt.date(1970, 1, 1)).days
    raise st.CastError(f"cannot parse string as {dt}")


def _cast_string_to(c: col.StringViewColumn, to_dt: st.DataType, options: CastOptions):
    vals = c.to_pylist()
    out, valid = [], []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        if isinstance(v, bytes):
            v = v.decode("utf-8", errors="replace")
        try:
            out.append(_parse_one(v, to_dt))
        except (ValueError, OverflowError):
            if not options.safe:
                raise st.CastError(f"cannot cast {v!r} to {to_dt}")
            out.append(None)
    if isinstance(to_dt, st.Int) and to_dt.bits == 64:
        info_min, info_max = (-(2**63), 2**63 - 1) if to_dt.signed else (0, 2**64 - 1)
        checked = []
        for v in out:
            if v is not None and not (info_min <= v <= info_max):
                if not options.safe:
                    raise st.CastError(f"{v} out of range for {to_dt}")
                v = None
            checked.append(v)
        out = checked
    elif isinstance(to_dt, st.Int):
        info = np.iinfo(to_dt.to_jnp().name)
        checked = []
        for v in out:
            if v is not None and not (info.min <= v <= info.max):
                if not options.safe:
                    raise st.CastError(f"{v} out of range for {to_dt}")
                v = None
            checked.append(v)
        out = checked
    return col.from_pylist(out, to_dt)


# ---------------------------------------------------------------------------
# dictionary encode/decode
# ---------------------------------------------------------------------------


def dictionary_decode(c: col.DictionaryColumn) -> col.Column:
    """dict -> plain values column: gather values by key (reference
    cast/dictionary.rs unpacks through take)."""
    from .take import take

    out = take(c.values, c.keys.with_validity(None))
    out = out.with_validity(
        bm.union(c.keys.validity, out.validity)
    ) if (c.keys.validity is not None or out.validity is not None) else out
    return out.with_length(c.length)


def dictionary_encode(c: col.Column, to_dt: st.Dictionary = None) -> col.DictionaryColumn:
    """plain -> dict (host-side interning builder; reference
    builder/generic_bytes_dictionary_builder.rs)."""
    if to_dt is None:
        to_dt = st.Dictionary(st.int32, c.dtype)
    return col.dictionary_encode_host(c.to_pylist(), to_dt)
