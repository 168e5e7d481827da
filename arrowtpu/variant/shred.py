"""Variant shredding / unshredding (parquet-format VariantShredding.md).

Capability mirror of the reference's
parquet-variant-compute/src/shred_variant.rs (`shred_variant`: cast an
unshredded VariantArray to a shredding schema, moving values that match
into `typed_value` columns and leaving a residual in `value`) and
unshred_variant.rs (reassemble the unshredded binary form).

Row semantics implemented (the spec's table):
  * top level: typed_value non-null -> perfectly shredded row (`value`
    null unless a partially-shredded object residual);
    typed_value null -> `value` holds the variant bytes.
  * object field group {value, typed_value}: typed non-null -> shredded
    field; value non-null -> unshredded field bytes; both null ->
    field MISSING from the object.
  * partially shredded object: top-level `value` is an object holding
    only the fields NOT present in the shredding schema.

The typed_value columns are ordinary device columns: after shredding,
columnar compute (filters, aggregation, variant_get) runs on the TPU
without touching the row-wise bytes.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, List, Optional, Tuple

import numpy as np

from .. import schema as st
from ..core import column as col
from . import encoding as enc
from .array import (VariantColumn, from_parts, variant_struct_dtype)

_MISSING = object()


def _shreds_as(v: Any, dtype: st.DataType) -> bool:
    """Does value v shred into typed_value of `dtype` losslessly?"""
    if isinstance(dtype, st.Int):
        if not dtype.signed or isinstance(v, bool) or not isinstance(v, int):
            return False
        return -(1 << (dtype.bits - 1)) <= v < (1 << (dtype.bits - 1))
    if isinstance(dtype, st.Float):
        if dtype.bits == 64:
            return isinstance(v, float)
        return isinstance(v, enc.VariantFloat)
    if isinstance(dtype, st.Boolean):
        return isinstance(v, bool)
    if isinstance(dtype, st.Utf8):
        return isinstance(v, str)
    if isinstance(dtype, st.Binary):
        return isinstance(v, (bytes, bytearray))
    if isinstance(dtype, st.Date32):
        return isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
    if isinstance(dtype, st.Timestamp):
        if dtype.unit != "us":
            return False
        if not isinstance(v, _dt.datetime):
            return False
        return (v.tzinfo is not None) == (dtype.tz is not None)
    if isinstance(dtype, st.Struct):
        return isinstance(v, dict)
    return False


def _to_storage(v: Any, dtype: st.DataType) -> Any:
    if isinstance(dtype, st.Float) and dtype.bits == 32:
        return v.value
    if isinstance(dtype, st.Timestamp):
        return enc._ts_micros(v)
    if isinstance(dtype, st.Date32):
        return (v - _dt.date(1970, 1, 1)).days
    if isinstance(dtype, st.Binary):
        return bytes(v)
    return v


def _from_storage(v: Any, dtype: st.DataType) -> Any:
    if isinstance(dtype, st.Float) and dtype.bits == 32:
        return enc.VariantFloat(float(v))
    if isinstance(dtype, st.Timestamp):
        base = (_dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                + _dt.timedelta(microseconds=int(v)))
        return base if dtype.tz is not None else base.replace(tzinfo=None)
    if isinstance(dtype, st.Date32):
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
    return v


def _shred_rows(rows: List[Any], dtype: st.DataType, fid) -> Tuple[
        List[Any], List[Optional[bytes]]]:
    """-> (typed storage values with None for shred-miss,
           residual value bytes with None for shredded rows).
    rows entries are _MISSING (field absent), or decoded values."""
    typed: List[Any] = []
    residual: List[Optional[bytes]] = []
    if isinstance(dtype, st.Struct):
        per_field_rows = {f.name: [] for f in dtype.fields}
        top_resid: List[Optional[bytes]] = []
        typed_valid: List[bool] = []
        for v in rows:
            if v is _MISSING or not isinstance(v, dict):
                for f in dtype.fields:
                    per_field_rows[f.name].append(_MISSING)
                typed_valid.append(False)
                top_resid.append(
                    None if v is _MISSING else enc.encode_value(v, fid))
                continue
            typed_valid.append(True)
            extra = {}
            for k, sub in v.items():
                if k not in per_field_rows:
                    extra[k] = sub
            for f in dtype.fields:
                per_field_rows[f.name].append(
                    v[f.name] if f.name in v else _MISSING)
            top_resid.append(
                enc.encode_value(extra, fid) if extra else None)
        children = []
        for f in dtype.fields:
            f_typed, f_resid = _shred_rows(per_field_rows[f.name],
                                           f.dtype, fid)
            children.append(_field_group(f_typed, f_resid, f.dtype))
        tv = col.StructColumn(
            tuple(children),
            _validity_from(typed_valid),
            children[0].length if children else None,
            st.Struct(tuple(
                st.Field(f.name, c.dtype, True)
                for f, c in zip(dtype.fields, children))),
        )
        return tv, top_resid
    # primitive leaf
    for v in rows:
        if v is not _MISSING and _shreds_as(v, dtype):
            typed.append(_to_storage(v, dtype))
            residual.append(None)
        else:
            typed.append(None)
            residual.append(
                None if v is _MISSING else enc.encode_value(v, fid))
    return typed, residual


def _validity_from(flags: List[bool]):
    from ..core import bitmap as bm

    if all(flags):
        return None
    return bm.from_numpy_bools(np.asarray(flags, bool))


def _field_group(typed, residual: List[Optional[bytes]],
                 dtype: st.DataType) -> col.StructColumn:
    """Build the per-field group {value, typed_value} struct."""
    value_col = col.string_view(residual, st.binary)
    if isinstance(dtype, st.Struct):
        tv_col = typed  # already a StructColumn from the recursion
    else:
        tv_col = col.from_pylist(typed, dtype)
    return col.StructColumn(
        (value_col, tv_col), None, value_col.length,
        st.Struct((st.Field("value", st.binary, True),
                   st.Field("typed_value", tv_col.dtype, True))))


def shred_variant(vc: VariantColumn, target: st.DataType) -> VariantColumn:
    """Shred an unshredded VariantColumn to the target typed_value dtype
    (reference shred_variant.rs::shred_variant).  Values that do not
    match the target stay behind in `value` (partial/imperfect
    shredding per the spec)."""
    metas = vc.metadata_bytes()
    vals = vc.value_bytes()
    n = vc.inner.concrete_length()
    from ..core import bitmap as bm

    valid = (bm.to_numpy_bools(vc.inner.validity, n)
             if vc.inner.validity is not None else np.ones(n, bool))
    names_cache = {}
    rows: List[Any] = []
    all_names: set = set()
    for i in range(n):
        if not valid[i] or vals[i] is None:
            rows.append(_MISSING)
            continue
        mb = metas[i] or enc.EMPTY_METADATA
        names = names_cache.get(mb)
        if names is None:
            names = enc.parse_metadata(mb)[0]
            names_cache[mb] = names
        v = enc.decode_value(vals[i], names)
        enc.collect_field_names(v, all_names)
        rows.append(v)
    ordered = sorted(all_names)
    fid = {nm: i for i, nm in enumerate(ordered)}
    meta_out = enc.build_metadata(ordered)

    typed, residual = _shred_rows(rows, target, fid)
    if isinstance(target, st.Struct):
        tv_col: col.Column = typed
    else:
        tv_col = col.from_pylist(typed, target)
    metadata_col = col.string_view([meta_out] * max(n, 1) if n else [],
                                  st.binary)
    value_col = col.string_view(residual, st.binary)
    return from_parts(metadata_col, value_col, tv_col,
                      validity=(None if bool(np.all(valid[:n]))
                                else valid[:n].tolist()))


def unshred_variant(vc: VariantColumn) -> VariantColumn:
    """Reassemble the unshredded binary form (reference
    unshred_variant.rs::unshred_variant): merge typed_value and residual
    `value` bytes back into one variant value buffer per row."""
    n = vc.inner.concrete_length()
    from ..core import bitmap as bm

    valid = (bm.to_numpy_bools(vc.inner.validity, n)
             if vc.inner.validity is not None else np.ones(n, bool))
    metas = vc.metadata_bytes()
    names_cache = {}

    def names_for(i):
        mb = metas[i] or enc.EMPTY_METADATA
        names = names_cache.get(mb)
        if names is None:
            names = enc.parse_metadata(mb)[0]
            names_cache[mb] = names
        return names

    merged = _merge_typed(vc.value, vc.typed_value, n, names_for)
    out_rows: List[Any] = []
    for i in range(n):
        out_rows.append(None if (not valid[i] or merged[i] is _MISSING)
                        else merged[i])
    from .array import variant_array

    va = variant_array(out_rows)
    if not bool(np.all(valid[:n])):
        va = from_parts(va.metadata, va.value,
                        validity=valid[:n].tolist())
    return va


def _merge_typed(value_col: Optional[col.Column],
                 typed_col: Optional[col.Column], n: int,
                 names_for) -> List[Any]:
    """Per row: _MISSING | decoded python value, merging group semantics."""
    from ..core import bitmap as bm

    vals = value_col.to_pylist() if value_col is not None else [None] * n
    if typed_col is None:
        out = []
        for i in range(n):
            if vals[i] is None:
                out.append(_MISSING)
            else:
                out.append(enc.decode_value(vals[i], names_for(i)))
        return out
    t_valid = (bm.to_numpy_bools(typed_col.validity, n)
               if getattr(typed_col, "validity", None) is not None
               else np.ones(n, bool))
    if isinstance(typed_col, col.StructColumn) and all(
            isinstance(f.dtype, st.Struct)
            and [g.name for g in f.dtype.fields] == ["value", "typed_value"]
            for f in typed_col.dtype.fields):
        # object typed_value: children are {value, typed_value} groups
        field_merged = {}
        for f, ch in zip(typed_col.dtype.fields, typed_col.children):
            sub_value, sub_typed = ch.children
            field_merged[f.name] = _merge_typed(sub_value, sub_typed, n,
                                                names_for)
        out = []
        for i in range(n):
            if not t_valid[i]:
                if vals[i] is None:
                    out.append(_MISSING)
                else:
                    out.append(enc.decode_value(vals[i], names_for(i)))
                continue
            obj = {}
            if vals[i] is not None:  # partially shredded residual object
                resid = enc.decode_value(vals[i], names_for(i))
                if isinstance(resid, dict):
                    obj.update(resid)
            for name, rows in field_merged.items():
                if rows[i] is not _MISSING:
                    obj[name] = rows[i]
            out.append(obj)
        return out
    # primitive typed_value leaf
    dtype = typed_col.dtype
    typed_py = typed_col.to_pylist()
    out = []
    for i in range(n):
        if t_valid[i] and typed_py[i] is not None:
            out.append(_from_storage(typed_py[i], dtype))
        elif vals[i] is not None:
            out.append(enc.decode_value(vals[i], names_for(i)))
        else:
            out.append(_MISSING)
    return out
