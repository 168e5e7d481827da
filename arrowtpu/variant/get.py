"""variant_get: path extraction from a VariantColumn.

Capability mirror of the reference's
parquet-variant-compute/src/variant_get.rs (`variant_get` +
`GetOptions { path, as_type }`; shredded path stepping
variant_get.rs:38 ShreddedPathStep) and parquet-variant/src/path.rs
(VariantPath: object field names and list indices).

TPU-first behavior: when the requested path is fully shredded
(typed_value struct fields all the way down), extraction is PURE
COLUMNAR — the result column is the existing device column (plus
validity intersection), and no variant bytes are touched.  Only rows
whose path falls back to the residual `value` bytes are decoded on the
host, mirroring the reference's row builder fallback.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import numpy as np

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col
from . import encoding as enc
from .array import VariantColumn, from_parts
from .shred import _MISSING, _merge_typed, _from_storage, _shreds_as, \
    _to_storage

PathElement = Union[str, int]


def _is_group(dtype: st.DataType) -> bool:
    return (isinstance(dtype, st.Struct)
            and [f.name for f in dtype.fields] == ["value", "typed_value"])


def _shredded_step(typed: Optional[col.Column], elem: PathElement):
    """One path step through the shredded representation: returns the
    child {value, typed_value} group column, or None when the step is
    not shredded (caller falls back to bytes)."""
    if typed is None or not isinstance(elem, str):
        return None
    if not isinstance(typed, col.StructColumn):
        return None
    if not all(_is_group(f.dtype) for f in typed.dtype.fields):
        return None
    for f, ch in zip(typed.dtype.fields, typed.children):
        if f.name == elem:
            return ch
    return "missing"  # field not in shredding schema -> check residual


def variant_get(vc: VariantColumn, path: Sequence[PathElement],
                as_dtype: Optional[st.DataType] = None):
    """Extract `path` from every row.

    as_dtype=None -> VariantColumn of the sub-values (missing -> null).
    as_dtype=T    -> typed Column (values not losslessly representable
                     as T become null, the reference's safe cast mode).
    """
    n = vc.inner.concrete_length()
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

    # walk the shredded representation as far as it goes
    value_col: Optional[col.Column] = vc.value
    typed_col: Optional[col.Column] = vc.typed_value
    consumed = 0
    shred_missing = False
    for elem in path:
        step = _shredded_step(typed_col, elem)
        if step is None:
            break
        if step == "missing":
            shred_missing = True
            break
        value_col, typed_col = step.children
        consumed += 1

    # columnar fast path: path fully shredded to a primitive typed_value
    # with an all-null residual -> the device column IS the answer
    if (consumed == len(path) and typed_col is not None
            and not isinstance(typed_col, col.StructColumn)
            and as_dtype is not None and typed_col.dtype == as_dtype
            and value_col is not None and _all_null(value_col, n)):
        return _mask_validity(typed_col, valid, n)

    rows = _merge_typed(value_col, typed_col, n, names_for)
    remaining = () if shred_missing else tuple(path[consumed:])
    out: List[Any] = []
    for i in range(n):
        v = rows[i]
        if not valid[i] or v is _MISSING:
            out.append(_MISSING)
            continue
        if shred_missing:
            # residual object may still hold the field
            v = v.get(path[consumed], _MISSING) if isinstance(v, dict) \
                else _MISSING
            if v is not _MISSING:
                for elem in path[consumed + 1:]:
                    v = _step_py(v, elem)
                    if v is _MISSING:
                        break
        else:
            for elem in remaining:
                v = _step_py(v, elem)
                if v is _MISSING:
                    break
        out.append(v)

    if as_dtype is None:
        from .array import variant_array

        return variant_array([None if v is _MISSING else v for v in out])
    typed_out = [
        _to_storage(v, as_dtype)
        if v is not _MISSING and _shreds_as(v, as_dtype) else None
        for v in out
    ]
    return col.from_pylist(typed_out, as_dtype)


def _step_py(v: Any, elem: PathElement) -> Any:
    if isinstance(elem, str):
        if isinstance(v, dict) and elem in v:
            return v[elem]
        return _MISSING
    if isinstance(v, list) and 0 <= elem < len(v):
        return v[elem]
    return _MISSING


def _all_null(c: col.Column, n: int) -> bool:
    if getattr(c, "validity", None) is None:
        return n == 0
    return not bm.to_numpy_bools(c.validity, n).any()


def _mask_validity(c: col.Column, valid: np.ndarray, n: int) -> col.Column:
    import dataclasses

    if bool(np.all(valid[:n])):
        return c
    own = (bm.to_numpy_bools(c.validity, n)
           if c.validity is not None else np.ones(n, bool))
    return dataclasses.replace(
        c, validity=bm.from_numpy_bools(own & valid[:n]))
