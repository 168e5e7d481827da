"""JSON <-> Variant bridge.

Capability mirror of the reference's parquet-variant-json crate
(/root/reference/parquet-variant-json/src/to_json.rs `variant_to_json`
/ from_json.rs `json_to_variant`) and
parquet-variant-compute/src/{to_json,from_json}.rs (the batch forms).

Formatting matches the reference's to_json rules: temporal values as
RFC 3339 strings, decimals as plain numbers, binary as base64, UUID as
the canonical hyphenated string.
"""

from __future__ import annotations

import base64
import datetime as _dt
import decimal as _dec
import json as _json
import uuid as _uuid
from typing import Any, List, Optional

from .. import schema as st
from . import encoding as enc
from .array import VariantColumn, variant_array


def _jsonable(v: Any) -> Any:
    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, enc.VariantFloat):
        return v.value
    if isinstance(v, _dec.Decimal):
        # plain number, no exponent notation (to_json.rs decimal path)
        return float(v) if v != v.to_integral_value() else int(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.time):
        return v.isoformat()
    if isinstance(v, enc.VariantTsNanos):
        base = (_dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                + _dt.timedelta(microseconds=v.nanos / 1000))
        if not v.utc:
            base = base.replace(tzinfo=None)
        return base.isoformat()
    if isinstance(v, _uuid.UUID):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, dict):
        return {k: _jsonable(sub) for k, sub in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(sub) for sub in v]
    raise st.ArrowTpuError(f"variant_to_json: {type(v).__name__}")


def variant_to_json(v: Any) -> str:
    """One decoded variant value -> JSON text (to_json.rs)."""
    return _json.dumps(_jsonable(v), separators=(",", ":"))


def json_to_variant(text: str) -> Any:
    """JSON text -> a Python value encodable as a variant (from_json.rs:
    numbers parse to the narrowest int or double, objects/arrays nest).
    Top-level JSON `null` maps to the explicit Variant::Null value."""
    v = _json.loads(text)
    return enc.VARIANT_NULL if v is None else v


def batch_variant_to_json(vc: VariantColumn) -> List[Optional[str]]:
    """VariantColumn -> JSON strings (parquet-variant-compute
    to_json.rs::batch_variant_to_json_string): null ROWS stay None,
    Variant::Null VALUES render as the text "null"."""
    import numpy as np

    from ..core import bitmap as bm

    n = vc.inner.concrete_length()
    valid = (bm.to_numpy_bools(vc.inner.validity, n)
             if vc.inner.validity is not None else np.ones(n, bool))
    vals = vc.to_pylist()
    return [variant_to_json(vals[i]) if valid[i] else None
            for i in range(n)]


def batch_json_to_variant(texts: List[Optional[str]]) -> VariantColumn:
    """JSON strings -> VariantColumn (from_json.rs::batch_json_to_variant)."""
    return variant_array(
        [None if t is None else json_to_variant(t) for t in texts])
