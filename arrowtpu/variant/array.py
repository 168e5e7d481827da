"""VariantColumn: the arrow representation of a variant column.

Capability mirror of the reference's parquet-variant-compute crate
(/root/reference/parquet-variant-compute/src/variant_array.rs:262
`VariantArray` — a StructArray with `metadata: Binary`, optional
`value: Binary`, optional `typed_value: T`, carrying the
`arrow.parquet.variant` canonical extension; shredding states
variant_array.rs ShreddingState).  TPU-first design: the binary
metadata/value buffers are host-resident row-wise byte strings (exactly
as in the reference), while the SHREDDED `typed_value` columns are
ordinary device columns — columnar compute happens on the shredded
form, and `variant_get` prefers it without touching the bytes.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from .. import schema as st
from ..core import column as col
from ..core import bitmap as bm
from . import encoding as enc

VARIANT_EXT_NAME = "arrow.parquet.variant"

METADATA_FIELD = "metadata"
VALUE_FIELD = "value"
TYPED_VALUE_FIELD = "typed_value"


def variant_struct_dtype(
        typed_value: Optional[st.DataType] = None) -> st.Struct:
    """The StructArray dtype of a variant column (variant_array.rs:293:
    required `metadata`, optional `value`, optional `typed_value`)."""
    fields = [st.Field(METADATA_FIELD, st.binary, False),
              st.Field(VALUE_FIELD, st.binary, True)]
    if typed_value is not None:
        fields.append(st.Field(TYPED_VALUE_FIELD, typed_value, True))
    return st.Struct(tuple(fields))


def variant_field(name: str, typed_value: Optional[st.DataType] = None,
                  nullable: bool = True) -> st.Field:
    """Schema field carrying the arrow.parquet.variant extension
    annotation (variant_array.rs VariantType)."""
    from ..extension import EXTENSION_NAME_KEY

    return st.Field(name, variant_struct_dtype(typed_value), nullable,
                    ((EXTENSION_NAME_KEY, VARIANT_EXT_NAME),))


def is_variant_dtype(dtype: st.DataType) -> bool:
    if not isinstance(dtype, st.Struct):
        return False
    names = [f.name for f in dtype.fields]
    return (names[:1] == [METADATA_FIELD]
            and VALUE_FIELD in names
            and set(names) <= {METADATA_FIELD, VALUE_FIELD,
                               TYPED_VALUE_FIELD})


class VariantColumn:
    """Typed view over the variant StructColumn (reference VariantArray).

    Fields:
      metadata : StringViewColumn (Binary) — per-row metadata buffer
      value    : StringViewColumn (Binary) — per-row variant bytes, may
                 be null when fully shredded
      typed_value : Optional[Column] — shredded representation
    """

    def __init__(self, inner: col.StructColumn):
        if not is_variant_dtype(inner.dtype):
            raise st.SchemaError(
                "VariantColumn requires struct<metadata: binary, value: "
                f"binary[, typed_value]>, got {inner.dtype}")
        self.inner = inner
        names = [f.name for f in inner.dtype.fields]
        self.metadata = inner.children[names.index(METADATA_FIELD)]
        self.value = inner.children[names.index(VALUE_FIELD)]
        self.typed_value = (
            inner.children[names.index(TYPED_VALUE_FIELD)]
            if TYPED_VALUE_FIELD in names else None)

    @property
    def length(self):
        return self.inner.length

    @property
    def capacity(self) -> int:
        return self.inner.capacity

    def metadata_bytes(self) -> List[Optional[bytes]]:
        return self.metadata.to_pylist()

    def value_bytes(self) -> List[Optional[bytes]]:
        return self.value.to_pylist()

    def to_pylist(self) -> List[Any]:
        """Decode every row to Python values (reference
        VariantArray::value + Variant -> owned conversion)."""
        if self.typed_value is not None:
            from .shred import unshred_variant

            return unshred_variant(self).to_pylist()
        metas = self.metadata_bytes()
        vals = self.value_bytes()
        n = self.inner.concrete_length()
        valid = (bm.to_numpy_bools(self.inner.validity, n)
                 if self.inner.validity is not None else np.ones(n, bool))
        out: List[Any] = []
        names_cache = {}
        for i in range(n):
            if not valid[i] or vals[i] is None:
                out.append(None)
                continue
            mb = metas[i] or enc.EMPTY_METADATA
            names = names_cache.get(mb)
            if names is None:
                names = enc.parse_metadata(mb)[0]
                names_cache[mb] = names
            out.append(enc.decode_value(vals[i], names))
        return out


def variant_array(values: Sequence[Any]) -> VariantColumn:
    """Build an unshredded VariantColumn from Python values (reference
    VariantArrayBuilder usage): one shared metadata dictionary, one
    value buffer per row; None -> null row."""
    b = enc.VariantBuilder()
    for v in values:
        b.append(v)
    meta, rows = b.finish()
    n = len(values)
    metadata_col = col.string_view([meta] * max(n, 1), st.binary)
    if n == 0:
        metadata_col = col.string_view([], st.binary)
    value_col = col.string_view(
        [None if v is None else r for v, r in zip(values, rows)], st.binary)
    valid = [v is not None for v in values]  # VARIANT_NULL rows stay valid
    return from_parts(metadata_col, value_col,
                      validity=None if all(valid) else valid)


def from_parts(metadata: col.StringViewColumn,
               value: col.StringViewColumn,
               typed_value: Optional[col.Column] = None,
               validity=None) -> VariantColumn:
    """Assemble from the three columns (reference
    VariantArray::from_parts, variant_array.rs:343)."""
    import jax.numpy as jnp

    tv_dtype = None
    children = [metadata, value]
    if typed_value is not None:
        f = typed_value.dtype
        tv_dtype = f
        children.append(typed_value)
    dtype = variant_struct_dtype(tv_dtype)
    if validity is not None and not isinstance(
            validity, (type(None),)) and not hasattr(validity, "dtype"):
        validity = bm.from_numpy_bools(np.asarray(validity, bool))
    inner = col.StructColumn(tuple(children), validity,
                             metadata.length, dtype)
    return VariantColumn(inner)
