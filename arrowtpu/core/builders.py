"""Incremental append builders (host-side ingest plane).

Capability mirror of the reference's builder layer
(/root/reference/arrow-array/src/builder/: PrimitiveBuilder
primitive_builder.rs, BooleanBuilder, GenericByteBuilder, and the
interning GenericByteDictionaryBuilder
generic_bytes_dictionary_builder.rs:1111), used by streaming readers
(CSV/JSON chunked ingest) and row-at-a-time producers.

TPU-framework stance: building is HOST work (append-at-a-time has no
vector shape); buffers accumulate in amortized-growth numpy arrays and
`finish()` ships one device column.  Appends are O(1) amortized with no
per-append device traffic — the device sees only the final bulk
constructor, exactly like the reference's builders handing a completed
ArrayData to the kernels.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import schema as st
from . import bitmap as bm
from . import column as col


class _Bits:
    """Append-only validity accumulator."""

    def __init__(self):
        self.bools: List[bool] = []
        self.any_null = False

    def append(self, valid: bool):
        self.bools.append(valid)
        self.any_null |= not valid

    def finish(self) -> Optional[np.ndarray]:
        if not self.any_null:
            return None
        return np.array(self.bools, dtype=bool)


class PrimitiveBuilder:
    """reference primitive_builder.rs PrimitiveBuilder<T>."""

    def __init__(self, dtype: st.DataType, capacity: int = 1024):
        self.dtype = dtype
        self._np_dtype = self._storage_dtype(dtype)
        self._buf = np.zeros(max(capacity, 16), self._np_dtype)
        self._n = 0
        self._valid = _Bits()

    @staticmethod
    def _storage_dtype(dt: st.DataType):
        if st.wide_kind(dt) is not None:
            return {"i64": np.int64, "u64": np.uint64,
                    "f64": np.float64}[st.wide_kind(dt)]
        return np.dtype(dt.to_jnp())

    def _grow(self):
        if self._n == len(self._buf):
            self._buf = np.concatenate(
                [self._buf, np.zeros(len(self._buf), self._np_dtype)])

    def append(self, value):
        self._grow()
        self._buf[self._n] = value
        self._n += 1
        self._valid.append(True)

    def append_null(self):
        self._grow()
        self._buf[self._n] = 0
        self._n += 1
        self._valid.append(False)

    def append_option(self, value):
        if value is None:
            self.append_null()
        else:
            self.append(value)

    def extend(self, values):
        for v in values:
            self.append_option(v)

    def __len__(self):
        return self._n

    def finish(self) -> col.PrimitiveColumn:
        vals = self._buf[: self._n]
        ok = self._valid.finish()
        validity = bm.from_numpy_bools(ok) if ok is not None else None
        out = col.primitive(
            np.where(ok, vals, np.zeros(1, self._np_dtype))
            if ok is not None else vals,
            self.dtype, validity=validity, length=self._n)
        self.__init__(self.dtype)
        return out


class BooleanBuilder:
    def __init__(self):
        self._vals: List[bool] = []
        self._valid = _Bits()

    def append(self, value: bool):
        self._vals.append(bool(value))
        self._valid.append(True)

    def append_null(self):
        self._vals.append(False)
        self._valid.append(False)

    def append_option(self, value):
        (self.append_null() if value is None else self.append(value))

    def __len__(self):
        return len(self._vals)

    def finish(self) -> col.BooleanColumn:
        ok = self._valid.finish()
        out = col.boolean(
            np.array(self._vals, bool),
            validity=bm.from_numpy_bools(ok) if ok is not None else None,
            length=len(self._vals))
        self.__init__()
        return out


class StringBuilder:
    """reference GenericByteBuilder (generic_bytes_builder.rs)."""

    def __init__(self, dtype: st.DataType = st.utf8):
        self.dtype = dtype
        self._vals: List[Optional[object]] = []

    def append(self, value):
        self._vals.append(value)

    def append_null(self):
        self._vals.append(None)

    append_option = append

    def __len__(self):
        return len(self._vals)

    def finish(self) -> col.StringViewColumn:
        out = col.from_pylist(self._vals, self.dtype)
        self.__init__(self.dtype)
        return out


class StringDictionaryBuilder:
    """Interning dictionary builder (reference
    generic_bytes_dictionary_builder.rs:1111): values hash-intern into a
    growing dictionary; appends of seen values are O(1) key pushes."""

    def __init__(self, key_dtype: st.DataType = st.int32,
                 value_dtype: st.DataType = st.utf8):
        self.dtype = st.Dictionary(key_dtype, value_dtype)
        self._intern: Dict[object, int] = {}
        self._values: List[object] = []
        self._keys: List[int] = []
        self._valid = _Bits()

    def append(self, value):
        k = self._intern.get(value)
        if k is None:
            k = self._intern[value] = len(self._values)
            self._values.append(value)
        self._keys.append(k)
        self._valid.append(True)

    def append_null(self):
        self._keys.append(0)
        self._valid.append(False)

    def append_option(self, value):
        (self.append_null() if value is None else self.append(value))

    def __len__(self):
        return len(self._keys)

    @property
    def dictionary_size(self) -> int:
        return len(self._values)

    def finish(self) -> col.DictionaryColumn:
        import jax.numpy as jnp

        values = col.string_view(self._values or [""],
                                 dtype=self.dtype.value)
        ok = self._valid.finish()
        keys = col.primitive(
            np.array(self._keys, np.int32), st.int32,
            validity=bm.from_numpy_bools(ok) if ok is not None else None,
            length=len(self._keys))
        # ranks for sortability (dictionary_encode_host invariant)
        order = np.argsort(np.array(self._values or [""], dtype=object))
        ranks = np.zeros(values.capacity, np.int32)
        ranks_dense = np.empty(len(order), np.int32)
        ranks_dense[order] = np.arange(len(order), dtype=np.int32)
        ranks[: len(order)] = ranks_dense
        out = col.DictionaryColumn(keys, values, jnp.asarray(ranks),
                                   self.dtype)
        self.__init__(self.dtype.key, self.dtype.value)
        return out


class RecordBatchBuilder:
    """Row-at-a-time batch assembly over per-field builders."""

    def __init__(self, schema: st.Schema):
        self.schema = schema
        self._builders = []
        for f in schema.fields:
            if isinstance(f.dtype, st.Boolean):
                self._builders.append(BooleanBuilder())
            elif isinstance(f.dtype, (st.Utf8, st.Binary)):
                self._builders.append(StringBuilder(f.dtype))
            elif isinstance(f.dtype, st.Dictionary):
                self._builders.append(
                    StringDictionaryBuilder(f.dtype.key, f.dtype.value))
            else:
                self._builders.append(PrimitiveBuilder(f.dtype))

    def append_row(self, row: dict):
        for f, b in zip(self.schema.fields, self._builders):
            b.append_option(row.get(f.name))

    def __len__(self):
        return len(self._builders[0]) if self._builders else 0

    def finish(self):
        from . import batch as bt

        cols = tuple(b.finish() for b in self._builders)
        from ..interop.pyarrow_bridge import _equalize

        return bt.RecordBatch(self.schema, _equalize(cols))
