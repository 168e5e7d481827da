"""Arrow C Data Interface round-trips against pyarrow
(reference arrow-array/src/ffi.rs:237 to_ffi/from_ffi tests)."""

import numpy as np
import pyarrow as pa
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.core import column as cc
from arrowtpu.interop.cdata import export_to_pyarrow, import_from_pyarrow


class TestExport:
    def test_int_with_nulls(self):
        c = cc.from_pylist([1, None, 3, -5], st.int64)
        arr = export_to_pyarrow(c)
        assert arr.to_pylist() == [1, None, 3, -5]
        assert arr.type == pa.int64()

    def test_float_and_bool(self):
        cf = cc.from_pylist([1.5, None, -2.25], st.float64)
        cb = cc.from_pylist([True, False, None], st.boolean)
        assert export_to_pyarrow(cf).to_pylist() == [1.5, None, -2.25]
        assert export_to_pyarrow(cb).to_pylist() == [True, False, None]

    def test_strings(self):
        c = at.string_view(["a", None, "long-string-over-twelve-bytes", ""])
        arr = export_to_pyarrow(c)
        assert arr.to_pylist() == ["a", None, "long-string-over-twelve-bytes", ""]

    def test_list(self):
        c = cc.list_view([[1, 2], None, [], [3]])
        arr = export_to_pyarrow(c)
        assert arr.to_pylist() == [[1, 2], None, [], [3]]

    def test_struct(self):
        dt = st.Struct((st.Field("x", st.int64), st.Field("y", st.utf8)))
        c = cc.from_pylist([{"x": 1, "y": "a"}, None], dt)
        arr = export_to_pyarrow(c)
        assert arr.to_pylist() == [{"x": 1, "y": "a"}, None]

    def test_dictionary(self):
        c = at.dictionary_encode_host(["p", "q", None, "p"])
        arr = export_to_pyarrow(c)
        assert arr.to_pylist() == ["p", "q", None, "p"]
        assert pa.types.is_dictionary(arr.type)


class TestImport:
    def test_int_roundtrip(self):
        arr = pa.array([1, None, 3], pa.int64())
        c = import_from_pyarrow(arr)
        assert c.to_pylist() == [1, None, 3]

    def test_string_roundtrip(self):
        arr = pa.array(["xy", None, "a-very-long-string-over-twelve"])
        c = import_from_pyarrow(arr)
        assert c.to_pylist() == ["xy", None, "a-very-long-string-over-twelve"]

    def test_list_roundtrip(self):
        arr = pa.array([[1, 2], None, []], pa.list_(pa.int64()))
        c = import_from_pyarrow(arr)
        assert c.to_pylist() == [[1, 2], None, []]

    def test_struct_roundtrip(self):
        arr = pa.array([{"a": 1, "b": "x"}, None],
                       pa.struct([("a", pa.int64()), ("b", pa.string())]))
        c = import_from_pyarrow(arr)
        assert c.to_pylist() == [{"a": 1, "b": "x"}, None]

    def test_dictionary_roundtrip(self):
        arr = pa.array(["m", "n", "m", None]).dictionary_encode()
        c = import_from_pyarrow(arr)
        assert c.to_pylist() == ["m", "n", "m", None]

    def test_release_called(self):
        """Import must call the producer's release (no leaked C structs)."""
        arr = pa.array([1, 2, 3], pa.int64())
        c = import_from_pyarrow(arr)
        assert c.to_pylist() == [1, 2, 3]  # and no crash on gc

    def test_full_circle(self):
        data = [5, None, -7, 2**60]
        c = cc.from_pylist(data, st.int64)
        back = import_from_pyarrow(export_to_pyarrow(c))
        assert back.to_pylist() == data
