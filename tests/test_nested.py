"""Nested types (List/Struct/FixedSizeList/Map): builders, selection
kernels, pyarrow round-trips (reference test model:
/root/reference/arrow-array/src/array/{list_view,struct,fixed_size_list,
map}_array.rs inline tests + arrow-select nested paths)."""

import numpy as np
import pyarrow as pa
import pytest

import arrowtpu as at
from arrowtpu import ops
from arrowtpu import schema as st
from arrowtpu.interop import from_pyarrow, to_pyarrow

LISTS = [[1, 2, 3], [], None, [4, None], [5], [6, 7, 8, 9, 10]]
STRUCTS = [
    {"x": 1, "y": "a"},
    None,
    {"x": None, "y": "bb"},
    {"x": 3, "y": None},
]


def test_list_builder_roundtrip():
    c = at.list_view(LISTS)
    assert c.to_pylist() == LISTS
    assert isinstance(c.dtype, st.List)


def test_struct_builder_roundtrip():
    c = at.struct_column(STRUCTS)
    assert c.to_pylist() == STRUCTS


def test_fixed_size_list_builder():
    data = [[1, 2], None, [3, 4], [5, None]]
    c = at.fixed_size_list(data)
    assert c.dtype.size == 2
    assert c.to_pylist() == data


def test_list_from_pyarrow():
    arr = pa.array(LISTS, type=pa.list_(pa.int64()))
    c = from_pyarrow(arr)
    assert c.to_pylist() == LISTS
    back = to_pyarrow(c)
    assert back.to_pylist() == arr.to_pylist()


def test_large_list_from_pyarrow():
    arr = pa.array([[1], None, [2, 3]], type=pa.large_list(pa.int64()))
    assert from_pyarrow(arr).to_pylist() == [[1], None, [2, 3]]


def test_list_of_strings_roundtrip():
    data = [["a", "bb"], None, ["a long string that goes to the arena", None], []]
    arr = pa.array(data)
    c = from_pyarrow(arr)
    assert c.to_pylist() == data
    assert to_pyarrow(c).to_pylist() == data


def test_struct_from_pyarrow():
    arr = pa.array(STRUCTS, type=pa.struct({"x": pa.int64(), "y": pa.utf8()}))
    c = from_pyarrow(arr)
    assert c.to_pylist() == STRUCTS
    assert to_pyarrow(c).to_pylist() == arr.to_pylist()


def test_fixed_size_list_from_pyarrow():
    data = [[1, 2, 3], None, [4, 5, 6], [7, None, 9]]
    arr = pa.array(data, type=pa.list_(pa.int64(), 3))
    c = from_pyarrow(arr)
    assert c.to_pylist() == data
    assert to_pyarrow(c).to_pylist() == data


def test_map_roundtrip():
    data = [[("a", 1), ("b", 2)], None, [], [("c", None)]]
    arr = pa.array(data, type=pa.map_(pa.utf8(), pa.int64()))
    c = from_pyarrow(arr)
    assert c.to_pylist() == data
    assert to_pyarrow(c).to_pylist() == arr.to_pylist()


def test_take_list():
    c = at.list_view(LISTS)
    idx = at.from_pylist([5, 0, 2, 0], st.int32)
    out = ops.take(c, idx)
    assert out.to_pylist() == [[6, 7, 8, 9, 10], [1, 2, 3], None, [1, 2, 3]]


def test_take_struct():
    c = at.struct_column(STRUCTS)
    idx = at.from_pylist([3, 1, 0], st.int32)
    out = ops.take(c, idx)
    assert out.to_pylist() == [STRUCTS[3], None, STRUCTS[0]]


def test_take_fixed_size_list():
    data = [[1, 2], None, [3, 4], [5, None]]
    c = at.fixed_size_list(data)
    idx = at.from_pylist([2, 0, 1], st.int32)
    out = ops.take(c, idx)
    assert out.to_pylist() == [[3, 4], [1, 2], None]


def test_filter_nested():
    c = at.list_view(LISTS)
    mask = at.from_pylist([True, False, True, True, False, True], st.boolean)
    out = ops.filter_(c, mask)
    assert out.to_pylist() == [[1, 2, 3], None, [4, None], [6, 7, 8, 9, 10]]

    s = at.struct_column(STRUCTS)
    mask = at.from_pylist([True, True, False, True], st.boolean)
    assert ops.filter_(s, mask).to_pylist() == [STRUCTS[0], None, STRUCTS[3]]

    f = at.fixed_size_list([[1, 2], None, [3, 4]])
    mask = at.from_pylist([False, True, True], st.boolean)
    assert ops.filter_(f, mask).to_pylist() == [None, [3, 4]]


def test_concat_lists():
    a = at.list_view([[1], None])
    b = at.list_view([[2, 3], []])
    out = ops.concat([a, b])
    assert out.to_pylist() == [[1], None, [2, 3], []]


def test_concat_structs():
    a = at.struct_column(STRUCTS[:2])
    b = at.struct_column(STRUCTS[2:])
    out = ops.concat([a, b])
    assert out.to_pylist() == STRUCTS


def test_concat_fixed_size_lists():
    a = at.fixed_size_list([[1, 2], None])
    b = at.fixed_size_list([[3, 4]], st.FixedSizeList(st.int64, 2))
    out = ops.concat([a, b])
    assert out.to_pylist() == [[1, 2], None, [3, 4]]


def test_nested_list_of_list():
    data = [[[1, 2], [3]], None, [[], [4, None]]]
    c = at.list_view(data)
    assert c.to_pylist() == data
    arr = pa.array(data, type=pa.list_(pa.list_(pa.int64())))
    c2 = from_pyarrow(arr)
    assert c2.to_pylist() == data
    assert to_pyarrow(c2).to_pylist() == data


def test_struct_of_list_roundtrip():
    data = [{"v": [1, 2], "n": "a"}, None, {"v": None, "n": "b"}]
    arr = pa.array(data, type=pa.struct({"v": pa.list_(pa.int64()), "n": pa.utf8()}))
    c = from_pyarrow(arr)
    assert c.to_pylist() == data
    assert to_pyarrow(c).to_pylist() == data


def test_take_under_jit():
    import jax

    c = at.list_view(LISTS)
    idx = at.from_pylist([1, 5], st.int32)
    out = jax.jit(ops.take)(c, idx)
    assert out.to_pylist() == [[], [6, 7, 8, 9, 10]]


def test_cast_list_element():
    c = at.list_view(LISTS, st.List(st.int64))
    out = ops.cast(c, st.List(st.int32))
    assert out.to_pylist() == LISTS
    assert out.dtype == st.List(st.int32)


def test_record_batch_with_nested():
    b = at.record_batch({"l": at.list_view(LISTS[:4]), "i": [1, 2, 3, 4]})
    mask = at.from_pylist([True, False, True, False], st.boolean)
    out = ops.filter_record_batch(b, mask)
    assert out.to_pydict() == {"l": [[1, 2, 3], None], "i": [1, 3]}
