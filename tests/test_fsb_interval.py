"""FixedSizeBinary + Interval columns: storage, movement, sort keys,
pyarrow round trips (reference arrow-array/src/array/
fixed_size_binary_array.rs, arrow-buffer/src/interval.rs; round-2
verdict missing-#8: the dtypes parsed but had no storage)."""

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import ops, schema as st
from arrowtpu.core import column as cc

pa = pytest.importorskip("pyarrow")


def test_fsb_construct_and_movement():
    vals = [b"abcd", None, b"zzzz", b"aaaa"]
    c = at.from_pylist(vals, st.FixedSizeBinary(4))
    assert c.to_pylist() == vals
    mask = cc.boolean([True, True, False, True] + [False] * 124)
    out = ops.filter_(c, mask)
    assert out.to_pylist() == [b"abcd", None, b"aaaa"]
    cat = ops.concat([c, c])
    assert cat.to_pylist() == vals + vals


def test_fsb_unaligned_width():
    vals = [b"abcde", b"vwxyz", None]
    c = at.from_pylist(vals, st.FixedSizeBinary(5))
    assert c.to_pylist() == vals


def test_fsb_sort_keys():
    vals = [b"bb", b"aa", None, b"ab"]
    c = at.from_pylist(vals, st.FixedSizeBinary(2))
    idx = ops.sort_to_indices(c)
    got = [vals[i] for i in np.asarray(idx.values)[:4]]
    assert got == [None, b"aa", b"ab", b"bb"]


def test_fsb_pyarrow_roundtrip():
    from arrowtpu.interop import pyarrow_bridge as br

    vals = [b"abcde", None, b"zzzzz"]
    c = at.from_pylist(vals, st.FixedSizeBinary(5))
    arr = br._primitive_to_pa(c)
    assert arr.type == pa.binary(5)
    assert arr.to_pylist() == vals
    back = br.column_from_pa(arr)
    assert back.to_pylist() == vals
    assert back.dtype == st.FixedSizeBinary(5)


@pytest.mark.parametrize("unit,vals", [
    ("year_month", [12, None, -3]),
    ("day_time", [(1, 500), None, (-2, 0)]),
    ("month_day_nano", [(1, 2, 3_000_000_000), None, (-1, 0, -7)]),
])
def test_interval_roundtrip(unit, vals):
    c = at.from_pylist(vals, st.Interval(unit))
    assert c.to_pylist() == vals
    mask = cc.boolean([True, False, True] + [False] * 125)
    out = ops.filter_(c, mask)
    assert out.to_pylist() == [vals[0], vals[2]]


def test_interval_pyarrow_roundtrip():
    from arrowtpu.interop import pyarrow_bridge as br

    vals = [(1, 2, 3), None, (-1, -2, -3)]
    c = at.from_pylist(vals, st.Interval("month_day_nano"))
    arr = br._primitive_to_pa(c)
    got = [None if v is None else (v.months, v.days, v.nanoseconds)
           for v in arr.to_pylist()]
    assert got == vals
    back = br.column_from_pa(arr)
    assert back.to_pylist() == vals
