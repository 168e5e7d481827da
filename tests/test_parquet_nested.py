"""Nested parquet (Dremel def/rep levels): round-trips + pyarrow interop.

Reference behavior: parquet/src/arrow/arrow_writer/levels.rs (shredding),
parquet/src/arrow/record_reader/ (assembly), schema/complex.rs (LIST/MAP
groups)."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.core import column as cc
from arrowtpu.formats.parquet import read_parquet, write_parquet


def rt(batch):
    """our writer -> our reader"""
    return read_parquet(io.BytesIO(write_parquet([batch])))


def rt_pyarrow_reads(batch):
    """our writer -> pyarrow reader"""
    data = write_parquet([batch])
    return pq.read_table(io.BytesIO(data))


def rt_pyarrow_writes(table):
    """pyarrow writer -> our reader"""
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="NONE", use_dictionary=False)
    return read_parquet(io.BytesIO(buf.getvalue()))


class TestListRoundTrip:
    def test_list_int_roundtrip(self, rng):
        data = [[1, 2, 3], [], None, [4], [5, None, 7], None, []]
        b = at.record_batch({"l": cc.list_view(data)})
        out = rt(b)
        assert out.to_pydict()["l"] == data

    def test_list_random_fuzz(self, rng):
        data = []
        for _ in range(200):
            roll = rng.random()
            if roll < 0.1:
                data.append(None)
            elif roll < 0.2:
                data.append([])
            else:
                data.append([
                    None if rng.random() < 0.15 else int(x)
                    for x in rng.integers(-100, 100, rng.integers(1, 8))
                ])
        b = at.record_batch({"l": cc.list_view(data)})
        assert rt(b).to_pydict()["l"] == data

    def test_list_strings(self):
        data = [["a", "bb"], None, [], ["ccc", None, "a-long-string-over-twelve"]]
        b = at.record_batch({"l": cc.list_view(data, st.List(st.utf8))})
        assert rt(b).to_pydict()["l"] == data

    def test_pyarrow_reads_our_lists(self):
        data = [[1, 2], [], None, [3, None]]
        b = at.record_batch({"l": cc.list_view(data)})
        t = rt_pyarrow_reads(b)
        assert t.column("l").to_pylist() == data

    def test_we_read_pyarrow_lists(self):
        data = [[1, 2], [], None, [3, None], [9, 9, 9]]
        t = pa.table({"l": pa.array(data, pa.list_(pa.int64()))})
        out = rt_pyarrow_writes(t)
        assert out.to_pydict()["l"] == data


class TestStructRoundTrip:
    def test_struct_roundtrip(self):
        data = [{"x": 1, "y": "a"}, None, {"x": None, "y": "b"}, {"x": 3, "y": None}]
        b = at.record_batch({"s": cc.from_pylist(
            data, st.Struct((st.Field("x", st.int64), st.Field("y", st.utf8))))})
        assert rt(b).to_pydict()["s"] == data

    def test_pyarrow_reads_our_structs(self):
        data = [{"x": 1, "y": "a"}, None, {"x": 2, "y": None}]
        b = at.record_batch({"s": cc.from_pylist(
            data, st.Struct((st.Field("x", st.int64), st.Field("y", st.utf8))))})
        t = rt_pyarrow_reads(b)
        assert t.column("s").to_pylist() == data

    def test_we_read_pyarrow_structs(self):
        data = [{"x": 1, "y": "a"}, None, {"x": None, "y": "c"}]
        t = pa.table({"s": pa.array(
            data, pa.struct([("x", pa.int64()), ("y", pa.string())]))})
        out = rt_pyarrow_writes(t)
        assert out.to_pydict()["s"] == data


class TestDeepNesting:
    def test_list_of_struct(self):
        dt = st.List(st.Struct((st.Field("a", st.int64), st.Field("b", st.utf8))))
        data = [[{"a": 1, "b": "x"}, {"a": None, "b": "y"}], None, [],
                [{"a": 3, "b": None}]]
        b = at.record_batch({"ls": cc.from_pylist(data, dt)})
        assert rt(b).to_pydict()["ls"] == data

    def test_struct_of_list(self):
        dt = st.Struct((st.Field("v", st.List(st.int64)), st.Field("n", st.int32)))
        data = [{"v": [1, 2], "n": 5}, None, {"v": None, "n": 7},
                {"v": [], "n": None}]
        b = at.record_batch({"sl": cc.from_pylist(data, dt)})
        assert rt(b).to_pydict()["sl"] == data

    def test_list_of_list(self):
        dt = st.List(st.List(st.int64))
        data = [[[1], [2, 3]], None, [[]], [], [[None, 4], None]]
        b = at.record_batch({"ll": cc.from_pylist(data, dt)})
        assert rt(b).to_pydict()["ll"] == data

    def test_we_read_pyarrow_list_of_struct(self):
        data = [[{"a": 1}, {"a": 2}], None, [], [{"a": None}]]
        t = pa.table({"x": pa.array(
            data, pa.list_(pa.struct([("a", pa.int64())])))})
        out = rt_pyarrow_writes(t)
        assert out.to_pydict()["x"] == data


class TestMapRoundTrip:
    def test_map_roundtrip(self):
        data = [[("k1", 1), ("k2", 2)], None, [], [("k3", None)]]
        b = at.record_batch({"m": cc.list_view(data, st.Map(st.utf8, st.int64))})
        assert rt(b).to_pydict()["m"] == data

    def test_pyarrow_reads_our_maps(self):
        data = [[("k1", 1)], None, [("a", 2), ("b", 3)]]
        b = at.record_batch({"m": cc.list_view(data, st.Map(st.utf8, st.int64))})
        t = rt_pyarrow_reads(b)
        assert t.column("m").to_pylist() == data


class TestMixedBatch:
    def test_flat_and_nested_together(self, rng):
        b = at.record_batch({
            "i": [1, 2, None, 4],
            "l": cc.list_view([[1], None, [2, 3], []]),
            "s": at.string_view(["a", None, "b", "c"]),
        })
        out = rt(b)
        assert out.to_pydict() == b.to_pydict()

    def test_projection_of_nested(self):
        b = at.record_batch({
            "i": [1, 2, 3],
            "l": cc.list_view([[1], [2], [3, 4]]),
        })
        data = write_parquet([b])
        out = read_parquet(io.BytesIO(data), columns=["l"])
        assert out.to_pydict() == {"l": [[1], [2], [3, 4]]}
