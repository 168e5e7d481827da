"""Streaming accessors (reference arrow-array/src/iterator.rs) and the
row-wise Parquet record API (reference parquet/src/record/)."""

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.core import accessor as ac
from arrowtpu.core import batch as bt
from arrowtpu.core import column as col
from arrowtpu.formats import parquet as apq
from arrowtpu.formats import parquet_record as pr


class TestAccessor:
    def test_primitive_windows(self):
        n = 10000
        vals = np.arange(n, dtype=np.int64)
        c = at.primitive(vals, at.schema.int64, length=n)
        acc = ac.ArrayAccessor(c, window=128)
        assert len(acc) == n
        assert acc.value(0) == 0
        assert acc.value(9999) == 9999
        assert acc.value(130) == 130  # crosses into second window
        with pytest.raises(IndexError):
            acc.value(n)

    def test_iter_matches_to_pylist(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(-100, 100, 5000)
        ok = rng.random(5000) > 0.2
        c = at.primitive(vals, at.schema.int64,
                         validity=at.bitmap.from_numpy_bools(ok),
                         length=5000)
        assert list(ac.iter_column(c, window=700)) == c.to_pylist()

    def test_strings_and_dict(self):
        strs = ["short", None, "a-much-longer-string-beyond-inline",
                ""] * 300
        c = col.string_view(strs, st.utf8)
        assert list(ac.iter_column(c, window=64)) == strs
        d = col.dictionary_encode_host(["b", "a", "b", None, "a"],
                                       st.Dictionary(st.int32, st.utf8))
        assert list(ac.iter_column(d)) == ["b", "a", "b", None, "a"]

    def test_nested(self):
        lists = [[1, 2], None, [], [3]] * 100
        c = col.list_view(lists, st.List(st.int64))
        assert list(ac.iter_column(c, window=32)) == lists
        s = col.struct_column([{"x": 1, "y": "a"}, None, {"x": 2, "y": None}])
        assert list(ac.iter_column(s)) == [
            {"x": 1, "y": "a"}, None, {"x": 2, "y": None}]

    def test_iter_rows(self):
        b = at.record_batch({"a": [1, 2, None], "b": ["x", None, "z"]})
        assert list(ac.iter_rows(b)) == [
            {"a": 1, "b": "x"}, {"a": 2, "b": None}, {"a": None, "b": "z"}]


class TestRecordApi:
    def _file(self):
        b = at.record_batch({
            "id": [1, 2, None],
            "name": ["ada", None, "carol"],
            "score": [1.5, 2.5, 3.5],
        })
        return apq.write_parquet(b)

    def test_row_iter_and_getters(self):
        rows = pr.read_rows(self._file())
        assert len(rows) == 3
        r = rows[0]
        assert r.get_int("id") == 1
        assert r.get_string("name") == "ada"
        assert r.get_double("score") == 1.5
        assert rows[2].get_int("id") is None
        with pytest.raises(st.ArrowTpuError):
            r.get_string("id")
        with pytest.raises(st.ArrowTpuError):
            r.get_int("missing")

    def test_projection(self):
        rows = pr.read_rows(self._file(), columns=["name"])
        assert rows[0].into_columns() == [("name", "ada")]

    def test_to_json(self):
        rows = pr.read_rows(self._file())
        assert rows[1].to_json_value() == {
            "id": 2, "name": None, "score": 2.5}

    def test_nested_group(self):
        s = st.Schema((
            st.Field("g", st.Struct((st.Field("x", st.int64),))),
            st.Field("l", st.List(st.int64)),
        ))
        b = bt.RecordBatch(s, (
            col.struct_column([{"x": 7}, None]),
            col.list_view([[1, 2], []], st.List(st.int64)),
        ))
        rows = pr.read_rows(apq.write_parquet(b))
        assert rows[0].get_group("g").get_int("x") == 7
        assert rows[0].get_list("l") == [1, 2]
        assert rows[1].get_group("g") is None

    def test_write_rows(self):
        schema = st.Schema((st.Field("a", st.int64),
                            st.Field("b", st.utf8)))
        rows = [pr.Row([("a", 1), ("b", "x")]),
                pr.Row([("a", None), ("b", "y")])]
        data = pr.write_rows(rows, schema)
        back = pr.read_rows(data)
        assert back == rows
