"""Arrow JSON integration-test ("archery") format
(reference arrow-integration-test/src/lib.rs:65; round-3 verdict
missing #2).  Round-trip equality across every implemented dtype, plus
the CLI verbs mirroring arrow-json-integration-test."""

import decimal as D
import json

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import integration as ig
from arrowtpu import schema as st
from arrowtpu.core.column import (dictionary_encode_host, from_pylist,
                                  run_end_from_pylist, union_column)
from arrowtpu.ops.equal import equal_batches


def _all_types_batch():
    cols = {}
    fields = []

    def add(name, c, dtype=None, nullable=True):
        fields.append(st.Field(name, dtype if dtype is not None
                               else c.dtype, nullable))
        cols[name] = c

    add("nul", from_pylist([None, None, None]))
    add("b", from_pylist([True, None, False], st.boolean))
    add("i8", from_pylist([1, None, -3], st.int8))
    add("u16", from_pylist([1, 2, 65535], st.uint16))
    add("i32", from_pylist([1, None, -2**31], st.int32))
    add("i64", from_pylist([2**62, None, -5], st.int64))
    add("u64", from_pylist([2**63 + 1, 2, 3], st.uint64))
    add("f32", from_pylist([1.5, None, -2.25], st.float32))
    add("f64", from_pylist([1e300, None, -0.0], st.float64))
    add("s", from_pylist(["hello", None, "wörld-very-long-beyond-inline"],
                         st.utf8))
    add("bin", from_pylist([b"\x00\xff", None, b"abc"], st.binary))
    add("fsb", from_pylist([b"0123", None, b"abcd"],
                           st.FixedSizeBinary(4)))
    add("d32", from_pylist([D.Decimal("1.23"), None, D.Decimal("-9.99")],
                           st.Decimal32(9, 2)))
    add("d128", from_pylist(
        [D.Decimal("12345678901234567890.12"), None, D.Decimal("-1.00")],
        st.Decimal128(38, 2)))
    add("d256", from_pylist([D.Decimal(10)**70, None, D.Decimal(1)],
                            st.Decimal256(76, 0)))
    add("date32", from_pylist([19000, None, 0], st.Date32()))
    add("date64", from_pylist([1700000000000, None, 0], st.Date64()))
    add("t32", from_pylist([1000, None, 2000], st.Time32("ms")))
    add("t64", from_pylist([10**9, None, 5], st.Time64("us")))
    add("ts", from_pylist([1710054000123456, None, 0],
                          st.Timestamp("us", "America/New_York")))
    add("dur", from_pylist([5, None, -5], st.Duration("ns")))
    add("iv_ym", from_pylist([12, None, -1], st.Interval("year_month")))
    add("iv_dt", from_pylist([(1, 500), None, (-2, 0)],
                             st.Interval("day_time")))
    add("iv_mdn", from_pylist([(1, 2, 3 * 10**10), None, (0, 0, -1)],
                              st.Interval("month_day_nano")))
    add("lst", from_pylist([[1, 2], None, []], st.List(st.int64)))
    add("fsl", from_pylist([[1.0, 2.0], None, [3.0, 4.0]],
                           st.FixedSizeList(st.float64, 2)))
    add("strct", from_pylist(
        [{"x": 1, "y": "a"}, None, {"x": 2, "y": None}],
        st.Struct((st.Field("x", st.int32), st.Field("y", st.utf8)))))
    add("mp", from_pylist([[("k1", 1)], None, [("k2", 2), ("k3", 3)]],
                          st.Map(st.utf8, st.int64)))
    add("dct", dictionary_encode_host(["aa", None, "bb"],
                                      st.Dictionary(st.int32, st.utf8)))
    add("ree", run_end_from_pylist([7, 7, 9], st.int64))
    u_dt = st.Union((st.Field("i", st.int32), st.Field("s", st.utf8)),
                    (0, 1), "dense")
    u = union_column([0, 1, 0],
                     [from_pylist([1, -1], st.int32),
                      from_pylist(["x"], st.utf8)],
                     u_dt, offsets=[0, 0, 1], length=3)
    add("un", u, u_dt)
    return at.RecordBatch(st.Schema(tuple(fields)),
                          tuple(cols[f.name] for f in fields))


def test_roundtrip_all_types():
    b = _all_types_batch()
    doc = json.loads(json.dumps(ig.to_json([b])))  # through real JSON text
    schema2, batches2 = ig.from_json(doc)
    b2 = batches2[0]
    for f, f2 in zip(b.schema.fields, schema2.fields):
        assert f.dtype == f2.dtype, f.name
    for f in b.schema.fields:
        assert b[f.name].to_pylist() == b2[f.name].to_pylist(), f.name


def test_format_shape_conventions():
    """Spot-check the wire conventions the reference parses: 64-bit ints
    as strings, hex binary, VALIDITY as 0/1, offsets present for varlen
    (lib.rs:452 i64-from-string, :662 hex::decode)."""
    b = at.record_batch({
        "i64": from_pylist([2**60, None], st.int64),
        "s": from_pylist(["ab", "cdef"], st.utf8),
        "bin": from_pylist([b"\xde\xad", b""], st.binary),
    })
    doc = ig.to_json([b])
    cols = {c["name"]: c for c in doc["batches"][0]["columns"]}
    assert cols["i64"]["DATA"][0] == str(2**60)
    assert cols["i64"]["VALIDITY"] == [1, 0]
    assert cols["s"]["OFFSET"] == [0, 2, 6]
    assert cols["bin"]["DATA"][0] == "DEAD"


def test_multi_batch_document():
    b1 = at.record_batch({"x": from_pylist([1, 2, None], st.int32)})
    b2 = at.record_batch({"x": from_pylist([4, 5], st.int32)})
    _, got = ig.from_json(ig.to_json([b1, b2]))
    assert got[0]["x"].to_pylist() == [1, 2, None]
    assert got[1]["x"].to_pylist() == [4, 5]


def test_cli_json_integration_roundtrip(tmp_path):
    from arrowtpu import cli

    b = at.record_batch({
        "a": from_pylist([1, None, 3], st.int64),
        "s": from_pylist(["x", "y", None], st.utf8),
    })
    jpath = str(tmp_path / "t.json")
    apath = str(tmp_path / "t.arrow")
    ig.write_json_file([b], jpath)
    cli.main(["json-integration", "--mode", "JSON_TO_ARROW",
              "--json", jpath, "--arrow", apath])
    cli.main(["json-integration", "--mode", "VALIDATE",
              "--json", jpath, "--arrow", apath])
    j2 = str(tmp_path / "t2.json")
    cli.main(["json-integration", "--mode", "ARROW_TO_JSON",
              "--json", j2, "--arrow", apath])
    _, got = ig.read_json_file(j2)
    assert bool(equal_batches(got[0], b))
