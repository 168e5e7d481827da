"""Format tests: CSV/JSON round-trips + IPC cross-validated against pyarrow
in BOTH directions (reference test model: arrow-ipc round-trip integration
tests, /root/reference/arrow-ipc/tests/, and the archery cross-impl suite
via arrow-integration-test)."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.ipc as paipc
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.formats import csv as acsv
from arrowtpu.formats import ipc as aipc
from arrowtpu.formats import json as ajson
from arrowtpu.interop import from_pyarrow, to_pyarrow


def _mixed_batch():
    return at.record_batch(
        {
            "i": at.from_pylist([1, None, 3, -(2**40)], st.int64),
            "f": at.from_pylist([1.5, 2.0, None, -0.25], st.float64),
            "s": at.from_pylist(["a", None, "a very long string into the arena", ""]),
            "b": at.from_pylist([True, False, None, True], st.boolean),
            "i32": at.from_pylist([1, 2, 3, None], st.int32),
        }
    )


# ------------------------------- CSV ---------------------------------------


def test_csv_roundtrip():
    b = _mixed_batch()
    text = acsv.write_csv(b)
    back = acsv.read_csv(text)
    assert back.to_pydict()["i"] == [1, None, 3, -(2**40)]
    assert back.to_pydict()["b"] == [True, False, None, True]
    # "" in CSV is indistinguishable from null (same as the reference's
    # default null handling), so the empty string reads back as None
    assert back.to_pydict()["s"] == ["a", None, "a very long string into the arena", None]


def test_csv_inference():
    text = "a,b,c,d\n1,1.5,true,x\n2,,false,y\n"
    r = acsv.ReaderBuilder().build(text)
    assert [str(f.dtype) for f in r.schema.fields] == ["int64", "float64", "bool", "utf8"]
    batch = next(r)
    assert batch.to_pydict() == {
        "a": [1, 2], "b": [1.5, None], "c": [True, False], "d": ["x", "y"],
    }


def test_csv_dates():
    text = "d,t\n2020-01-01,2020-01-01T00:00:01\n,\n"
    b = acsv.read_csv(text)
    assert isinstance(b.schema.fields[0].dtype, st.Date32)
    assert isinstance(b.schema.fields[1].dtype, st.Timestamp)


def test_csv_explicit_schema_and_projection():
    text = "x,y\n1,a\n2,b\n"
    s = st.schema([("x", st.int32), ("y", st.utf8)])
    r = acsv.ReaderBuilder(schema=s, projection=["y"]).build(text)
    batch = next(r)
    assert batch.schema.names == ["y"]
    assert batch.to_pydict() == {"y": ["a", "b"]}


def test_csv_batching():
    rows = "\n".join(f"{i}" for i in range(10))
    r = acsv.ReaderBuilder(has_header=False, batch_size=4).build("c\n" * 0 + rows)
    batches = list(r)
    assert [int(b.length) for b in batches] == [4, 4, 2]


# ------------------------------- JSON --------------------------------------


def test_json_roundtrip():
    b = _mixed_batch()
    text = ajson.write_json(b)
    back = ajson.read_json(text)
    d = back.to_pydict()
    assert d["i"] == [1, None, 3, -(2**40)]
    assert d["s"] == ["a", None, "a very long string into the arena", ""]


def test_json_nested():
    recs = '{"a": {"x": 1}, "l": [1, 2]}\n{"a": {"x": 2}, "l": []}\n{"a": null, "l": null}'
    b = ajson.read_json(recs)
    assert b.to_pydict() == {
        "a": [{"x": 1}, {"x": 2}, None],
        "l": [[1, 2], [], None],
    }
    out = ajson.write_json(b)
    again = ajson.read_json(out)
    assert again.to_pydict() == b.to_pydict()


def test_json_array_format():
    text = ajson.write_json(_mixed_batch(), format="array")
    assert text.startswith("[") and text.endswith("]")
    back = ajson.read_json(text)
    assert back.to_pydict()["i"] == [1, None, 3, -(2**40)]


# ------------------------------- IPC ---------------------------------------


def test_ipc_stream_roundtrip_self():
    b = _mixed_batch()
    data = aipc.write_stream(b)
    [back] = aipc.read_stream(data)
    assert back.to_pydict() == b.to_pydict()


def test_ipc_file_roundtrip_self():
    b = _mixed_batch()
    data = aipc.write_file([b, b])
    batches = aipc.read_file(data)
    assert len(batches) == 2
    assert batches[0].to_pydict() == b.to_pydict()


def test_ipc_stream_read_by_pyarrow():
    """Our writer -> pyarrow reader: byte-level format compliance."""
    b = _mixed_batch()
    data = aipc.write_stream(b)
    table = paipc.open_stream(io.BytesIO(data)).read_all()
    assert table.to_pydict() == {k: v for k, v in b.to_pydict().items()}


def test_ipc_file_read_by_pyarrow():
    b = _mixed_batch()
    data = aipc.write_file(b)
    table = paipc.open_file(io.BytesIO(data)).read_all()
    assert table.to_pydict() == b.to_pydict()


def test_ipc_stream_written_by_pyarrow():
    """pyarrow writer -> our reader."""
    pab = pa.record_batch(
        {
            "x": pa.array([1, None, 2], type=pa.int64()),
            "s": pa.array(["aa", "b" * 40, None]),
            "t": pa.array([1, 2, 3], type=pa.timestamp("us")),
        }
    )
    sink = io.BytesIO()
    with paipc.new_stream(sink, pab.schema) as w:
        w.write_batch(pab)
    [back] = aipc.read_stream(sink.getvalue())
    # compare through the bridge: temporal columns then compare as datetimes
    assert to_pyarrow(back).to_pylist() == pab.to_pylist()


def test_ipc_file_written_by_pyarrow():
    pab = pa.record_batch({"x": pa.array([1.5, None], type=pa.float64())})
    sink = io.BytesIO()
    with paipc.new_file(sink, pab.schema) as w:
        w.write_batch(pab)
    [back] = aipc.read_file(sink.getvalue())
    assert back.to_pydict() == pab.to_pydict()


def test_ipc_dictionary_roundtrip():
    d = at.dictionary_encode_host(["a", "b", "a", None, "c"], st.Dictionary(st.int32, st.utf8))
    b = at.record_batch({"d": d})
    data = aipc.write_stream(b)
    [back] = aipc.read_stream(data)
    assert back.to_pydict() == {"d": ["a", "b", "a", None, "c"]}
    # and pyarrow can read it
    table = paipc.open_stream(io.BytesIO(data)).read_all()
    assert table.to_pydict() == {"d": ["a", "b", "a", None, "c"]}


def test_ipc_nested_roundtrip():
    b = at.record_batch(
        {
            "l": at.list_view([[1, 2], None, [3]]),
            "st": at.struct_column([{"x": 1, "y": "a"}, None, {"x": 2, "y": "b"}]),
            "fl": at.fixed_size_list([[1, 2], [3, 4], None]),
        }
    )
    data = aipc.write_stream(b)
    [back] = aipc.read_stream(data)
    assert back.to_pydict() == b.to_pydict()
    table = paipc.open_stream(io.BytesIO(data)).read_all()
    assert table.to_pydict() == b.to_pydict()


def test_ipc_pyarrow_nested_to_us():
    pab = pa.record_batch(
        {
            "l": pa.array([[1, 2], None, []], type=pa.list_(pa.int64())),
            "m": pa.array([[("k", 1)], None, []], type=pa.map_(pa.utf8(), pa.int64())),
        }
    )
    sink = io.BytesIO()
    with paipc.new_stream(sink, pab.schema) as w:
        w.write_batch(pab)
    [back] = aipc.read_stream(sink.getvalue())
    assert back.to_pydict() == pab.to_pydict()


def test_ipc_empty_and_multiple_batches():
    b1 = at.record_batch({"x": [1, 2]})
    b2 = at.record_batch({"x": [3]})
    data = aipc.write_stream([b1, b2])
    backs = aipc.read_stream(data)
    assert [bb.to_pydict() for bb in backs] == [{"x": [1, 2]}, {"x": [3]}]


def test_ipc_temporal_types():
    b = at.record_batch(
        {
            "ts": at.from_pylist([1, None, 10**15], st.Timestamp("ns", "UTC")),
            "d": at.from_pylist([10, None, -5], st.Date32()),
            "dur": at.from_pylist([100, None, 0], st.Duration("ms")),
        }
    )
    data = aipc.write_stream(b)
    [back] = aipc.read_stream(data)
    assert back.schema == b.schema
    assert back.to_pydict() == b.to_pydict()
    table = paipc.open_stream(io.BytesIO(data)).read_all()
    assert table.column("ts").type == pa.timestamp("ns", "UTC")


class TestIpcCompressionAndDeltaDicts:
    """ZSTD body compression (reference arrow-ipc/src/compression.rs:142)
    and delta dictionaries (writer.rs:1330-1362)."""

    def test_zstd_roundtrip_ours(self):
        import io

        from arrowtpu.formats.ipc import read_stream, write_stream

        b = at.record_batch({
            "a": list(range(1000)),
            "s": at.string_view(["word%d" % (i % 7) for i in range(1000)]),
        })
        plain = write_stream([b])
        comp = write_stream([b], compression="zstd")
        assert len(comp) < len(plain)  # actually compressed
        out = read_stream(io.BytesIO(comp))
        assert out[0].to_pydict() == b.to_pydict()

    def test_pyarrow_reads_our_zstd(self):
        import io

        import pyarrow as pa
        import pyarrow.ipc

        from arrowtpu.formats.ipc import write_stream

        b = at.record_batch({"a": [1, 2, None, 4], "s": at.string_view(["x", "yy", None, "zzz"])})
        data = write_stream([b], compression="zstd")
        t = pa.ipc.open_stream(io.BytesIO(data)).read_all()
        assert t.column("a").to_pylist() == [1, 2, None, 4]
        assert t.column("s").to_pylist() == ["x", "yy", None, "zzz"]

    def test_we_read_pyarrow_zstd(self):
        import io

        import pyarrow as pa
        import pyarrow.ipc

        from arrowtpu.formats.ipc import read_stream

        t = pa.table({"a": [1, 2, None], "s": ["aa", None, "b"]})
        sink = io.BytesIO()
        opts = pa.ipc.IpcWriteOptions(compression="zstd")
        with pa.ipc.new_stream(sink, t.schema, options=opts) as w:
            w.write_table(t)
        out = read_stream(io.BytesIO(sink.getvalue()))
        assert out[0].to_pydict() == {"a": [1, 2, None], "s": ["aa", None, "b"]}

    def test_delta_dictionary_stream(self):
        import io

        from arrowtpu.formats.ipc import StreamWriter, read_stream

        d1 = at.dictionary_encode_host(["a", "b", "a"])
        d2len = ["a", "b", "c", "c"]  # grows the dictionary by "c"
        d2 = at.dictionary_encode_host(d2len)
        schema = at.record_batch({"d": d1}).schema
        sink = io.BytesIO()
        w = StreamWriter(sink, schema)
        w.write(at.record_batch({"d": d1}))
        w.write(at.record_batch({"d": d2}))
        w.finish()
        data = sink.getvalue()
        out = read_stream(io.BytesIO(data))
        assert out[0].to_pydict() == {"d": ["a", "b", "a"]}
        assert out[1].to_pydict() == {"d": d2len}

    def test_pyarrow_reads_delta_dict(self):
        import io

        import pyarrow as pa
        import pyarrow.ipc

        from arrowtpu.formats.ipc import StreamWriter

        d1 = at.dictionary_encode_host(["x", "y"])
        d2 = at.dictionary_encode_host(["x", "y", "z"])
        schema = at.record_batch({"d": d1}).schema
        sink = io.BytesIO()
        w = StreamWriter(sink, schema)
        w.write(at.record_batch({"d": d1}))
        w.write(at.record_batch({"d": d2}))
        w.finish()
        rdr = pa.ipc.open_stream(io.BytesIO(sink.getvalue()))
        t1 = rdr.read_next_batch()
        t2 = rdr.read_next_batch()
        assert t1.column("d").to_pylist() == ["x", "y"]
        assert t2.column("d").to_pylist() == ["x", "y", "z"]
