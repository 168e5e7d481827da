"""Parquet tests cross-validated against pyarrow.parquet in both directions
(reference test model: /root/reference/parquet/tests/arrow_reader/ +
arrow_writer round-trip suites)."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.formats import parquet as apq
from arrowtpu.interop import from_pyarrow, to_pyarrow


def _mixed_batch():
    return at.record_batch(
        {
            "i64": at.from_pylist([1, None, -(2**40), 3], st.int64),
            "i32": at.from_pylist([1, 2, None, 4], st.int32),
            "f64": at.from_pylist([1.5, None, -2.25, 1e300], st.float64),
            "f32": at.from_pylist([1.0, 2.0, 3.0, None], st.float32),
            "b": at.from_pylist([True, None, False, True], st.boolean),
            "s": at.from_pylist(["aa", None, "a long string for the arena buffer", "aa"]),
        }
    )


def test_roundtrip_self():
    b = _mixed_batch()
    data = apq.write_parquet(b)
    back = apq.read_parquet(data)
    assert back.to_pydict() == b.to_pydict()


def test_read_by_pyarrow():
    b = _mixed_batch()
    data = apq.write_parquet(b)
    table = pq.read_table(io.BytesIO(data))
    assert table.to_pydict() == b.to_pydict()


def test_written_by_pyarrow():
    t = pa.table(
        {
            "x": pa.array([1, None, 3], type=pa.int64()),
            "s": pa.array(["a", "bb" * 30, None]),
            "f": pa.array([0.5, None, 2.5], type=pa.float64()),
            "b": pa.array([None, True, False]),
        }
    )
    sink = io.BytesIO()
    pq.write_table(t, sink, compression="none")
    back = apq.read_parquet(sink.getvalue())
    assert back.to_pydict() == t.to_pydict()


@pytest.mark.parametrize("compression", ["zstd", "gzip"])
def test_compression_codecs(compression):
    b = _mixed_batch()
    data = apq.write_parquet(b, props=apq.WriterProperties(compression=compression))
    assert apq.read_parquet(data).to_pydict() == b.to_pydict()
    assert pq.read_table(io.BytesIO(data)).to_pydict() == b.to_pydict()
    # and read pyarrow's compressed output
    sink = io.BytesIO()
    pq.write_table(pa.Table.from_batches([to_pyarrow(b)]), sink, compression=compression)
    back = apq.read_parquet(sink.getvalue())
    assert back.to_pydict() == b.to_pydict()


def test_projection():
    b = _mixed_batch()
    data = apq.write_parquet(b)
    back = apq.read_parquet(data, columns=["s", "i64"])
    assert back.schema.names == ["s", "i64"]
    assert back.to_pydict() == {"s": b["s"].to_pylist(), "i64": b["i64"].to_pylist()}


def test_multiple_row_groups():
    b1 = at.record_batch({"x": [1, 2, None]})
    b2 = at.record_batch({"x": [4, 5]})
    data = apq.write_parquet([b1, b2])
    f = apq.ParquetFile(data)
    assert len(f.row_groups) == 2
    assert f.num_rows == 5
    assert f.read().to_pydict() == {"x": [1, 2, None, 4, 5]}
    assert pq.read_table(io.BytesIO(data)).to_pydict() == {"x": [1, 2, None, 4, 5]}


def test_statistics():
    b = at.record_batch({"x": at.from_pylist([5, None, -2, 9], st.int64)})
    data = apq.write_parquet(b)
    f = apq.ParquetFile(data)
    stats = f.statistics(0, "x")
    assert stats["min"] == -2 and stats["max"] == 9 and stats["null_count"] == 1
    # pyarrow agrees
    meta = pq.ParquetFile(io.BytesIO(data)).metadata.row_group(0).column(0)
    assert meta.statistics.min == -2 and meta.statistics.max == 9


def test_dictionary_encoding_path():
    vals = ["a", "b", "a", None, "c"] * 100
    b = at.record_batch({"s": at.from_pylist(vals)})
    data = apq.write_parquet(b)
    assert apq.read_parquet(data).to_pydict() == {"s": vals}
    assert pq.read_table(io.BytesIO(data)).to_pydict() == {"s": vals}


def test_pyarrow_dictionary_int_pages():
    """pyarrow dictionary-encodes int columns by default — exercise
    RLE_DICTIONARY decode of numeric dictionaries."""
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 50, 5000)
    t = pa.table({"x": pa.array(vals, type=pa.int64())})
    sink = io.BytesIO()
    pq.write_table(t, sink, compression="none")
    back = apq.read_parquet(sink.getvalue())
    assert back.to_pydict() == {"x": vals.tolist()}


def test_temporal_types():
    b = at.record_batch(
        {
            "d": at.from_pylist([10, None, -3], st.Date32()),
            "ts": at.from_pylist([10**14, None, 5], st.Timestamp("us")),
        }
    )
    data = apq.write_parquet(b)
    back = apq.read_parquet(data)
    assert back.schema == b.schema
    assert back.to_pydict() == b.to_pydict()
    table = pq.read_table(io.BytesIO(data))
    assert table.column("d").type == pa.date32()


def test_required_columns():
    s = st.Schema((st.Field("x", st.int64, nullable=False),))
    b = at.RecordBatch(s, (at.from_pylist([1, 2, 3], st.int64),))
    data = apq.write_parquet(b)
    back = apq.read_parquet(data)
    assert back.to_pydict() == {"x": [1, 2, 3]}
    assert pq.read_table(io.BytesIO(data)).to_pydict() == {"x": [1, 2, 3]}


def test_large_roundtrip(rng):
    n = 100_000
    vals = rng.integers(-(2**50), 2**50, n)
    mask = rng.random(n) < 0.1
    arr = pa.array(np.where(mask, 0, vals), mask=mask, type=pa.int64())
    b = at.record_batch({"x": from_pyarrow(arr)})
    data = apq.write_parquet(b, props=apq.WriterProperties(compression="zstd"))
    back = apq.read_parquet(data)
    assert to_pyarrow(back.columns[0]).equals(arr)
    assert pq.read_table(io.BytesIO(data)).column("x").combine_chunks().equals(arr)
