"""Parquet extras: bloom filters (SBBF/XXH64), DELTA_BINARY_PACKED,
DELTA_LENGTH_BYTE_ARRAY, BYTE_STREAM_SPLIT, page index.

Reference: parquet/src/bloom_filter/mod.rs, encodings/, file/page_index/.
Cross-validated against pyarrow's parquet implementation both directions
(the analogue of the reference's parquet-testing golden-file suite)."""

import io

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.formats import parquet as pqt
from arrowtpu.formats import parquet_ext as px

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as papq  # noqa: E402


def test_xxh64_against_reference_library():
    xxhash = pytest.importorskip("xxhash")
    rng = np.random.default_rng(7)
    for n in [0, 1, 3, 4, 5, 8, 12, 31, 32, 33, 100, 1000]:
        data = rng.bytes(n)
        assert px.xxh64_bytes(data) == xxhash.xxh64(data).intdigest(), n


def test_xxh64_vectorized_matches_scalar():
    rng = np.random.default_rng(1)
    v64 = rng.integers(-(2**62), 2**62, 64, dtype=np.int64)
    got = px.xxh64_u64(v64.astype("<i8").view(np.uint64))
    want = [px.xxh64_bytes(int(x).to_bytes(8, "little", signed=True)) for x in v64]
    assert got.tolist() == want
    v32 = rng.integers(-(2**30), 2**30, 64, dtype=np.int32)
    got32 = px.xxh64_u32(v32.astype("<i4").view(np.uint32))
    want32 = [px.xxh64_bytes(int(x).to_bytes(4, "little", signed=True)) for x in v32]
    assert got32.tolist() == want32


def test_xxh64_long_input():
    data = bytes(range(256)) * 3  # exercises the 32-byte main loop
    h1 = px.xxh64_bytes(data)
    assert h1 == px.xxh64_bytes(data)
    assert h1 != px.xxh64_bytes(data[:-1])


def test_sbbf_insert_check():
    f = px.Sbbf.with_ndv_fpp(1000, 0.01)
    h = px.xxh64_u64(np.arange(1000, dtype=np.uint64))
    f.insert_hashes(h)
    assert f.check_hashes(h).all()
    other = px.xxh64_u64(np.arange(100000, 101000, dtype=np.uint64))
    fp = f.check_hashes(other).mean()
    assert fp < 0.05  # ~1% target fpp


def test_sbbf_serialization_roundtrip():
    f = px.Sbbf.with_ndv_fpp(100)
    h = px.xxh64_u32(np.arange(100, dtype=np.uint32))
    f.insert_hashes(h)
    blob = f.to_bytes()
    g = px.Sbbf.from_buffer(blob, 0)
    assert g.check_hashes(h).all()
    assert g.num_bytes == f.num_bytes


def test_delta_binary_packed_roundtrip():
    rng = np.random.default_rng(2)
    for vals in [
        rng.integers(-1000, 1000, 1000, dtype=np.int64),
        np.arange(500, dtype=np.int64) * 7 - 200,
        np.array([5], np.int64),
        np.array([], np.int64),
        rng.integers(-(2**60), 2**60, 300, dtype=np.int64),
    ]:
        buf = px.delta_binary_packed_encode(vals)
        got, _ = px.delta_binary_packed_decode(buf)
        np.testing.assert_array_equal(got, vals)


def test_delta_length_byte_array_roundtrip():
    vals = [b"alpha", b"", b"b" * 100, b"xyz"]
    buf = px.delta_length_byte_array_encode(vals)
    assert px.delta_length_byte_array_decode(buf, 4) == vals


def test_byte_stream_split_roundtrip():
    rng = np.random.default_rng(3)
    v = rng.normal(size=256).astype(np.float32)
    buf = px.byte_stream_split_encode(v)
    np.testing.assert_array_equal(px.byte_stream_split_decode(buf, "<f4", 256), v)


def _roundtrip_ours(batch, props):
    return pqt.ParquetFile(pqt.write_parquet(batch, props=props))


def test_write_delta_read_back_and_pyarrow():
    vals = list(range(0, 5000, 3))
    b = at.record_batch({"x": at.primitive(np.array(vals, np.int64), st.int64)})
    props = pqt.WriterProperties(column_encoding={"x": "delta_binary_packed"})
    data = pqt.write_parquet(b, props=props)
    # our reader
    got = pqt.read_parquet(data)
    assert got["x"].to_pylist() == vals
    # pyarrow reads our DELTA file
    t = papq.read_table(io.BytesIO(data))
    assert t.column("x").to_pylist() == vals


def test_write_bss_read_back_and_pyarrow():
    vals = np.linspace(-5, 5, 777).astype(np.float32)
    b = at.record_batch({"f": at.primitive(vals, st.float32)})
    props = pqt.WriterProperties(column_encoding={"f": "byte_stream_split"})
    data = pqt.write_parquet(b, props=props)
    np.testing.assert_array_equal(
        np.array(pqt.read_parquet(data)["f"].to_pylist(), np.float32), vals
    )
    t = papq.read_table(io.BytesIO(data))
    np.testing.assert_array_equal(np.array(t.column("f")), vals)


def test_read_pyarrow_delta_and_bss():
    import pyarrow as pa

    ints = pa.table({"i": pa.array(range(3000), pa.int32())})
    sink = io.BytesIO()
    papq.write_table(ints, sink, use_dictionary=False, compression="NONE",
                     column_encoding={"i": "DELTA_BINARY_PACKED"})
    got = pqt.read_parquet(sink.getvalue())
    assert got["i"].to_pylist() == list(range(3000))

    floats = pa.table({"f": pa.array(np.arange(100, dtype=np.float64))})
    sink2 = io.BytesIO()
    papq.write_table(floats, sink2, use_dictionary=False, compression="NONE",
                     use_byte_stream_split=["f"])
    got2 = pqt.read_parquet(sink2.getvalue())
    assert got2["f"].to_pylist() == list(np.arange(100.0))


def test_bloom_filter_file_roundtrip():
    vals = np.arange(0, 10000, 7, dtype=np.int64)
    b = at.record_batch({"k": at.primitive(vals, st.int64)})
    props = pqt.WriterProperties(bloom_filter_columns=("k",))
    data = pqt.write_parquet(b, props=props)
    f = pqt.ParquetFile(data)
    assert f.bloom_filter(0, "k") is not None
    assert f.bloom_might_contain(0, "k", 7)
    assert f.bloom_might_contain(0, "k", 9996)  # 7*1428
    misses = sum(f.bloom_might_contain(0, "k", int(v)) for v in range(1, 100, 7))
    assert misses <= 3  # false positives rare
    # file still readable by pyarrow with the bloom fields present
    t = papq.read_table(io.BytesIO(data))
    assert t.column("k").to_pylist() == vals.tolist()


def test_bloom_filter_strings():
    b = at.record_batch({"s": at.string_view(["apple", "pear", "fig"])})
    props = pqt.WriterProperties(
        bloom_filter_columns=("s",), dictionary_enabled=False
    )
    f = pqt.ParquetFile(pqt.write_parquet(b, props=props))
    assert f.bloom_might_contain(0, "s", "apple")
    assert not f.bloom_might_contain(0, "s", "durian")


def test_page_index_roundtrip():
    vals = np.arange(100, dtype=np.int32)
    b = at.record_batch({"x": at.primitive(vals, st.int32)})
    props = pqt.WriterProperties(write_page_index=True)
    data = pqt.write_parquet(b, props=props)
    f = pqt.ParquetFile(data)
    ci = f.column_index(0, "x")
    oi = f.offset_index(0, "x")
    assert ci is not None and oi is not None
    assert ci["null_pages"] == [False]
    import struct as _s

    assert _s.unpack("<i", ci["min_values"][0])[0] == 0
    assert _s.unpack("<i", ci["max_values"][0])[0] == 99
    assert oi[0][2] == 0  # first_row_index
    # pyarrow still reads the file (page index structures are well-formed)
    t = papq.read_table(io.BytesIO(data))
    assert t.column("x").to_pylist() == vals.tolist()


def test_page_index_with_pyarrow_reader_metadata():
    vals = np.arange(50, dtype=np.int64)
    b = at.record_batch({"x": at.primitive(vals, st.int64)})
    data = pqt.write_parquet(b, props=pqt.WriterProperties(write_page_index=True))
    md = papq.ParquetFile(io.BytesIO(data)).metadata.row_group(0).column(0)
    assert md.has_column_index and md.has_offset_index
