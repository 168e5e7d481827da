"""Parquet content-defined chunking (reference
parquet/src/column/chunker/cdc.rs behind a WriterProperties knob):
boundaries are a pure function of the data, so a one-row edit re-chunks
only the pages around it and the rest of the file byte-dedups."""

import hashlib

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.formats import parquet as apq
from arrowtpu.formats import parquet_cdc as cdc


def _props():
    return apq.WriterProperties(
        cdc_options=cdc.CdcOptions(min_chunk_size=4 * 1024,
                                   max_chunk_size=16 * 1024),
        write_page_index=True,
        dictionary_enabled=False,
    )


def _write(vals):
    n = len(vals)
    b = at.record_batch({
        "v": at.primitive(np.asarray(vals, np.int64), at.schema.int64,
                          length=n)})
    return apq.write_parquet(b, props=_props())


def _page_hashes(data):
    pf = apq.ParquetFile(data)
    oi = pf.offset_index(0, "v")
    out = []
    for off, size, _first_row in oi:
        out.append(hashlib.sha256(data[off:off + size]).hexdigest())
    return out


class TestCdc:
    def test_mask_math(self):
        # avg=10240, target=(10240-4096)//8=768 -> mask_bits=9: top 9 bits
        m = cdc.calculate_mask(4096, 16384, 0)
        assert m == (0xFFFFFFFFFFFFFFFF << (64 - 9)) & 0xFFFFFFFFFFFFFFFF
        # norm_level widens/narrows the mask by one bit
        assert cdc.calculate_mask(4096, 16384, 1) == (
            0xFFFFFFFFFFFFFFFF << (64 - 8)) & 0xFFFFFFFFFFFFFFFF
        with pytest.raises(st.ArrowTpuError):
            cdc.calculate_mask(100, 50, 0)

    def test_deterministic(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 2**40, 100_000)
        assert _write(vals) == _write(vals.copy())

    def test_boundaries_follow_content(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 2**40, 100_000)
        h1 = _page_hashes(_write(vals))
        assert len(h1) > 10  # actually chunked
        sizes = np.diff([0] + list(range(len(h1))))  # sanity
        # edit ONE value in the middle -> most pages identical
        vals2 = vals.copy()
        vals2[50_000] += 1
        h2 = _page_hashes(_write(vals2))
        shared = len(set(h1) & set(h2))
        assert shared >= int(0.5 * len(h1)), (len(h1), len(h2), shared)
        # and the page COUNT stays in the same ballpark
        assert abs(len(h1) - len(h2)) <= 2

    def test_insert_resyncs(self):
        """The reference cdc test shape: inserting a row shifts
        everything after it, but boundaries resynchronize."""
        rng = np.random.default_rng(1)
        vals = list(rng.integers(0, 2**40, 80_000))
        h1 = _page_hashes(_write(vals))
        vals2 = vals[:40_000] + [12345] + vals[40_000:]
        h2 = _page_hashes(_write(vals2))
        shared = len(set(h1) & set(h2))
        assert shared >= int(0.4 * len(h1)), (len(h1), len(h2), shared)

    def test_nullable_and_strings(self):
        from arrowtpu.core import batch as bt
        from arrowtpu.core import column as col

        rng = np.random.default_rng(2)
        strs = [None if i % 17 == 0 else f"value-{rng.integers(0, 10**9)}"
                for i in range(60_000)]
        c = col.string_view(strs, st.utf8)
        b = bt.RecordBatch(st.Schema((st.Field("v", st.utf8),)), (c,))
        data = apq.write_parquet(b, props=_props())
        assert apq.read_parquet(data)["v"].to_pylist() == strs
        assert len(_page_hashes(data)) > 5

    def test_roundtrip_unaffected(self):
        rng = np.random.default_rng(3)
        vals = rng.integers(-1000, 1000, 50_000)
        data = _write(vals)
        got = apq.read_parquet(data)["v"].to_pylist()
        assert got == list(vals)
        # pyarrow can read CDC-chunked files (reader-invisible feature)
        pa = pytest.importorskip("pyarrow")
        import io

        import pyarrow.parquet as pq

        assert pq.read_table(io.BytesIO(data)).column(
            "v").to_pylist() == list(vals)
