"""Parquet round-trip of variant columns: VARIANT logicalType
annotation (reference parquet/src/basic.rs LogicalType::Variant, thrift
union id 16), unshredded and shredded layouts, pyarrow interop."""

import datetime as dt

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu import variant as V
from arrowtpu.core import batch as bt
from arrowtpu.formats import parquet as apq

VALS = [
    {"a": 1, "b": "x"},
    {"a": 2, "b": "y", "extra": [1, 2, {"d": None}]},
    "plain string",
    None,
    42,
    {"a": None, "b": "w"},
]


def _variant_batch(vc):
    tv = vc.typed_value.dtype if vc.typed_value is not None else None
    f = V.variant_field("v", tv)
    return bt.RecordBatch(st.Schema((f,)), (vc.inner,))


class TestVariantParquet:
    def test_unshredded_roundtrip(self):
        vc = V.variant_array(VALS)
        data = apq.write_parquet(_variant_batch(vc))
        pf = apq.ParquetFile(data)
        from arrowtpu.extension import EXTENSION_NAME_KEY

        f = pf.schema.fields[0]
        assert dict(f.metadata)[EXTENSION_NAME_KEY] == V.VARIANT_EXT_NAME
        got = pf.read()
        back = V.VariantColumn(got["v"])
        assert back.to_pylist() == VALS

    def test_shredded_roundtrip(self):
        vc = V.variant_array(VALS)
        target = st.Struct((st.Field("a", st.int64),
                            st.Field("b", st.utf8)))
        sh = V.shred_variant(vc, target)
        data = apq.write_parquet(_variant_batch(sh))
        got = apq.read_parquet(data)
        back = V.VariantColumn(got["v"])
        # typed_value survives as device columns; logical content equal
        assert back.typed_value is not None
        assert V.unshred_variant(back).to_pylist() == VALS
        assert back.to_pylist() == VALS

    def test_pyarrow_reads_the_struct(self):
        """pyarrow can read the file; the metadata/value binaries round-
        trip byte-exactly through the pyarrow reader (pyarrow 25.0 has
        no Python-level variant API, so interop is at the storage
        level)."""
        pa = pytest.importorskip("pyarrow")
        import io

        import pyarrow.parquet as pq

        vc = V.variant_array(VALS)
        data = apq.write_parquet(_variant_batch(vc))
        t = pq.read_table(io.BytesIO(data))
        rows = t.column("v").to_pylist()
        metas = vc.metadata_bytes()
        vals = vc.value_bytes()
        for i, r in enumerate(rows):
            if VALS[i] is None:
                assert r is None or r["value"] is None
            else:
                assert r["metadata"] == metas[i]
                assert r["value"] == vals[i]

    def test_variant_get_after_scan(self):
        vc = V.variant_array(VALS)
        target = st.Struct((st.Field("a", st.int64),))
        sh = V.shred_variant(vc, target)
        data = apq.write_parquet(_variant_batch(sh))
        got = apq.read_parquet(data)
        back = V.VariantColumn(got["v"])
        out = V.variant_get(back, ["a"], as_dtype=st.int64)
        assert out.to_pylist() == [1, 2, None, None, None, None]
