"""Extension types, DataType parser, Tensor.

Reference: arrow-schema/src/extension/ (canonical uuid/json/bool8/opaque/
tensor), arrow-schema/src/datatype_parse.rs, arrow/src/tensor.rs."""

import numpy as np
import pytest

from arrowtpu import extension as ext, schema as st, tensor as tn
from arrowtpu.dtype_parse import parse_datatype


ROUNDTRIP_TYPES = [
    st.null, st.boolean, st.int8, st.int16, st.int32, st.int64,
    st.uint8, st.uint16, st.uint32, st.uint64,
    st.float16, st.float32, st.float64,
    st.utf8, st.binary,
    st.Date32(), st.Date64(), st.Time32("s"), st.Time64("ns"),
    st.Timestamp("ms"), st.Timestamp("ns", "UTC"), st.Duration("s"),
    st.Interval("day_time"), st.Interval("month_day_nano"),
    st.Decimal128(38, 10), st.Decimal256(76, 20),
    st.FixedSizeBinary(16),
    st.Dictionary(st.int32, st.utf8),
    st.List(st.int64), st.List(st.List(st.float32)),
    st.FixedSizeList(st.int32, 4),
    st.Map(st.utf8, st.int64),
    st.Struct((st.Field("a", st.int32), st.Field("b", st.utf8))),
    st.Union((st.Field("i", st.int32), st.Field("f", st.float64)),
             (0, 1), "dense"),
    st.RunEndEncoded(st.int32, st.utf8),
]


@pytest.mark.parametrize("dt", ROUNDTRIP_TYPES, ids=str)
def test_parse_datatype_roundtrip(dt):
    assert parse_datatype(str(dt)) == dt


def test_parse_datatype_errors():
    with pytest.raises(st.SchemaError):
        parse_datatype("frob")
    with pytest.raises(st.SchemaError):
        parse_datatype("int32 trailing")


def test_uuid_extension():
    u = ext.Uuid()
    f = ext.extension_field("id", u)
    assert f.dtype == st.FixedSizeBinary(16)
    got = ext.REGISTRY.lookup(f)
    assert isinstance(got, ext.Uuid)


def test_bool8_json_extensions():
    f = ext.extension_field("flags", ext.Bool8())
    assert isinstance(ext.REGISTRY.lookup(f), ext.Bool8)
    f2 = ext.extension_field("doc", ext.Json())
    assert isinstance(ext.REGISTRY.lookup(f2), ext.Json)


def test_opaque_extension_roundtrip():
    o = ext.Opaque(st.int64, "vendor.thing", "acme")
    f = ext.extension_field("x", o)
    got = ext.REGISTRY.lookup(f)
    assert isinstance(got, ext.Opaque)
    assert got.storage == st.int64
    import json
    assert json.loads(got.metadata)["vendor_name"] == "acme"


def test_fixed_shape_tensor_extension():
    t = ext.FixedShapeTensor(st.float32, (2, 3))
    assert t.storage == st.FixedSizeList(st.float32, 6)
    f = ext.extension_field("emb", t)
    got = ext.REGISTRY.lookup(f)
    assert got.shape == (2, 3)


def test_unknown_extension_passthrough():
    f = st.Field("x", st.int32, True,
                 ((ext.EXTENSION_NAME_KEY, "com.example.custom"),))
    got = ext.REGISTRY.lookup(f)
    assert got.name == "com.example.custom" and got.storage == st.int32


def test_plain_field_no_extension():
    assert ext.REGISTRY.lookup(st.Field("x", st.int32)) is None


def test_tensor_row_major():
    a = np.arange(12, dtype=np.int32).reshape(3, 4)
    t = tn.tensor(a, names=("r", "c"))
    assert t.shape == (3, 4) and t.strides == (4, 1)
    assert t.is_row_major() and t.is_contiguous()
    assert t.dim_name(0) == "r"
    np.testing.assert_array_equal(t.to_numpy(), a)
    assert int(t.value((1, 2))) == 6


def test_tensor_column_major():
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    t = tn.tensor(a, column_major=True)
    assert t.is_column_major() and not t.is_row_major()
    np.testing.assert_array_equal(t.to_numpy(), a)


def test_tensor_wide_i64():
    a = np.arange(4, dtype=np.int64) * (1 << 40)
    t = tn.tensor(a.reshape(2, 2))
    assert t.dtype == st.int64
    np.testing.assert_array_equal(t.to_numpy(), a.reshape(2, 2))


def test_tensor_validation():
    with pytest.raises(st.InvalidArgumentError):
        tn.Tensor(np.zeros(2, np.int32), st.int32, (3, 3), (3, 1))
