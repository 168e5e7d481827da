"""Variant type: encoding round-trips, VariantColumn, shredding,
variant_get, JSON bridge (reference parquet-variant/src/variant.rs,
parquet-variant-compute/src/{shred_variant,unshred_variant,
variant_get}.rs, parquet-variant-json)."""

import datetime as dt
import decimal
import uuid

import numpy as np
import pytest

from arrowtpu import schema as st
from arrowtpu import variant as V


SAMPLES = [
    None,
    True,
    False,
    0,
    -1,
    127,
    -128,
    32767,
    -(2**31),
    2**31 - 1,
    2**62,
    -(2**63),
    3.5,
    -0.0,
    float("inf"),
    "",
    "short",
    "x" * 63,
    "y" * 64,
    "unicode: héllo ☃",
    b"\x00\x01\xff",
    decimal.Decimal("12.34"),
    decimal.Decimal("-0.000001"),
    decimal.Decimal("123456789012345678.90"),
    dt.date(2024, 2, 29),
    dt.datetime(2024, 6, 1, 12, 30, 45, 123456),
    dt.datetime(2024, 6, 1, 12, 30, 45, 123456, tzinfo=dt.timezone.utc),
    dt.time(23, 59, 59, 999999),
    uuid.UUID("12345678-1234-5678-1234-567812345678"),
    V.VariantFloat(1.5),
    V.VariantTsNanos(1_717_243_845_123_456_789),
    V.VariantTsNanos(77, utc=False),
    {},
    {"a": 1, "b": "two"},
    {"nested": {"x": [1, 2, {"deep": None}]}, "z": 4.0},
    [],
    [1, "a", None, True, {"k": []}],
    list(range(300)),  # large array (4-byte count)
]


class TestEncoding:
    @pytest.mark.parametrize("v", SAMPLES, ids=range(len(SAMPLES)))
    def test_roundtrip_value(self, v):
        meta, val = V.encode_variant(v)
        names, _ = V.parse_metadata(meta)
        got = V.decode_value(val, names)
        assert got == v
        if v is not None and not isinstance(v, (dict, list)):
            assert type(got) is type(v)

    def test_large_object(self):
        v = {f"f{i:04d}": i for i in range(300)}
        meta, val = V.encode_variant(v)
        names, _ = V.parse_metadata(meta)
        assert V.decode_value(val, names) == v

    def test_metadata_sorted_unique(self):
        meta, _ = V.encode_variant({"b": 1, "a": {"c": 2, "a": 3}})
        names, is_sorted = V.parse_metadata(meta)
        assert names == sorted(set(names)) == ["a", "b", "c"]
        assert is_sorted

    def test_object_field_ids_sorted_by_name(self):
        # spec: object field ids sorted lexicographically by field name
        # (reference variant/object.rs:401)
        meta, val = V.encode_variant({"zz": 1, "aa": 2})
        names, _ = V.parse_metadata(meta)
        # first field id in the object header must map to "aa"
        header = val[0]
        assert header & 0x03 == 2  # object
        id_w = ((header >> 4) & 0x03) + 1
        n = val[1]
        first_id = int.from_bytes(val[2:2 + id_w], "little")
        assert n == 2 and names[first_id] == "aa"

    def test_truncated_raises(self):
        meta, val = V.encode_variant({"a": [1, 2, 3]})
        names, _ = V.parse_metadata(meta)
        with pytest.raises(st.ArrowTpuError):
            V.decode_value(val[:-2], names)

    def test_bad_version_raises(self):
        with pytest.raises(st.ArrowTpuError):
            V.parse_metadata(b"\x02\x00")


class TestVariantColumn:
    def test_array_roundtrip(self):
        vals = [1, "two", None, {"a": [1.5, None]}, [True, {"b": "c"}]]
        vc = V.variant_array(vals)
        assert vc.to_pylist() == vals
        assert V.is_variant_dtype(vc.inner.dtype)

    def test_shared_metadata(self):
        vc = V.variant_array([{"k1": 1}, {"k2": 2}])
        metas = vc.metadata_bytes()
        assert metas[0] == metas[1]
        names, _ = V.parse_metadata(metas[0])
        assert names == ["k1", "k2"]

    def test_variant_field_extension(self):
        f = V.variant_field("payload")
        from arrowtpu.extension import EXTENSION_NAME_KEY

        assert dict(f.metadata)[EXTENSION_NAME_KEY] == V.VARIANT_EXT_NAME


class TestShredding:
    def test_primitive_shred_unshred(self):
        vals = [1, 2, "not an int", None, 4, 3.5]
        vc = V.variant_array(vals)
        sh = V.shred_variant(vc, st.int64)
        # typed_value holds the ints; misses stay in value
        tv = sh.typed_value.to_pylist()
        assert tv == [1, 2, None, None, 4, None]
        assert V.unshred_variant(sh).to_pylist() == vals

    def test_object_shred_partial(self):
        vals = [
            {"a": 1, "b": "x"},
            {"a": 2, "b": "y", "extra": [1, 2]},
            {"b": "z"},            # a missing
            {"a": "wrong type", "b": "w"},
            "not an object",
            None,
        ]
        vc = V.variant_array(vals)
        target = st.Struct((st.Field("a", st.int64),
                            st.Field("b", st.utf8)))
        sh = V.shred_variant(vc, target)
        a_group = sh.typed_value.children[0]
        a_typed = a_group.children[1].to_pylist()
        assert a_typed == [1, 2, None, None, None, None]
        assert V.unshred_variant(sh).to_pylist() == vals

    def test_nested_struct_shred(self):
        vals = [{"o": {"x": 1}}, {"o": {"x": 2, "y": 3}}, {"o": "no"}]
        target = st.Struct((st.Field(
            "o", st.Struct((st.Field("x", st.int64),))),))
        vc = V.variant_array(vals)
        sh = V.shred_variant(vc, target)
        assert V.unshred_variant(sh).to_pylist() == vals

    def test_timestamp_date_shred(self):
        vals = [dt.date(2020, 1, 1), dt.datetime(2021, 2, 3, 4, 5, 6),
                "x", None]
        vc = V.variant_array(vals)
        sh = V.shred_variant(vc, st.Date32())
        assert sh.typed_value.to_pylist() == [
            (dt.date(2020, 1, 1) - dt.date(1970, 1, 1)).days,
            None, None, None]
        assert V.unshred_variant(sh).to_pylist() == vals


class TestVariantGet:
    def test_get_field(self):
        vals = [{"a": 1}, {"a": "s"}, {"b": 2}, None, [5], {"a": None}]
        vc = V.variant_array(vals)
        sub = V.variant_get(vc, ["a"])
        assert sub.to_pylist() == [1, "s", None, None, None, None]

    def test_get_nested_path(self):
        vals = [{"a": {"b": [10, 20]}}, {"a": {"b": "no"}}, {"a": 7}]
        vc = V.variant_array(vals)
        sub = V.variant_get(vc, ["a", "b", 1])
        assert sub.to_pylist() == [20, None, None]

    def test_get_as_dtype(self):
        vals = [{"a": 1}, {"a": 2.5}, {"a": 3}, {}]
        vc = V.variant_array(vals)
        out = V.variant_get(vc, ["a"], as_dtype=st.int64)
        assert out.to_pylist() == [1, None, 3, None]

    def test_get_on_shredded_columnar(self):
        # fully shredded path: extraction must come straight off the
        # typed device column
        vals = [{"a": 1}, {"a": 2}, {"a": 3}]
        vc = V.variant_array(vals)
        target = st.Struct((st.Field("a", st.int64),))
        sh = V.shred_variant(vc, target)
        out = V.variant_get(sh, ["a"], as_dtype=st.int64)
        assert out.to_pylist() == [1, 2, 3]

    def test_get_index(self):
        vals = [[1, 2], [], "x", [None, {"k": 1}]]
        vc = V.variant_array(vals)
        assert V.variant_get(vc, [0]).to_pylist() == [1, None, None, None]
        assert V.variant_get(vc, [1, "k"]).to_pylist() == [
            None, None, None, 1]


class TestJson:
    def test_to_json(self):
        vc = V.variant_array([
            {"a": 1, "t": dt.date(2024, 1, 2)},
            [1.5, None, "x"],
            b"\x01\x02",
            None,
        ])
        got = V.batch_variant_to_json(vc)
        assert got[0] == '{"a":1,"t":"2024-01-02"}'
        assert got[1] == '[1.5,null,"x"]'
        assert got[2] == '"AQI="'
        assert got[3] is None

    def test_from_json_roundtrip(self):
        texts = ['{"a":[1,2,{"b":null}],"c":"x"}', "3.25", "null",
                 "[true,false]", None]
        vc = V.batch_json_to_variant(texts)
        back = V.batch_variant_to_json(vc)
        assert back == ["{\"a\":[1,2,{\"b\":null}],\"c\":\"x\"}", "3.25",
                        "null", "[true,false]", None]
