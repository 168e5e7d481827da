"""Column/Batch construction tests (reference: arrow-array builders +
RecordBatch invariants, record_batch.rs:231)."""

import jax
import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import schema as st


def test_primitive_roundtrip():
    c = at.from_pylist([1, 2, None, 4])
    assert isinstance(c, at.PrimitiveColumn)
    assert c.dtype == st.int64
    assert c.capacity == 128
    assert c.concrete_length() == 4
    assert int(c.null_count()) == 1
    assert c.to_pylist() == [1, 2, None, 4]


def test_float_and_bool():
    f = at.from_pylist([1.5, None, -3.25])
    assert f.dtype == st.float64
    assert f.to_pylist() == [1.5, None, -3.25]
    b = at.from_pylist([True, False, None, True])
    assert isinstance(b, at.BooleanColumn)
    assert b.to_pylist() == [True, False, None, True]


def test_string_view_inline_and_arena():
    data = ["short", None, "a string definitely longer than twelve bytes", ""]
    c = at.from_pylist(data)
    assert isinstance(c, at.StringViewColumn)
    assert c.to_pylist() == data
    # inline strings (<=12 bytes) leave the arena untouched
    lens = np.asarray(c.views[:4, 0])
    assert lens.tolist() == [5, 0, 44, 0]


def test_dictionary_roundtrip():
    data = ["b", "a", "b", None, "c", "a"]
    c = at.dictionary_encode_host(data)
    assert isinstance(c, at.DictionaryColumn)
    assert c.to_pylist() == data
    # ranks reflect ascending value order: a<b<c
    ranks = np.asarray(c.value_ranks)[:3]
    # values interned in first-seen order: b, a, c -> ranks 1, 0, 2
    assert ranks.tolist() == [1, 0, 2]


def test_record_batch_invariants():
    b = at.record_batch({"a": [1, 2, 3], "b": [1.0, None, 3.0]})
    assert b.num_columns == 2
    assert int(b.length) == 3
    assert b.to_pydict() == {"a": [1, 2, 3], "b": [1.0, None, 3.0]}
    with pytest.raises(st.InvalidArgumentError):
        at.record_batch({"a": [1, 2, 3], "b": [1.0]})


def test_column_is_pytree():
    c = at.from_pylist([1, 2, None, 4])
    leaves = jax.tree_util.tree_leaves(c)
    assert len(leaves) == 3  # values, validity, length

    @jax.jit
    def f(col):
        return col.with_length(col.length)

    c2 = f(c)
    assert c2.to_pylist() == c.to_pylist()


def test_batch_is_pytree():
    b = at.record_batch({"a": [1, 2, 3], "s": ["x", None, "zzzzzzzzzzzzzzzzz"]})

    @jax.jit
    def f(batch):
        return batch

    b2 = f(b)
    assert b2.to_pydict() == b.to_pydict()
