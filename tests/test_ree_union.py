"""RunEndEncoded + Union array types and their kernels.

Reference semantics under test: RunEndBuffer physical-index mapping
(/root/reference/arrow-buffer/src/buffer/run.rs:232-258), take_run
(arrow-select/src/take.rs:951), union_extract
(arrow-select/src/union_extract.rs:79), dictionary GC
(arrow-select/src/dictionary.rs:45)."""

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import ops, schema as st
from arrowtpu.core import column as col


def test_ree_roundtrip_pylist():
    data = [1, 1, 1, 5, 5, None, None, None, 2, 2]
    r = at.run_end_from_pylist(data, st.int32)
    assert r.to_pylist() == data
    assert int(r.n_runs) == 4


def test_ree_decode_device():
    data = [3, 3, 7, 7, 7, 1]
    r = at.run_end_from_pylist(data, st.int32)
    plain = ops.run_end_decode(r)
    assert plain.to_pylist() == data


def test_ree_encode_device_roundtrip():
    data = [4, 4, 4, None, None, 9, 9, 4]
    c = col.from_pylist(data, st.int32)
    r = ops.run_end_encode(c)
    assert int(r.n_runs) == 4
    assert ops.run_end_decode(r).to_pylist() == data


def test_take_run():
    data = [10, 10, 20, 20, 20, 30]
    r = at.run_end_from_pylist(data, st.int32)
    idx = col.from_pylist([5, 0, 3, 2], st.int32)
    assert ops.take_run(r, idx).to_pylist() == [30, 10, 20, 20]


def test_ree_physical_index_matches_reference_binary_search():
    # run.rs:232: logical i -> first run with run_ends > i
    r = at.run_end_encoded(np.asarray([2, 5, 6], np.int32),
                           col.from_pylist([7, 8, 9], st.int32))
    import jax.numpy as jnp

    got = np.asarray(r.physical_index(jnp.arange(6)))
    assert got.tolist() == [0, 0, 1, 1, 1, 2]


@pytest.fixture
def sparse_union():
    dt = st.Union((st.Field("i", st.int32), st.Field("f", st.float32)), (2, 5),
                  "sparse")
    i = col.from_pylist([1, 2, 3, 4], st.int32)
    f = col.from_pylist([1.5, 2.5, 3.5, 4.5], st.float32)
    return col.union_column([2, 5, 2, 5], [i, f], dt)


def test_union_sparse_extract(sparse_union):
    assert ops.union_extract(sparse_union, "i").to_pylist() == [1, None, 3, None]
    assert ops.union_extract(sparse_union, "f").to_pylist() == [None, 2.5, None, 4.5]


def test_union_sparse_to_pylist(sparse_union):
    assert sparse_union.to_pylist() == [1, 2.5, 3, 4.5]


def test_union_dense_extract_and_take():
    dt = st.Union((st.Field("s", st.utf8), st.Field("i", st.int32)), (0, 1),
                  "dense")
    s = col.from_pylist(["x", "y"], st.utf8)
    i = col.from_pylist([42], st.int32)
    u = col.union_column([0, 1, 0], [s, i], dt, offsets=[0, 0, 1])
    assert u.to_pylist() == ["x", 42, "y"]
    assert ops.union_extract(u, "s").to_pylist() == ["x", None, "y"]
    assert ops.union_extract(u, "i").to_pylist() == [None, 42, None]
    idx = col.from_pylist([2, 0], st.int32)
    assert ops.take_union(u, idx).to_pylist() == ["y", "x"]


def test_union_sparse_take(sparse_union):
    idx = col.from_pylist([3, 1, 0], st.int32)
    assert ops.take_union(sparse_union, idx).to_pylist() == [4.5, 2.5, 1]


def test_dictionary_gc():
    d = col.dictionary_encode_host(["a", "b", "a", "a"], st.Dictionary(st.int32, st.utf8))
    # force an unreferenced value: remap keys away from 'b'
    import dataclasses
    import jax.numpy as jnp

    keys = dataclasses.replace(d.keys, values=jnp.zeros_like(d.keys.values))
    d2 = col.DictionaryColumn(keys, d.values, None, d.dtype)
    g = ops.garbage_collect_dictionary(d2)
    assert g.to_pylist() == ["a", "a", "a", "a"]
    assert int(g.values.length) == 1


def test_dictionary_merge_values():
    dt = st.Dictionary(st.int32, st.utf8)
    d1 = col.dictionary_encode_host(["a", "b"], dt)
    d2 = col.dictionary_encode_host(["b", "c"], dt)
    assert ops.should_merge_dictionary_values([d1, d2])
    merged, keys = ops.merge_dictionary_values([d1, d2])
    vals = merged.to_pylist()
    k1 = [vals[k] for k in keys[0].to_pylist()[:2]]
    k2 = [vals[k] for k in keys[1].to_pylist()[:2]]
    assert k1 == ["a", "b"] and k2 == ["b", "c"]
