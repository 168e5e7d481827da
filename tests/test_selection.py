"""M2 selection plane tests, bit-exact vs pyarrow (reference behaviors:
arrow-select/src/{filter,take,concat,interleave,coalesce}.rs)."""

import jax
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrowtpu as at
from arrowtpu import ops
from arrowtpu.config import TakeOptions


def rand_list(rng, n, null_density=0.2, lo=-1000, hi=1000):
    return [
        None if rng.random() < null_density else int(v)
        for v in rng.integers(lo, hi, n)
    ]


class TestFilter:
    @pytest.mark.parametrize("selectivity", [0.0, 0.1, 0.5, 0.9, 1.0])
    def test_vs_pyarrow(self, rng, selectivity):
        data = rand_list(rng, 500)
        mask = [
            None if rng.random() < 0.1 else bool(rng.random() < selectivity)
            for _ in range(500)
        ]
        ours = ops.filter_(at.from_pylist(data), at.from_pylist(mask, at.schema.boolean))
        theirs = pc.filter(pa.array(data), pa.array(mask))  # null -> drop
        assert ours.to_pylist() == theirs.to_pylist()
        assert ours.concrete_length() == len(theirs)

    def test_filter_strings_shares_arena(self, rng):
        data = ["a", "bb" * 20, None, "cc", "dddd" * 10]
        mask = [True, True, True, False, True]
        c = at.from_pylist(data)
        out = ops.filter_(c, at.from_pylist(mask))
        assert out.to_pylist() == ["a", "bb" * 20, None, "dddd" * 10]
        assert out.arena is c.arena  # zero-copy arena reuse

    def test_filter_dict_keys_only(self):
        c = at.dictionary_encode_host(["x", "y", None, "x", "z"])
        out = ops.filter_(c, at.from_pylist([True, False, True, True, False]))
        assert out.to_pylist() == ["x", None, "x"]
        assert out.values is c.values  # dictionary untouched

    def test_filter_record_batch(self, rng):
        n = 300
        d = {"a": rand_list(rng, n), "b": rand_list(rng, n)}
        mask = [bool(rng.random() < 0.5) for _ in range(n)]
        ours = ops.filter_record_batch(at.record_batch(d), at.from_pylist(mask))
        t = pa.table(d).filter(pa.array(mask))
        assert ours.to_pydict() == t.to_pydict()


class TestTake:
    def test_vs_pyarrow(self, rng):
        data = rand_list(rng, 400)
        idx = [None if rng.random() < 0.1 else int(rng.integers(0, 400)) for _ in range(200)]
        ours = ops.take(at.from_pylist(data), at.from_pylist(idx, at.schema.int64))
        theirs = pc.take(pa.array(data), pa.array(idx, pa.int64()))
        assert ours.to_pylist() == theirs.to_pylist()

    def test_take_oob_flag(self):
        c = at.from_pylist([1, 2, 3])
        idx = at.from_pylist([0, 5])
        out, oob = ops.take(c, idx, TakeOptions(check_bounds=True))
        assert bool(oob)
        out2, oob2 = ops.take(c, at.from_pylist([0, 2]), TakeOptions(check_bounds=True))
        assert not bool(oob2)
        # unchecked: OOB index -> null (documented deviation: reference
        # panics on unchecked OOB; we can't panic on device)
        out3 = ops.take(c, idx)
        assert out3.to_pylist() == [1, None]

    def test_take_strings_and_dict(self, rng):
        s = at.from_pylist(["aaa", None, "b" * 30, "c"])
        idx = at.from_pylist([2, 0, 3, 2, None])
        assert ops.take(s, idx).to_pylist() == ["b" * 30, "aaa", "c", "b" * 30, None]
        d = at.dictionary_encode_host(["x", "y", None, "z"])
        assert ops.take(d, idx).to_pylist() == [None, "x", "z", None, None]


class TestConcat:
    def test_vs_pyarrow(self, rng):
        a = rand_list(rng, 150)
        b = rand_list(rng, 75)
        c = rand_list(rng, 260)
        ours = ops.concat([at.from_pylist(x) for x in (a, b, c)])
        theirs = pa.concat_arrays([pa.array(x, pa.int64()) for x in (a, b, c)])
        assert ours.to_pylist() == theirs.to_pylist()

    def test_concat_strings(self):
        a = ["hello", None, "a very long string exceeding twelve bytes"]
        b = ["x", "another quite long string beyond the inline limit"]
        ours = ops.concat([at.from_pylist(a), at.from_pylist(b)])
        assert ours.to_pylist() == a + b

    def test_concat_batches(self, rng):
        d1 = {"a": rand_list(rng, 100), "b": rand_list(rng, 100)}
        d2 = {"a": rand_list(rng, 50), "b": rand_list(rng, 50)}
        ours = ops.concat_batches([at.record_batch(d1), at.record_batch(d2)])
        assert ours.to_pydict() == {
            "a": d1["a"] + d2["a"],
            "b": d1["b"] + d2["b"],
        }

    def test_concat_after_filter_compacts(self, rng):
        """Concat must use live rows, not capacity slabs."""
        data = list(range(10))
        c = at.from_pylist(data)
        half = ops.filter_(c, at.from_pylist([i % 2 == 0 for i in range(10)]))
        out = ops.concat([half, half])
        assert out.to_pylist() == [0, 2, 4, 6, 8] * 2


class TestInterleave:
    def test_vs_pyarrow_style(self, rng):
        a = [10, None, 30]
        b = [100, 200, None, 400]
        src = at.from_pylist([0, 1, 0, 1, 1])
        row = at.from_pylist([2, 0, 1, 3, 2])
        ours = ops.interleave([at.from_pylist(a), at.from_pylist(b)], src, row)
        assert ours.to_pylist() == [30, 100, None, 400, None]


class TestSliceCoalesce:
    def test_slice(self):
        c = at.from_pylist([1, None, 3, 4, 5])
        s = ops.slice_(c, 1, 3)
        assert s.to_pylist() == [None, 3, 4]
        s2 = ops.slice_(c, 3, 99)  # over-long clamps like arrow slice
        assert s2.to_pylist() == [4, 5]

    def test_coalescer_stream(self, rng):
        schema = at.schema.schema([("a", at.schema.int64)])
        co = ops.BatchCoalescer(schema, target_batch_size=128)
        pushed = []
        for i in range(5):
            data = rand_list(rng, 100)
            pushed += data
            co.push_batch(at.record_batch({"a": data}))
        got = []
        while (b := co.next_completed_batch()) is not None:
            assert int(b.length) == 128
            got += b.to_pydict()["a"]
        tail = co.finish()
        if tail is not None:
            got += tail.to_pydict()["a"]
        assert got == pushed

    def test_coalescer_with_filter(self, rng):
        schema = at.schema.schema([("a", at.schema.int64)])
        co = ops.BatchCoalescer(schema, target_batch_size=64)
        expect = []
        for i in range(3):
            data = rand_list(rng, 100, null_density=0)
            mask = [bool(rng.random() < 0.5) for _ in range(100)]
            expect += [d for d, m in zip(data, mask) if m]
            co.push_batch_with_filter(
                at.record_batch({"a": data}), at.from_pylist(mask)
            )
        got = []
        while (b := co.next_completed_batch()) is not None:
            got += b.to_pydict()["a"]
        tail = co.finish()
        if tail is not None:
            got += tail.to_pydict()["a"]
        assert got == expect


class TestJitPipeline:
    def test_filter_take_jitted(self, rng):
        """BASELINE config 1 shape: filter+take pipeline under one jit."""
        data = rand_list(rng, 1000, null_density=0.1)

        @jax.jit
        def pipeline(c):
            mask = ops.gt(c, 0)
            kept = ops.filter_(c, mask)
            # take every other surviving row
            idx = at.primitive(
                np.arange(0, 1024, 2, dtype=np.int64), at.schema.int64,
                length=(kept.length + 1) // 2,
            )
            return ops.take(kept, idx)

        out = pipeline(at.from_pylist(data))
        arr = pa.array(data, pa.int64())
        kept = pc.filter(arr, pc.greater(arr, 0))
        expect = kept.take(pa.array(range(0, len(kept), 2), pa.int64()))
        assert out.to_pylist() == expect.to_pylist()
