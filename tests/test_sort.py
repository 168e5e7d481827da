"""M3 row-format + sort tests, validated bit-exact against pyarrow
(reference behaviors: arrow-ord/src/sort.rs, rank.rs, partition.rs;
key encoding arrow-row/src/lib.rs)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrowtpu as at
from arrowtpu import ops
from arrowtpu.config import SortOptions


def rand_ints(rng, n, null_density=0.2, lo=-50, hi=50):
    return [
        None if rng.random() < null_density else int(v)
        for v in rng.integers(lo, hi, n)
    ]


def rand_floats(rng, n, null_density=0.2):
    out = []
    for _ in range(n):
        r = rng.random()
        if r < null_density:
            out.append(None)
        else:
            out.append(float(np.round(rng.normal() * 100, 2)))
    return out


def pa_order(descending, nulls_first):
    return (
        "descending" if descending else "ascending",
        "at_start" if nulls_first else "at_end",
    )


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("nulls_first", [False, True])
class TestSortToIndices:
    def test_int(self, rng, descending, nulls_first):
        data = rand_ints(rng, 300)
        c = at.from_pylist(data)
        opts = SortOptions(descending=descending, nulls_first=nulls_first)
        out = ops.sort(c, opts)
        order, np_ = pa_order(descending, nulls_first)
        expect = pa.array(data, pa.int64()).sort(order=order, null_placement=np_)
        assert out.to_pylist() == expect.to_pylist()

    def test_float_with_special_values(self, rng, descending, nulls_first):
        data = rand_floats(rng, 200) + [
            float("inf"), float("-inf"), 0.0, -0.0, None,
        ]
        c = at.from_pylist(data)
        opts = SortOptions(descending=descending, nulls_first=nulls_first)
        out = ops.sort(c, opts)
        order, np_ = pa_order(descending, nulls_first)
        expect = pa.array(data, pa.float64()).sort(order=order, null_placement=np_)
        ours = out.to_pylist()
        theirs = expect.to_pylist()
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            assert (a is None) == (b is None)
            if a is not None:
                assert a == b or (np.isnan(a) and np.isnan(b))


class TestNanTotalOrder:
    def test_nan_sorts_after_inf(self):
        """Rust total_cmp: NaN > +Inf (reference arrow-row fixed.rs:118)."""
        data = [1.0, float("nan"), float("inf"), -1.0, float("-inf")]
        out = ops.sort(at.from_pylist(data))
        vals = out.to_pylist()
        assert vals[0] == float("-inf")
        assert vals[-2] == float("inf")
        assert np.isnan(vals[-1])


class TestLexsort:
    def test_two_columns_vs_pyarrow(self, rng):
        n = 400
        a = rand_ints(rng, n, lo=-3, hi=3)  # heavy ties
        b = rand_floats(rng, n)
        batch = at.record_batch({"a": a, "b": b})
        out = ops.sort_batch(batch, ["a", "b"])
        t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.float64())})
        expect = t.sort_by([("a", "ascending"), ("b", "ascending")])
        # pyarrow sort_by places nulls at end; ours defaults nulls_first
        opts = [SortOptions(nulls_first=False)] * 2
        out = ops.sort_batch(batch, ["a", "b"], opts)
        assert out.to_pydict() == expect.to_pydict()

    def test_mixed_directions(self, rng):
        n = 300
        a = rand_ints(rng, n, lo=0, hi=4, null_density=0)
        b = rand_ints(rng, n, null_density=0)
        batch = at.record_batch({"a": a, "b": b})
        out = ops.sort_batch(
            batch, ["a", "b"],
            [SortOptions(descending=True), SortOptions(descending=False)],
        )
        t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
        expect = t.sort_by([("a", "descending"), ("b", "ascending")])
        assert out.to_pydict() == expect.to_pydict()

    def test_dict_column_lexsort(self, rng):
        """BASELINE config 3 shape: (Int32, Float64, Utf8-dict) keys."""
        n = 200
        words = ["apple", "pear", "zebra", "kiwi", None]
        a = rand_ints(rng, n, lo=-5, hi=5, null_density=0)
        b = rand_floats(rng, n, null_density=0)
        s = [words[rng.integers(0, len(words))] for _ in range(n)]
        batch = at.record_batch(
            {"a": at.from_pylist(a, at.schema.int32), "b": b,
             "s": at.dictionary_encode_host(s)}
        )
        out = ops.sort_batch(batch, ["s", "a", "b"],
                             [SortOptions(nulls_first=False)] * 3)
        t = pa.table({"a": pa.array(a, pa.int32()), "b": pa.array(b, pa.float64()),
                      "s": pa.array(s)})
        expect = t.sort_by([("s", "ascending"), ("a", "ascending"), ("b", "ascending")])
        assert out.to_pydict() == expect.to_pydict()

    def test_limit(self, rng):
        data = rand_ints(rng, 500, null_density=0)
        out = ops.sort(at.from_pylist(data), limit=10)
        assert out.to_pylist() == sorted(data)[:10]


class TestRankPartition:
    def test_rank_max_ties(self, rng):
        data = [1, 2, 2, 3]
        out = ops.rank(at.from_pylist(data))
        assert out.to_pylist() == [1, 3, 3, 4]

    def test_rank_vs_pyarrow(self, rng):
        data = [int(v) for v in rng.integers(0, 10, 200)]
        out = ops.rank(at.from_pylist(data))
        expect = pc.rank(pa.array(data, pa.int64()), sort_keys="ascending",
                         tiebreaker="max")
        assert out.to_pylist() == expect.to_pylist()

    def test_partition(self):
        data = [1, 1, 2, 2, 2, 3]
        b = ops.partition([at.from_pylist(data)])
        assert b.to_pylist() == [True, False, True, False, False, True]
        assert ops.partition_ranges(b) == [(0, 2), (2, 5), (5, 6)]


class TestExactStringSort:
    """Plain (non-dictionary) string columns now sort exactly via full
    byte planes (reference varlen row encoding, arrow-row/src/variable.rs:94)."""

    def test_vs_pyarrow(self, rng):
        import pyarrow as pa
        import pyarrow.compute as pc
        from arrowtpu.interop import from_pyarrow
        from arrowtpu import ops

        pool = ["", "a", "a\x00", "a\x00b", "ab", "abc", "abcd" * 8, "z", "ZZ", "zz" * 20]
        vals = [pool[i] if rng.random() > 0.1 else None for i in rng.integers(0, len(pool), 500)]
        arr = pa.array(vals)
        c = from_pyarrow(arr)
        idx = ops.sort_to_indices(c)
        sorted_ours = ops.take(c, idx).to_pylist()
        expect = sorted([v for v in vals if v is not None])
        n_null = sum(v is None for v in vals)
        # defaults: ascending, nulls first (SortOptions)
        assert sorted_ours[:n_null] == [None] * n_null
        assert sorted_ours[n_null:] == expect

    def test_descending(self):
        from arrowtpu import ops
        from arrowtpu.config import SortOptions
        import arrowtpu as at

        c = at.from_pylist(["b", "a", None, "ab", "a\x00"])
        idx = ops.sort_to_indices(c, SortOptions(descending=True, nulls_first=False))
        got = ops.take(c, idx).to_pylist()
        assert got == ["b", "ab", "a\x00", "a", None]
