"""k-way merge (reference arrow-select/src/merge.rs) and row-format
decode round-trip (reference arrow-row/src/lib.rs:1113 convert_rows)."""

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import ops
from arrowtpu.config import SortOptions
from arrowtpu.core import column as cc
from arrowtpu.ops import merge as mg
from arrowtpu.rowformat.decode import RowConverter


class TestMerge:
    def test_merge_two_sorted_runs(self, rng):
        a = sorted(int(x) for x in rng.integers(0, 1000, 200))
        b = sorted(int(x) for x in rng.integers(0, 1000, 150))
        ba = at.record_batch({"k": a, "v": [i for i in range(len(a))]})
        bb = at.record_batch({"k": b, "v": [1000 + i for i in range(len(b))]})
        out = mg.merge_batches([ba, bb], ["k"])
        got = out.to_pydict()
        assert got["k"] == sorted(a + b)
        # stability: equal keys keep source order (source 0 first)
        seen = {}
        for k, v in zip(got["k"], got["v"]):
            seen.setdefault(k, []).append(v)
        for k, vs in seen.items():
            lows = [v for v in vs if v < 1000]
            assert vs[: len(lows)] == lows, f"key {k} not stable"

    def test_merge_k_runs_with_nulls(self, rng):
        runs = []
        all_rows = []
        for _ in range(4):
            vals = [None if rng.random() < 0.1 else int(x)
                    for x in rng.integers(0, 50, 64)]
            vals.sort(key=lambda x: (x is not None, x))  # nulls first
            runs.append(at.record_batch({"k": vals}))
            all_rows += vals
        out = mg.merge_batches(runs, ["k"])
        got = out.to_pydict()["k"]
        assert got == sorted(all_rows, key=lambda x: (x is not None, x))

    def test_merge_descending(self, rng):
        a = sorted((int(x) for x in rng.integers(0, 100, 50)), reverse=True)
        b = sorted((int(x) for x in rng.integers(0, 100, 70)), reverse=True)
        out = mg.merge_batches(
            [at.record_batch({"k": a}), at.record_batch({"k": b})],
            ["k"], [SortOptions(descending=True, nulls_first=False)],
        )
        assert out.to_pydict()["k"] == sorted(a + b, reverse=True)


class TestRowDecode:
    def roundtrip(self, columns, options=None):
        conv = RowConverter(options)
        planes = conv.convert_columns(columns)
        return conv.convert_rows(planes, columns[0].length)

    def test_int_float_bool_roundtrip(self, rng):
        data_i = [None if rng.random() < 0.15 else int(x)
                  for x in rng.integers(-(2**31), 2**31, 100)]
        data_f = [None if rng.random() < 0.15 else float(np.float32(x))
                  for x in rng.standard_normal(100)]
        data_b = [None if rng.random() < 0.15 else bool(x)
                  for x in rng.integers(0, 2, 100)]
        ci = cc.from_pylist(data_i, at.schema.int32)
        cf = cc.from_pylist(data_f, at.schema.float32)
        cb = cc.from_pylist(data_b, at.schema.boolean)
        out = self.roundtrip([ci, cf, cb])
        assert out[0].to_pylist() == data_i
        assert out[1].to_pylist() == data_f
        assert out[2].to_pylist() == data_b

    def test_i64_f64_roundtrip(self, rng):
        data_i = [None if rng.random() < 0.1 else int(x)
                  for x in rng.integers(-(2**62), 2**62, 80)]
        data_f = [None if rng.random() < 0.1 else float(x)
                  for x in rng.standard_normal(80)]
        ci = cc.from_pylist(data_i, at.schema.int64)
        cf = cc.from_pylist(data_f, at.schema.float64)
        out = self.roundtrip([ci, cf])
        assert out[0].to_pylist() == data_i
        assert out[1].to_pylist() == data_f

    def test_string_roundtrip(self, rng):
        data = ["", "a", "hello", None, "a-much-longer-string-than-twelve",
                "zzz", None, "mid"]
        c = at.string_view(data)
        (out,) = self.roundtrip([c])
        assert out.to_pylist() == data

    def test_dictionary_roundtrip(self):
        c = at.dictionary_encode_host(["pear", "apple", None, "pear", "fig"])
        (out,) = self.roundtrip([c])
        assert out.to_pylist() == ["pear", "apple", None, "pear", "fig"]

    def test_descending_nulls_last_roundtrip(self, rng):
        data = [None if rng.random() < 0.2 else int(x)
                for x in rng.integers(-100, 100, 60)]
        c = cc.from_pylist(data, at.schema.int32)
        opts = [SortOptions(descending=True, nulls_first=False)]
        (out,) = self.roundtrip([c], opts)
        assert out.to_pylist() == data

    def test_order_preservation(self, rng):
        """Sorting by encoded planes == sorting decoded values."""
        import jax

        data = [None if rng.random() < 0.1 else int(x)
                for x in rng.integers(-1000, 1000, 128)]
        c = cc.from_pylist(data, at.schema.int64)
        conv = RowConverter()
        planes = conv.convert_columns([c])
        idx = np.asarray(jax.device_get(
            ops.sort_to_indices(c).values))[: len(data)]
        want = sorted(range(len(data)),
                      key=lambda i: (data[i] is not None, data[i]))
        assert list(idx) == want
