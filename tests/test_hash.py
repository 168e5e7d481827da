"""M4 hash plane tests: group-by aggregation and hash join.

These components are new relative to the reference (arrow-rs has no
group-by/join — they live downstream in DataFusion; BASELINE configs 4-5
make them first-class).  Validated against pandas groupby/merge as the
CPU oracle."""

import jax
import numpy as np
import pandas as pd
import pytest

import arrowtpu as at
from arrowtpu import ops
from arrowtpu.ops import groupby as gb
from arrowtpu.ops import join as jn


def rand_ints(rng, n, null_density=0.0, lo=0, hi=10):
    return [
        None if rng.random() < null_density else int(v)
        for v in rng.integers(lo, hi, n)
    ]


def sorted_records(d):
    keys = list(d.keys())
    rows = list(zip(*[d[k] for k in keys]))
    return sorted(rows, key=lambda r: tuple((x is None, x) for x in r))


class TestGroupBy:
    @pytest.mark.parametrize("cardinality", [3, 100])
    def test_sum_count_min_vs_pandas(self, rng, cardinality):
        n = 500
        keys = rand_ints(rng, n, lo=0, hi=cardinality)
        vals = rand_ints(rng, n, null_density=0.2, lo=-100, hi=100)
        batch = at.record_batch({"k": keys, "v": vals})
        out = gb.group_by(batch, ["k"], [("v", "sum"), ("v", "count"), ("v", "min")])
        got = out.to_pydict()

        df = pd.DataFrame({"k": keys, "v": pd.array(vals, dtype="Int64")})
        exp = df.groupby("k", dropna=False).agg(
            sum_v=("v", lambda s: s.sum(min_count=1)),
            count_v=("v", "count"),
            min_v=("v", "min"),
        ).reset_index()
        expect = {
            "k": exp["k"].tolist(),
            "sum_v": [None if pd.isna(x) else int(x) for x in exp["sum_v"]],
            "count_v": exp["count_v"].astype(int).tolist(),
            "min_v": [None if pd.isna(x) else int(x) for x in exp["min_v"]],
        }
        assert sorted_records(got) == sorted_records(expect)

    def test_null_keys_form_group(self, rng):
        keys = [1, None, 1, None, 2]
        vals = [10, 20, 30, 40, 50]
        out = gb.group_by(
            at.record_batch({"k": keys, "v": vals}), ["k"], [("v", "sum")]
        )
        got = dict(zip(out.to_pydict()["k"], out.to_pydict()["sum_v"]))
        assert got == {1: 40, None: 60, 2: 50}

    def test_multi_key(self, rng):
        n = 300
        a = rand_ints(rng, n, lo=0, hi=4)
        b = rand_ints(rng, n, lo=0, hi=4)
        v = rand_ints(rng, n, lo=0, hi=100)
        out = gb.group_by(
            at.record_batch({"a": a, "b": b, "v": v}), ["a", "b"],
            [("v", "sum"), ("v", "max")]
        )
        df = pd.DataFrame({"a": a, "b": b, "v": v})
        exp = df.groupby(["a", "b"]).agg(sum_v=("v", "sum"), max_v=("v", "max")).reset_index()
        expect = {
            "a": exp["a"].tolist(), "b": exp["b"].tolist(),
            "sum_v": exp["sum_v"].tolist(), "max_v": exp["max_v"].tolist(),
        }
        assert sorted_records(out.to_pydict()) == sorted_records(expect)

    def test_mean_float(self, rng):
        keys = [0, 0, 1, 1, 1]
        vals = [1.0, 2.0, 3.0, None, 5.0]
        out = gb.group_by(
            at.record_batch({"k": keys, "v": vals}), ["k"], [("v", "mean")]
        )
        got = dict(zip(out.to_pydict()["k"], out.to_pydict()["mean_v"]))
        assert got[0] == 1.5 and got[1] == 4.0

    def test_group_by_dict_key(self):
        keys = at.dictionary_encode_host(["x", "y", "x", None, "y", "x"])
        vals = [1, 2, 3, 4, 5, 6]
        out = gb.group_by(
            at.record_batch({"k": keys, "v": vals}), ["k"], [("v", "sum")]
        )
        got = dict(zip(out.to_pydict()["k"], out.to_pydict()["sum_v"]))
        assert got == {"x": 10, "y": 7, None: 4}


class TestHashJoin:
    def test_inner_pk_join_vs_pandas(self, rng):
        nl, nr = 400, 100
        lk = rand_ints(rng, nl, lo=0, hi=150)  # some keys miss
        lv = rand_ints(rng, nl, lo=0, hi=1000)
        rk = list(range(nr))  # unique build keys
        rv = rand_ints(rng, nr, lo=0, hi=1000)
        left = at.record_batch({"k": lk, "lv": lv})
        right = at.record_batch({"k": rk, "rv": rv})
        out, info = jn.hash_join(left, right, ["k"])
        assert not bool(info.duplicates) and not bool(info.overflow)
        dl = pd.DataFrame({"k": lk, "lv": lv})
        dr = pd.DataFrame({"k": rk, "rv": rv})
        exp = dl.merge(dr, on="k", how="inner")
        got = out.to_pydict()
        assert sorted_records(got) == sorted_records(
            {"k": exp["k"].tolist(), "lv": exp["lv"].tolist(), "rv": exp["rv"].tolist()}
        )

    def test_left_join_nulls(self, rng):
        left = at.record_batch({"k": [1, 2, 9, None], "lv": [10, 20, 30, 40]})
        right = at.record_batch({"k": [1, 2, 3], "rv": [100, 200, 300]})
        out, info = jn.hash_join(left, right, ["k"], how="left")
        assert not bool(info.duplicates)
        assert out.to_pydict() == {
            "k": [1, 2, 9, None],
            "lv": [10, 20, 30, 40],
            "rv": [100, 200, None, None],  # no match and NULL-key -> null
        }

    def test_semi_anti(self, rng):
        left = at.record_batch({"k": [1, 2, 3, 4, None]})
        right = at.record_batch({"k": [2, 4, 5]})
        semi, _ = jn.hash_join(left, right, ["k"], how="semi")
        anti, _ = jn.hash_join(left, right, ["k"], how="anti")
        assert semi.to_pydict() == {"k": [2, 4]}
        assert anti.to_pydict() == {"k": [1, 3, None]}  # NULL never matches

    def test_duplicate_build_keys_flagged(self):
        left = at.record_batch({"k": [1]})
        right = at.record_batch({"k": [1, 1], "rv": [5, 6]})
        out, info = jn.hash_join(left, right, ["k"], out_capacity=8)
        assert bool(info.duplicates)
        assert out.to_pydict() == {"k": [1, 1], "rv": [5, 6]}

    def test_multi_column_key(self, rng):
        left = at.record_batch({"a": [1, 1, 2, 2], "b": [1, 2, 1, 2], "lv": [1, 2, 3, 4]})
        right = at.record_batch({"a": [1, 2], "b": [2, 1], "rv": [10, 20]})
        out, info = jn.hash_join(left, right, ["a", "b"])
        assert not bool(info.duplicates)
        assert sorted_records(out.to_pydict()) == sorted_records(
            {"a": [1, 2], "b": [2, 1], "lv": [2, 3], "rv": [10, 20]}
        )

    def test_join_under_jit(self, rng):
        """Whole join pipeline inside one jit."""
        nl, nr = 300, 64
        lk = rand_ints(rng, nl, lo=0, hi=100)
        rk = list(range(nr))
        rv = rand_ints(rng, nr, lo=0, hi=50)
        left = at.record_batch({"k": lk})
        right = at.record_batch({"k": rk, "rv": rv})

        @jax.jit
        def run(l, r):
            return jn.hash_join(l, r, ["k"])

        out, dup = run(left, right)
        exp = pd.DataFrame({"k": lk}).merge(
            pd.DataFrame({"k": rk, "rv": rv}), on="k", how="inner"
        )
        assert sorted_records(out.to_pydict()) == sorted_records(
            {"k": exp["k"].tolist(), "rv": exp["rv"].tolist()}
        )


class TestNMJoin:
    """General N:M join (duplicate build keys emit all pairs)."""

    def test_inner_nm_vs_pandas(self, rng):
        nl, nr = 300, 200
        lk = rand_ints(rng, nl, null_density=0.05, lo=0, hi=40)
        lv = rand_ints(rng, nl, lo=0, hi=1000)
        rk = rand_ints(rng, nr, null_density=0.05, lo=0, hi=40)
        rv = rand_ints(rng, nr, lo=0, hi=1000)
        left = at.record_batch({"k": lk, "lv": lv})
        right = at.record_batch({"k": rk, "rv": rv})
        out, info = jn.hash_join(left, right, ["k"], out_capacity=nl * nr)
        assert not bool(info.overflow)
        # SQL semantics: NULL keys never match (pandas merges NaN==NaN)
        dl = pd.DataFrame({"k": lk, "lv": lv}).dropna(subset=["k"])
        dr = pd.DataFrame({"k": rk, "rv": rv}).dropna(subset=["k"])
        exp = dl.merge(dr, on="k", how="inner")
        got = out.to_pydict()
        assert sorted_records(got) == sorted_records(
            {"k": [int(x) for x in exp["k"]],
             "lv": exp["lv"].tolist(), "rv": exp["rv"].tolist()}
        )

    def test_left_nm_vs_pandas(self, rng):
        lk = [1, 2, 2, None, 9]
        rk = [2, 2, 2, 1]
        rv = [10, 20, 30, 40]
        left = at.record_batch({"k": lk})
        right = at.record_batch({"k": rk, "rv": rv})
        out, info = jn.hash_join(left, right, ["k"], how="left", out_capacity=64)
        got = out.to_pydict()
        exp = pd.DataFrame({"k": lk}).merge(
            pd.DataFrame({"k": rk, "rv": rv}), on="k", how="left"
        )
        expect = {
            "k": [None if pd.isna(x) else int(x) for x in exp["k"]],
            "rv": [None if pd.isna(x) else int(x) for x in exp["rv"]],
        }
        assert sorted_records(got) == sorted_records(expect)

    def test_zipf_skewed_keys(self, rng):
        """Adversarial key distribution: heavy hitters chain in the table."""
        nl, nr = 500, 300
        lk = [int(min(x, 30)) for x in rng.zipf(1.3, nl)]
        rk = [int(min(x, 30)) for x in rng.zipf(1.3, nr)]
        rv = rand_ints(rng, nr, lo=0, hi=100)
        left = at.record_batch({"k": lk})
        right = at.record_batch({"k": rk, "rv": rv})
        out, info = jn.hash_join(left, right, ["k"], out_capacity=nl * nr)
        assert not bool(info.overflow)
        exp = pd.DataFrame({"k": lk}).merge(
            pd.DataFrame({"k": rk, "rv": rv}), on="k"
        )
        got = out.to_pydict()
        assert sorted_records(got) == sorted_records(
            {"k": exp["k"].tolist(), "rv": exp["rv"].tolist()}
        )

    def test_overflow_flag_and_truncation(self):
        left = at.record_batch({"k": [1, 1, 1, 1]})
        right = at.record_batch({"k": [1] * 64, "rv": list(range(64))})
        out, info = jn.hash_join(left, right, ["k"], out_capacity=128)
        assert bool(info.overflow)  # true total = 256 > 128
        assert int(out.length) == 128
        # retry with enough room (capacity+count contract)
        out2, info2 = jn.hash_join(left, right, ["k"], out_capacity=256)
        assert not bool(info2.overflow)
        assert int(out2.length) == 256


class TestAdversarialKeys:
    """Round-3 hardening (verdict weak-#7): pathological key
    distributions must terminate in bounded rounds and stay correct."""

    def test_all_equal_keys_1m(self):
        import numpy as np

        import arrowtpu as at
        from arrowtpu.ops import join as oj

        n = 1 << 20
        keys = np.zeros(n, np.int64)
        build = at.primitive(keys, at.schema.int64, length=n)
        probe = at.primitive(np.zeros(16, np.int64), at.schema.int64,
                             length=16)
        t = oj.build_table([build])
        rep = oj.probe_table(t, [probe])
        got = np.asarray(rep)[:16]
        assert (got >= 0).all()          # every probe matches
        assert bool(t.duplicates)               # duplicate groups detected

    def test_two_hot_values_1m(self, rng):
        import numpy as np

        import arrowtpu as at
        from arrowtpu.ops import join as oj

        n = 1 << 20
        keys = np.where(rng.random(n) < 0.5, 7, 99).astype(np.int64)
        build = at.primitive(keys, at.schema.int64, length=n)
        pk = np.array([7, 99, 1234], np.int64)
        probe = at.primitive(pk, at.schema.int64, length=3)
        t = oj.build_table([build])
        rep = np.asarray(oj.probe_table(t, [probe]))[:3]
        assert rep[0] >= 0 and rep[1] >= 0 and rep[2] == -1

    def test_inner_join_equal_keys_counts(self, rng):
        import numpy as np

        import arrowtpu as at
        from arrowtpu import ops

        nb, npr = 1000, 500
        left = at.record_batch({
            "k": at.primitive(np.full(nb, 3, np.int64), at.schema.int64,
                              length=nb)})
        right = at.record_batch({
            "k": at.primitive(np.full(npr, 3, np.int64), at.schema.int64,
                              length=npr)})
        out, info = ops.hash_join(left, right, ["k"],
                                  out_capacity=nb * npr)
        assert int(out.length) == nb * npr
        assert not bool(info.overflow)


class TestDenseGroupBy:
    """Dense-range fast path (perfect-hash aggregate) vs the sort
    pipeline oracle.  On the CPU mesh DENSE_GROUPBY_BUCKETS=32
    (conftest), so ranges < 32 take the dense branch at runtime."""

    @pytest.mark.parametrize("nullkeys", [False, True])
    @pytest.mark.parametrize("nullvals", [False, True])
    def test_dense_matches_sort_pipeline(self, rng, nullkeys, nullvals):
        from arrowtpu.ops import groupby as gb

        n = 20_000
        keys = rng.integers(-10, 15, n).astype(np.int32)  # range 25 < 32
        vals64 = rng.integers(-2**40, 2**40, n)
        vals32 = rng.integers(-1000, 1000, n).astype(np.int32)
        kval = rng.random(n) > 0.1 if nullkeys else None
        vval = rng.random(n) > 0.1 if nullvals else None
        b = at.record_batch({
            "k": at.primitive(
                keys, at.schema.int32, length=n,
                validity=at.bitmap.from_numpy_bools(kval)
                if nullkeys else None),
            "v": at.primitive(
                vals64, at.schema.int64, length=n,
                validity=at.bitmap.from_numpy_bools(vval)
                if nullvals else None),
            "w": at.primitive(
                vals32, at.schema.int32, length=n,
                validity=at.bitmap.from_numpy_bools(vval)
                if nullvals else None),
        })
        aggs = [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"),
                ("v", "mean"), ("w", "sum"), ("w", "min"), ("w", "mean")]
        got = gb.group_by(b, ["k"], aggs)
        want = gb._sort_group_by(b, ["k"], aggs)
        assert tuple(got.schema.names) == tuple(want.schema.names)
        for f in got.schema.fields:
            assert got[f.name].to_pylist() == want[f.name].to_pylist(), \
                f.name

    def test_wide_range_takes_sort_branch(self, rng):
        from arrowtpu.ops import groupby as gb

        n = 5_000
        keys = rng.integers(0, 10**6, n).astype(np.int32)
        vals = rng.integers(-100, 100, n)
        b = at.record_batch({
            "k": at.primitive(keys, at.schema.int32, length=n),
            "v": at.primitive(vals, at.schema.int64, length=n),
        })
        got = gb.group_by(b, ["k"], [("v", "sum")])
        uk = np.unique(keys)
        sums = np.zeros(uk.size, np.int64)
        np.add.at(sums, np.searchsorted(uk, keys), vals)
        gk = np.asarray(got["k"].to_pylist())
        gs = np.asarray(got["sum_v"].to_pylist())
        o = np.argsort(gk)
        assert np.array_equal(gk[o], uk)
        assert np.array_equal(gs[o], sums)

    def test_uint_key_dense(self, rng):
        from arrowtpu.ops import groupby as gb

        n = 10_000
        keys = rng.integers(2**31, 2**31 + 20, n).astype(np.uint32)
        vals = rng.integers(0, 100, n).astype(np.int32)
        b = at.record_batch({
            "k": at.primitive(keys, at.schema.uint32, length=n),
            "v": at.primitive(vals, at.schema.int32, length=n),
        })
        got = gb.group_by(b, ["k"], [("v", "sum"), ("v", "count")])
        want = gb._sort_group_by(b, ["k"], [("v", "sum"), ("v", "count")])
        for f in got.schema.fields:
            assert got[f.name].to_pylist() == want[f.name].to_pylist(), \
                f.name


class TestPlanGroupBy:
    """plan_group_by must agree with group_by on every strategy tier."""

    @pytest.mark.parametrize("card,vrange", [
        (10, 100),            # half-bucket narrow tier
        (10, 10**12),         # half-bucket chunked tier
        (200, 100),           # full-bucket narrow tier (DENSE=32 in CI
                              # makes this the sort tier there)
        (100000, 100),        # sort tier
    ])
    def test_plan_matches_group_by(self, card, vrange):
        import numpy as np

        from arrowtpu.ops import groupby

        rng = np.random.default_rng(card + vrange % 97)
        n = 4096
        keys = rng.integers(0, card, n, dtype=np.int32)
        vals = rng.integers(-vrange, vrange, n)
        b = at.record_batch({
            "k": at.primitive(keys, at.schema.int32, length=n),
            "v": at.primitive(vals, at.schema.int64, length=n),
        })
        aggs = [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"),
                ("v", "mean")]
        want = groupby.group_by(b, ["k"], aggs)
        plan = groupby.plan_group_by(b, ["k"], aggs)
        got = plan(b)
        worder = np.argsort(np.asarray(want["k"].to_pylist()))
        gorder = np.argsort(np.asarray(got["k"].to_pylist()))
        for name in ("k", "sum_v", "count_v", "min_v", "max_v", "mean_v"):
            wv = np.asarray(want[name].to_pylist())[worder]
            gv = np.asarray(got[name].to_pylist())[gorder]
            assert np.array_equal(wv, gv), name

    def test_plan_narrow_sum_bias_offsets(self):
        """Sort-tier plan-time narrow sums (round-5): a wide column whose
        range fits 16 bits but sits at a huge offset must bias exactly
        (sum = narrow biased sum + cnt * vmin mod 2**64)."""
        import numpy as np

        from arrowtpu.ops import groupby

        rng = np.random.default_rng(11)
        n = 4096
        keys = rng.integers(0, 700, n, dtype=np.int32)  # sort tier
        for base in (10**15, -(10**15), -250):
            vals = base + rng.integers(0, 500, n)
            b = at.record_batch({
                "k": at.primitive(keys, at.schema.int32, length=n),
                "v": at.primitive(vals, at.schema.int64, length=n),
            })
            aggs = [("v", "sum"), ("v", "mean"), ("v", "count")]
            want = groupby.group_by(b, ["k"], aggs)
            got = groupby.plan_group_by(b, ["k"], aggs)(b)
            worder = np.argsort(np.asarray(want["k"].to_pylist()))
            gorder = np.argsort(np.asarray(got["k"].to_pylist()))
            for name in ("k", "sum_v", "mean_v", "count_v"):
                wv = np.asarray(want[name].to_pylist())[worder]
                gv = np.asarray(got[name].to_pylist())[gorder]
                assert np.array_equal(wv, gv), (name, base)

    def test_plan_narrow_sum_u64_and_nullable_values(self):
        import numpy as np

        from arrowtpu.ops import groupby

        rng = np.random.default_rng(13)
        n = 4096
        keys = rng.integers(0, 900, n, dtype=np.int32)
        vals = (2**63) + rng.integers(0, 60000, n).astype(np.uint64)
        vvalid = rng.random(n) > 0.3
        b = at.record_batch({
            "k": at.primitive(keys, at.schema.int32, length=n),
            "v": at.primitive(vals, at.schema.uint64,
                              validity=at.bitmap.from_numpy_bools(vvalid),
                              length=n),
        })
        aggs = [("v", "sum"), ("v", "count")]
        want = groupby.group_by(b, ["k"], aggs)
        got = groupby.plan_group_by(b, ["k"], aggs)(b)
        assert sorted(zip(want["k"].to_pylist(),
                          want["sum_v"].to_pylist(),
                          want["count_v"].to_pylist())) == \
            sorted(zip(got["k"].to_pylist(),
                       got["sum_v"].to_pylist(),
                       got["count_v"].to_pylist()))

    def test_plan_with_nullable_key_and_values(self):
        import numpy as np

        from arrowtpu.ops import groupby

        rng = np.random.default_rng(7)
        n = 2048
        keys = rng.integers(0, 6, n, dtype=np.int32)
        kvalid = rng.random(n) > 0.2
        vals = rng.integers(-50, 50, n)
        vvalid = rng.random(n) > 0.3
        b = at.record_batch({
            "k": at.primitive(keys, at.schema.int32,
                              validity=at.bitmap.from_numpy_bools(kvalid),
                              length=n),
            "v": at.primitive(vals, at.schema.int64,
                              validity=at.bitmap.from_numpy_bools(vvalid),
                              length=n),
        })
        aggs = [("v", "sum"), ("v", "count"), ("v", "min")]
        want = groupby.group_by(b, ["k"], aggs)
        got = groupby.plan_group_by(b, ["k"], aggs)(b)
        assert sorted(map(repr, zip(want["k"].to_pylist(),
                                    want["sum_v"].to_pylist(),
                                    want["count_v"].to_pylist(),
                                    want["min_v"].to_pylist()))) == \
            sorted(map(repr, zip(got["k"].to_pylist(),
                                 got["sum_v"].to_pylist(),
                                 got["count_v"].to_pylist(),
                                 got["min_v"].to_pylist())))
