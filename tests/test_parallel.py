"""M5 distributed layer tests on the virtual 8-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8).

The 'cluster' here is the emulated mesh — the analogue of the reference's
in-process Flight test servers (arrow-flight/tests/common/server.rs)."""

import jax
import numpy as np
import pandas as pd
import pytest

import arrowtpu as at
from arrowtpu import parallel
from arrowtpu.ops import join as jn

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    return parallel.make_mesh(NDEV)


def make_shards(rng, n_per_shard, key_hi=50, null_density=0.0, names=("k", "v")):
    shards = []
    all_rows = {n: [] for n in names}
    for _ in range(NDEV):
        data = {}
        for nm in names:
            vals = [
                None if rng.random() < null_density else int(x)
                for x in rng.integers(0, key_hi, n_per_shard)
            ]
            data[nm] = vals
            all_rows[nm] += vals
        shards.append(at.record_batch(data))
    return shards, all_rows


def gathered_pydict(stacked_out):
    outs = parallel.unstack_batches(stacked_out)
    merged = None
    for b in outs:
        d = b.to_pydict()
        if merged is None:
            merged = {k: list(v) for k, v in d.items()}
        else:
            for k in merged:
                merged[k] += d[k]
    return merged


def sorted_records(d):
    keys = list(d.keys())
    rows = list(zip(*[d[k] for k in keys]))
    return sorted(rows, key=lambda r: tuple((x is None, x) for x in r))


class TestExchange:
    def test_rows_partition_by_key(self, rng, mesh):
        shards, all_rows = make_shards(rng, 96)
        stacked = parallel.stack_batches(shards)

        def body(local):
            return parallel.exchange(
                local, ["k"], axis_name="d", num_partitions=NDEV
            )

        out = parallel.shard_map_batches(body, mesh, stacked)
        outs = parallel.unstack_batches(out)
        # every row lands somewhere, and all copies of a key co-locate
        got_k, got_v = [], []
        key_home = {}
        for di, b in enumerate(outs):
            d = b.to_pydict()
            got_k += d["k"]
            got_v += d["v"]
            for k in set(d["k"]):
                assert key_home.setdefault(k, di) == di, f"key {k} split"
        assert sorted(got_k) == sorted(all_rows["k"])
        assert sorted(got_v) == sorted(all_rows["v"])


class TestDistributedJoin:
    def test_inner_join_matches_pandas(self, rng, mesh):
        left_shards, left_all = make_shards(rng, 64, key_hi=100, names=("k", "lv"))
        # unique build keys spread over shards
        rk = list(range(80))
        rng.shuffle(rk)
        right_shards = []
        right_all = {"k": [], "rv": []}
        for i in range(NDEV):
            ks = rk[i * 10 : (i + 1) * 10]
            vs = [int(x) for x in rng.integers(0, 1000, len(ks))]
            right_all["k"] += ks
            right_all["rv"] += vs
            right_shards.append(at.record_batch({"k": ks, "rv": vs}))

        sl = parallel.stack_batches(left_shards)
        sr = parallel.stack_batches(right_shards)

        def body(l, r):
            out, dup = parallel.distributed_hash_join(
                l, r, ["k"], num_partitions=NDEV, axis_name="d"
            )
            return out

        out = parallel.shard_map_batches(body, mesh, sl, sr)
        got = gathered_pydict(out)
        exp = pd.DataFrame(left_all).merge(pd.DataFrame(right_all), on="k")
        expect = {c: exp[c].tolist() for c in ("k", "lv", "rv")}
        assert sorted_records(got) == sorted_records(expect)


class TestDistributedGroupBy:
    def test_sum_count_min_matches_pandas(self, rng, mesh):
        shards, all_rows = make_shards(rng, 96, key_hi=20, null_density=0.1)
        stacked = parallel.stack_batches(shards)

        def body(local):
            return parallel.distributed_group_by(
                local, ["k"], [("v", "sum"), ("v", "count"), ("v", "min")],
                num_partitions=NDEV, axis_name="d",
            )

        out = parallel.shard_map_batches(body, mesh, stacked)
        got = gathered_pydict(out)
        df = pd.DataFrame(
            {"k": all_rows["k"], "v": pd.array(all_rows["v"], dtype="Int64")}
        )
        exp = df.groupby("k", dropna=False).agg(
            sum_v=("v", lambda s: s.sum(min_count=1)),
            count_v=("v", "count"),
            min_v=("v", "min"),
        ).reset_index()
        expect = {
            "k": [None if pd.isna(x) else int(x) for x in exp["k"]],
            "sum_v": [None if pd.isna(x) else int(x) for x in exp["sum_v"]],
            "count_v": exp["count_v"].astype(int).tolist(),
            "min_v": [None if pd.isna(x) else int(x) for x in exp["min_v"]],
        }
        # drop groups with zero rows on some device (empty partials merge fine)
        assert sorted_records(got) == sorted_records(expect)


class TestExchangeStrings:
    def test_string_columns_shuffle(self, rng, mesh):
        words = ["alpha", "b", "gamma-very-long-string-over-twelve", None,
                 "delta", "eps"]
        shards = []
        all_k, all_s = [], []
        for _ in range(NDEV):
            ks = [int(x) for x in rng.integers(0, 30, 64)]
            ss = [words[i % len(words)] for i in rng.integers(0, len(words), 64)]
            all_k += ks
            all_s += ss
            shards.append(at.record_batch({"k": ks, "s": at.string_view(ss)}))
        stacked = parallel.stack_batches(shards)

        def body(local):
            return parallel.exchange(
                local, ["k"], axis_name="d", num_partitions=NDEV
            )

        out = parallel.shard_map_batches(body, mesh, stacked)
        got = gathered_pydict(out)
        assert sorted_records(got) == sorted_records({"k": all_k, "s": all_s})


class TestSkewJoin:
    def test_hot_key_broadcast_matches_pandas(self, rng, mesh):
        # one key carries ~half of all probe rows: the skew path must
        # broadcast its build rows instead of flooding one device
        left_shards, left_all = [], {"k": [], "lv": []}
        for _ in range(NDEV):
            ks = [7 if rng.random() < 0.5 else int(rng.integers(0, 60)) for _ in range(96)]
            vs = [int(x) for x in rng.integers(0, 1000, 96)]
            left_all["k"] += ks
            left_all["lv"] += vs
            left_shards.append(at.record_batch({"k": ks, "lv": vs}))
        rk = list(range(60))
        right_shards, right_all = [], {"k": [], "rv": []}
        for i in range(NDEV):
            ks = rk[i * 7 : (i + 1) * 7]
            vs = [int(x) for x in rng.integers(0, 1000, len(ks))]
            right_all["k"] += ks
            right_all["rv"] += vs
            right_shards.append(at.record_batch({"k": ks, "rv": vs}))

        sl = parallel.stack_batches(left_shards)
        sr = parallel.stack_batches(right_shards)

        def body(l, r):
            out, info = parallel.distributed_hash_join(
                l, r, ["k"], num_partitions=NDEV, axis_name="d",
                skew_threshold=0.05, out_capacity=2048,
            )
            return out, info.overflow

        out, ovf = parallel.shard_map_batches(body, mesh, sl, sr)
        assert not bool(np.asarray(ovf).any())
        got = gathered_pydict(out)
        exp = pd.DataFrame(left_all).merge(pd.DataFrame(right_all), on="k")
        expect = {c: exp[c].tolist() for c in ("k", "lv", "rv")}
        assert sorted_records(got) == sorted_records(expect)


class TestChunkedProbe:
    def test_probe_chunks_same_result(self, rng, mesh):
        left_shards, left_all = make_shards(rng, 96, key_hi=80, names=("k", "lv"))
        rk = list(range(80))
        rng.shuffle(rk)
        right_shards, right_all = [], {"k": [], "rv": []}
        for i in range(NDEV):
            ks = rk[i * 10 : (i + 1) * 10]
            vs = [int(x) for x in rng.integers(0, 1000, len(ks))]
            right_all["k"] += ks
            right_all["rv"] += vs
            right_shards.append(at.record_batch({"k": ks, "rv": vs}))
        sl = parallel.stack_batches(left_shards)
        sr = parallel.stack_batches(right_shards)

        def body(l, r):
            out, _ = parallel.distributed_hash_join(
                l, r, ["k"], num_partitions=NDEV, axis_name="d",
                probe_chunks=4,
            )
            return out

        out = parallel.shard_map_batches(body, mesh, sl, sr)
        got = gathered_pydict(out)
        exp = pd.DataFrame(left_all).merge(pd.DataFrame(right_all), on="k")
        expect = {c: exp[c].tolist() for c in ("k", "lv", "rv")}
        assert sorted_records(got) == sorted_records(expect)
