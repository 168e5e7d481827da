"""Benchmark driver: single-chip BASELINE configs vs the empirically
measured HBM roofline.

Configs (BASELINE.md):
  1. filter: SELECT on one Int64 column w/ 10% nulls, 8M rows (headline)
  2. fused predicate: (a > b) AND (c % 7 == 0) AND (d <= 50), Int64 columns
     with null propagation (Kleene)
  3. lexsort (Int32, Float64, dict-Utf8) via row encoding
  4. hash aggregate: GROUP BY low/high cardinality, SUM/COUNT/MIN

Prints ONE JSON line (headline = config 1):
  {"metric": ..., "value": rows/s, "unit": "rows/s", "vs_baseline": ...,
   "detail": {... all configs ...}}
vs_baseline = (config-1 fraction of HBM roofline) / 0.70, i.e. >= 1.0 meets
the >=70%-of-roofline BASELINE target.

Timing methodology (hard-won; see round-2 notes): the device tunnel's
dispatch is asynchronous, its block_until_ready can return early, and a
large device_get permanently degrades per-dispatch latency in-process.
The only artifact-immune measurement is K data-dependent iterations run
by jax.lax.fori_loop INSIDE one dispatch, bracketed by a one-element
readback, with the per-iteration time taken as the median slope between
two K values — per-dispatch overhead and readback cost cancel exactly.
Correctness checks (which device_get whole arrays) run AFTER timing.

Accounting: each config declares its semantic bytes/row (one read of the
inputs + one write of the outputs the operation fundamentally requires);
achieved GB/s = rows/s * bytes_per_row.  Extra passes the implementation
makes count against it, honestly lowering the reported fraction.
"""

import argparse
import json
import time

import numpy as np


def _enable_cache():
    import jax

    # persistent XLA compile cache: repeat bench runs (and the driver's
    # end-of-round run) skip the expensive tunnel compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _sync(out):
    import jax

    leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ravel")][0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def loop_time(step, x, k_lo=4, k_hi=None, reps=5, target_s=0.05):
    """Seconds per step(): fori_loop-chained inside ONE dispatch, median
    slope between k_lo and k_hi iterations (see module docstring).

    Robustness (round-3, validated against jax.profiler device traces):
    the tunnel's per-dispatch+sync overhead is ~25 ms with ±1-2 ms jitter,
    so the iteration-count spread must put the SIGNAL (extra iterations'
    device time) well above that jitter.  When k_hi is not given it is
    chosen adaptively so the spread covers ~target_s seconds of device
    work (min spread 8, max 512).  Runs interleave lo,hi,lo,hi and the
    slope uses per-k medians, immune to one-sided outliers."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(v, k):
        return jax.lax.fori_loop(0, k, lambda i, s: step(s), v)

    def run(k):
        t0 = time.perf_counter()
        y = loop(x, jnp.int32(k))
        _sync(y)
        return time.perf_counter() - t0

    run(2)  # warm + compile
    if k_hi is None:
        med3 = lambda k: sorted(run(k) for _ in range(3))[1]
        est = max((med3(k_lo + 8) - med3(k_lo)) / 8, 1e-6)
        spread = int(min(max(target_s / est, 8), 512))
        k_hi = k_lo + spread
    run(k_lo), run(k_hi)  # settle both program shapes
    los, his = [], []
    for _ in range(reps):
        los.append(run(k_lo))
        his.append(run(k_hi))
    med = lambda v: sorted(v)[len(v) // 2]
    return (med(his) - med(los)) / (k_hi - k_lo)


def measure_roofline_gbs():
    """Empirical HBM bandwidth: large elementwise pass (read+write).

    Median of 3 adaptive measurements — single short measurements through
    the tunnel have produced 109..1271 GB/s for the same device; the
    fraction denominators need a stable number."""
    import jax.numpy as jnp

    n = 128 * 1024 * 1024  # 512 MB read + 512 MB write
    x = jnp.arange(n, dtype=jnp.int32)
    samples = sorted(
        loop_time(lambda v: v + 1, x, k_lo=2, reps=5, target_s=0.1)
        for _ in range(3))
    return (n * 4 * 2) / samples[1] / 1e9


def _int64_col(rng, n, lo, hi, null_density):
    import arrowtpu as at

    vals = rng.integers(lo, hi, n)
    validity = None
    if null_density > 0:
        validity = at.bitmap.from_numpy_bools(rng.random(n) > null_density)
    return at.primitive(vals, at.schema.int64, validity=validity, length=n), vals


def config1_filter(n=8_000_000):
    """filter on Int64 with 10% nulls; Pallas compaction path on TPU."""
    import dataclasses as dc

    import jax

    import arrowtpu as at
    from arrowtpu import ops

    rng = np.random.default_rng(0)
    vals = rng.integers(-1000, 1000, n)
    valid = rng.random(n) > 0.10
    c = at.primitive(
        vals, at.schema.int64,
        validity=at.bitmap.from_numpy_bools(valid), length=n,
    )

    def step(col):
        out = ops.filter_(col, ops.gt(col, 0))
        # keep the loop carry structurally identical (the validity-skip
        # fast path drops the output bitmap; re-attach without compute)
        return dc.replace(out, validity=col.validity, length=col.length)

    dt = loop_time(step, c)

    # correctness check AFTER timing (device_get degrades the process)
    from arrowtpu.core import wide
    filtered = ops.filter_(c, ops.gt(c, 0))
    got = wide.join_numpy(np.asarray(jax.device_get(filtered.values)), np.int64)
    want = vals[valid & (vals > 0)]
    assert int(filtered.length) == want.size, "config1: count mismatch"
    assert np.array_equal(got[: want.size], want), "config1: values mismatch"
    assert not got[want.size:].any(), "config1: padding not zeroed"
    assert filtered.validity is None, "config1: validity-skip not applied"

    rows_per_s = n / dt
    # 8B value read + 8B kept-value write (capacity write under the padding
    # contract) + predicate/validity/mask bookkeeping
    bytes_per_row = 8 + 8 + 4.5
    return {
        "rows_per_s": rows_per_s,
        "ms": dt * 1e3,
        "bytes_per_row": bytes_per_row,
        "achieved_GBps": rows_per_s * bytes_per_row / 1e9,
    }


def config2_fused_predicate(n=8_000_000):
    """(a > b) AND (c % 7 == 0) AND (d <= 50) with Kleene null propagation."""
    import dataclasses as dc

    import jax

    from arrowtpu import ops

    rng = np.random.default_rng(1)
    a, av = _int64_col(rng, n, -10**6, 10**6, 0.10)
    b, bv = _int64_col(rng, n, -10**6, 10**6, 0.10)
    c, cv = _int64_col(rng, n, 0, 10**6, 0.05)
    d, dv = _int64_col(rng, n, 0, 100, 0.0)

    def predicate(cols):
        a, b, c, d = cols
        p = ops.and_kleene(ops.gt(a, b), ops.eq(ops.rem(c, 7), 0))
        return ops.and_kleene(p, ops.lt_eq(d, 50))

    def step(cols):
        import jax.numpy as jnp

        from arrowtpu.core import bitmap as bm

        a, b, c, d = cols
        p = predicate(cols)
        # fold the mask's popcount back into `a` so the loop body is
        # data-dependent and cannot be constant-folded or DCE'd: the
        # popcount is < 2^30 at runtime, so the bump is always 0, but XLA
        # cannot prove that through the reduction (round-2 verdict: the
        # old `x & 0` carry folded to zero and the whole body was DCE'd)
        cnt = bm.count_set_bits(p.values)
        bump = (cnt >> 30).astype(jnp.uint32)
        return (dc.replace(a, values=a.values + bump), b, c, d)

    dt = loop_time(step, (a, b, c, d))

    out = jax.jit(predicate)((a, b, c, d))
    got = out.to_pylist()
    av_ok = np.asarray(jax.device_get((a.valid_bool())))
    bv_ok = np.asarray(jax.device_get((b.valid_bool())))
    cv_ok = np.asarray(jax.device_get((c.valid_bool())))

    def kleene_and(x, y):
        if x is False or y is False:
            return False
        if x is None or y is None:
            return None
        return True

    for i in rng.integers(0, n, 200):
        # bool(): numpy np.False_ fails the `is False` identity test above
        t1 = bool(av[i] > bv[i]) if (av_ok[i] and bv_ok[i]) else None
        t2 = bool(cv[i] % 7 == 0) if cv_ok[i] else None
        t3 = bool(dv[i] <= 50)
        want = kleene_and(kleene_and(t1, t2), t3)
        assert got[i] == want, f"config2 mismatch at {i}: {got[i]} != {want}"

    rows_per_s = n / dt
    bytes_per_row = 4 * 8 + 4 * 0.125 + 0.25  # 4 col reads + bitmaps + mask
    return {
        "rows_per_s": rows_per_s,
        "ms": dt * 1e3,
        "bytes_per_row": bytes_per_row,
        "achieved_GBps": rows_per_s * bytes_per_row / 1e9,
    }


def config3_lexsort(n=100_000_000):
    """lexsort_to_indices on (Int32, Float64, dict-Utf8) via row encoding
    at the BASELINE-specified 100M rows (round-3 verdict weak #3)."""
    import dataclasses as d_

    import jax
    import jax.numpy as jnp

    import arrowtpu as at
    from arrowtpu import ops, schema as st
    from arrowtpu.core import column as cc

    rng = np.random.default_rng(2)
    i32 = rng.integers(-100, 100, n, dtype=np.int32)  # narrow: forces ties
    f64 = np.round(rng.standard_normal(n), 2)
    keys = rng.integers(0, 1000, n, dtype=np.int32)
    # UNSORTED dictionary values: ranks are genuinely computed by the
    # interning builder, not assumed equal to indices (verdict weak #3)
    words = [f"w{i:03d}" for i in rng.permutation(1000)]

    c1 = at.primitive(i32, at.schema.int32, length=n)
    c2 = at.primitive(f64, at.schema.float64, length=n)
    dict_proto = cc.dictionary_encode_host(
        words, st.Dictionary(st.int32, st.utf8))
    values, ranks = dict_proto.values, dict_proto.value_ranks
    dcol = cc.DictionaryColumn(
        at.primitive(keys, at.schema.int32, length=n),
        values,
        ranks,
        st.Dictionary(st.int32, st.utf8),
    )
    # oracle key: rank of each row's word under the true string order
    rank_np = np.asarray(jax.device_get(ranks))
    keyrank = rank_np[keys]

    def dosort(cols):
        c1, c2, dcol = cols
        idx = ops.lexsort_to_indices([c1, c2, dcol])
        # indices are nonnegative at runtime, so the bump is 0, but XLA
        # cannot fold a shift of a sort output (anti-DCE carry)
        bump = (idx.values[0] >> 31).astype(c1.values.dtype)
        return (d_.replace(c1, values=c1.values + bump), c2, dcol), idx

    def step(s):
        return dosort(s[0])

    idx0 = jax.jit(lambda cols: dosort(cols)[1])((c1, c2, dcol))
    dt = loop_time(step, ((c1, c2, dcol), idx0), k_lo=1, reps=3)

    got = np.asarray(jax.device_get(idx0.values))[:n]
    # TOTAL-ORDER oracle (reference arrow-row total_cmp semantics,
    # arrow-row/src/fixed.rs:118: -NaN < -inf < ... < -0 < +0 < ... <
    # +NaN): monotone map of f64 bits to uint64, then np.lexsort.
    # np.lexsort treats -0.0 == +0.0 and would reject the engine's
    # (correct) -0.0 < +0.0 ordering — round-2 verdict weak-#2.
    ub = f64.view(np.uint64)
    f64key = np.where(ub >> np.uint64(63) == 0,
                      ub | np.uint64(0x8000000000000000), ~ub)
    want = np.lexsort((keyrank, f64key, i32))  # last key = primary in numpy
    if not np.array_equal(got, want):
        # ours is stable, so exact equality is required
        raise AssertionError("config3: lexsort mismatch vs numpy")

    rows_per_s = n / dt
    bytes_per_row = 4 + 8 + 4 + 4  # read 3 key columns + write index vector
    return {
        "rows_per_s": rows_per_s,
        "ms": dt * 1e3,
        "rows": n,
        "bytes_per_row": bytes_per_row,
        "achieved_GBps": rows_per_s * bytes_per_row / 1e9,
    }


def config4_hash_agg(n=8_000_000):
    """GROUP BY (low and high cardinality) + SUM/COUNT/MIN.

    Uses the engine's plan-time adaptive path (groupby.plan_group_by):
    one eager statistics probe picks the statically specialized kernel
    (narrow-biased sums + half buckets for this data), then the timed
    loop runs the planned executor — the planner-chooses-strategy shape
    real engines use, and the only way to get specialization on TPU,
    where wrapping the 256-bucket reduction graphs in lax.cond/switch
    de-optimizes them ~3x (PERF.md round-5 notes)."""
    import dataclasses as dcl

    import jax

    import arrowtpu as at
    from arrowtpu.core.batch import RecordBatch
    from arrowtpu.ops import groupby

    out = {}
    for label, cardinality in (("low_card", 100), ("high_card", 1_000_000)):
        rng = np.random.default_rng(3)
        keys = rng.integers(0, cardinality, n, dtype=np.int32)
        vals = rng.integers(-1000, 1000, n)
        b = at.record_batch({
            "k": at.primitive(keys, at.schema.int32, length=n),
            "v": at.primitive(vals, at.schema.int64, length=n),
        })

        agg = groupby.plan_group_by(
            b, ["k"], [("v", "sum"), ("v", "count"), ("v", "min")])

        def step(b):
            import jax.numpy as jnp

            res = agg(b)
            v = b["v"]
            # anti-DCE/anti-LICM carry: fold VALUE-dependent outputs (sum
            # and min limbs) back into v, so no aggregation is loop
            # invariant (round-3 fix: a count-only carry let XLA hoist
            # the whole body — counts depend only on the unchanged keys).
            # |sum| < 2^33 and |min| < 2^33, so ~hi(limb) >> 8 is 0 at
            # runtime but unprovable at compile time.
            def habs(limbs0):
                hi = limbs0[1]
                neg = (hi >> 31) != 0
                return jnp.where(neg, ~hi, hi) >> 8

            bump = (habs(res["sum_v"].values[0])
                    | habs(res["min_v"].values[0])).astype(jnp.uint32)
            v2 = dcl.replace(v, values=v.values + bump)
            cols = tuple(v2 if c is v else c for c in b.columns)
            return RecordBatch(b.schema, cols)

        dt = loop_time(step, b, k_lo=1, reps=3)

        # correctness vs numpy (sum per key), after timing
        res = jax.jit(agg)(b)
        got_k = np.asarray(res["k"].to_pylist())
        got_s = np.asarray(res["sum_v"].to_pylist())
        order = np.argsort(got_k)
        uk = np.unique(keys)
        sums = np.zeros(uk.size, np.int64)
        np.add.at(sums, np.searchsorted(uk, keys), vals)
        assert np.array_equal(np.sort(got_k), uk), f"config4 {label}: keys"
        assert np.array_equal(got_s[order], sums), f"config4 {label}: sums"

        rows_per_s = n / dt
        bytes_per_row = 4 + 8 + 0.1  # key read + value read + small output
        out[label] = {
            "rows_per_s": round(rows_per_s, 1),
            "ms": round(dt * 1e3, 3),
            "cardinality": cardinality,
            "bytes_per_row": bytes_per_row,
            "achieved_GBps": round(rows_per_s * bytes_per_row / 1e9, 1),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4", help="comma list of 1..4")
    args = ap.parse_args()
    which = set(int(x) for x in args.configs.split(","))

    import sys

    _enable_cache()
    t00 = time.time()
    roofline = measure_roofline_gbs()
    print(f"[bench] roofline {roofline:.0f} GB/s ({time.time()-t00:.0f}s)",
          file=sys.stderr, flush=True)
    detail = {"empirical_roofline_GBps": round(roofline, 1)}

    runners = {1: config1_filter, 2: config2_fused_predicate,
               3: config3_lexsort, 4: config4_hash_agg}
    for i in sorted(which):
        try:
            t0 = time.time()
            print(f"[bench] config{i} start", file=sys.stderr, flush=True)
            r = runners[i]()
            print(f"[bench] config{i} done ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
            if i == 4:
                for sub in r.values():
                    sub["roofline_fraction"] = round(
                        sub["achieved_GBps"] / roofline, 3)
            else:
                r["roofline_fraction"] = round(r["achieved_GBps"] / roofline, 3)
                for k in ("rows_per_s", "ms", "achieved_GBps"):
                    r[k] = round(r[k], 3 if k == "ms" else 1)
            detail[f"config{i}"] = r
        except Exception as e:  # pragma: no cover
            detail[f"config{i}"] = {"error": f"{type(e).__name__}: {e}"}

    c1 = detail.get("config1", {})
    frac = c1.get("roofline_fraction", 0.0) or 0.0
    print(json.dumps({
        "metric": "filter8M_int64_rows_per_s",
        "value": c1.get("rows_per_s", 0.0),
        "unit": "rows/s",
        "vs_baseline": round(frac / 0.70, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
