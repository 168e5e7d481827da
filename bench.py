"""Benchmark driver: BASELINE config 1 (filter on Int64 w/ 10% nulls,
8M rows) against the chip's empirically measured HBM roofline.

Prints ONE JSON line:
  {"metric": ..., "value": rows/s, "unit": "rows/s", "vs_baseline": ...}
vs_baseline = (achieved fraction of HBM roofline) / 0.70, i.e. >= 1.0
meets the BASELINE target of >=70% of roofline for the operator.

Timing methodology: on this platform block_until_ready() returns before
the device finishes (async tunnel dispatch), so we time K data-dependent
dispatches bracketed by a host readback and take the slope (K2-K1)/(n2-n1).
"""

import json
import time

import numpy as np


def _chain_time(f, x, k_lo=3, k_hi=13, reps=3):
    """Median per-op seconds via dependent-dispatch chaining."""

    def run(k):
        ts = []
        for _ in range(reps):
            y = x
            t0 = time.perf_counter()
            for _ in range(k):
                y = f(y)
            _sync(y)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[reps // 2]

    return (run(k_hi) - run(k_lo)) / (k_hi - k_lo)


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def measure_roofline_gbs():
    """Empirical HBM bandwidth: large elementwise pass (read+write) on
    native 32-bit lanes."""
    import jax
    import jax.numpy as jnp

    n = 128 * 1024 * 1024  # 512 MB read + 512 MB write
    x = jnp.arange(n, dtype=jnp.int32)
    f = jax.jit(lambda v: v + 1)
    dt = _chain_time(f, x)
    return (n * 4 * 2) / dt / 1e9


def main():
    import jax

    import arrowtpu as at
    from arrowtpu import ops

    rng = np.random.default_rng(0)
    n = 8_000_000
    vals = rng.integers(-1000, 1000, n)
    valid = rng.random(n) > 0.10
    c = at.primitive(
        vals, at.schema.int64,
        validity=at.bitmap.from_numpy_bools(valid), length=n,
    )

    @jax.jit
    def pipeline(col):
        out = ops.filter_(col, ops.gt(col, 0))
        # keep the chain data-dependent across dispatches
        return out.with_length(col.length)

    dt = _chain_time(pipeline, c)
    rows_per_s = n / dt

    # bytes touched per row: 8B limb read + 8B limb write + planes/bitmap
    bytes_per_row = 8 + 8 + 4.5
    achieved_gbs = rows_per_s * bytes_per_row / 1e9
    roofline_gbs = measure_roofline_gbs()
    frac = achieved_gbs / roofline_gbs
    vs_baseline = frac / 0.70

    print(json.dumps({
        "metric": "filter8M_int64_rows_per_s",
        "value": round(rows_per_s, 0),
        "unit": "rows/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "ms_per_filter": round(dt * 1e3, 3),
            "achieved_GBps": round(achieved_gbs, 1),
            "empirical_roofline_GBps": round(roofline_gbs, 1),
            "roofline_fraction": round(frac, 3),
        },
    }))


if __name__ == "__main__":
    main()
