"""Per-component profile of BASELINE config 2 (fused predicate) on
device: which op chain breaks fusion (measured 7.87 ms round 3 = ~19
roofline passes for what should be ~1)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import loop_time, _enable_cache, _int64_col  # noqa: E402

_enable_cache()

import dataclasses as dc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arrowtpu import ops  # noqa: E402
from arrowtpu.core import bitmap as bm  # noqa: E402


def main():
    n = 8_000_000
    rng = np.random.default_rng(1)
    a, _ = _int64_col(rng, n, -10**6, 10**6, 0.10)
    b, _ = _int64_col(rng, n, -10**6, 10**6, 0.10)
    c, _ = _int64_col(rng, n, 0, 10**6, 0.05)
    d, _ = _int64_col(rng, n, 0, 100, 0.0)

    def carry(colx, words):
        cnt = bm.count_set_bits(words)
        bump = (cnt >> 30).astype(jnp.uint32)
        return dc.replace(colx, values=colx.values + bump)

    def s_gt(cols):
        a, b, c, d = cols
        p = ops.gt(a, b)
        return (carry(a, p.values), b, c, d)

    def s_rem(cols):
        a, b, c, d = cols
        p = ops.eq(ops.rem(c, 7), 0)
        return (carry(a, p.values), b, c, d)

    def s_lteq(cols):
        a, b, c, d = cols
        p = ops.lt_eq(d, 50)
        return (carry(a, p.values), b, c, d)

    def s_kleene(cols):
        a, b, c, d = cols
        p1 = ops.gt(a, b)
        p2 = ops.lt_eq(d, 50)
        p = ops.and_kleene(p1, p2)
        return (carry(a, p.values), b, c, d)

    def s_full(cols):
        a, b, c, d = cols
        p = ops.and_kleene(ops.and_kleene(
            ops.gt(a, b), ops.eq(ops.rem(c, 7), 0)), ops.lt_eq(d, 50))
        return (carry(a, p.values), b, c, d)

    for name, fn in [("gt(a,b)", s_gt), ("eq(rem(c,7),0)", s_rem),
                     ("lt_eq(d,50)", s_lteq), ("gt+lteq+kleene", s_kleene),
                     ("full predicate", s_full)]:
        dt = loop_time(fn, (a, b, c, d), k_lo=1, reps=3)
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
