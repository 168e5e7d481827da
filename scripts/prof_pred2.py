"""Bisect the config-2 fusion pathology: which combination of the rem
chain + kleene + popcount triggers the 10x blowup, and whether an
optimization_barrier recovers it."""

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

    def s_2term(cols):
        a, b, c, d = cols
        p = ops.and_kleene(ops.gt(a, b), ops.eq(ops.rem(c, 7), 0))
        return (carry(a, p.values), b, c, d)

    def s_2term_rem_lteq(cols):
        a, b, c, d = cols
        p = ops.and_kleene(ops.eq(ops.rem(c, 7), 0), ops.lt_eq(d, 50))
        return (carry(a, p.values), b, c, d)

    def s_full_reorder(cols):
        a, b, c, d = cols
        p = ops.and_kleene(ops.and_kleene(
            ops.eq(ops.rem(c, 7), 0), ops.lt_eq(d, 50)), ops.gt(a, b))
        return (carry(a, p.values), b, c, d)

    def s_full_barrier(cols):
        a, b, c, d = cols
        p2 = ops.eq(ops.rem(c, 7), 0)
        p2 = dc.replace(
            p2, values=jax.lax.optimization_barrier(p2.values))
        p = ops.and_kleene(ops.and_kleene(ops.gt(a, b), p2),
                           ops.lt_eq(d, 50))
        return (carry(a, p.values), b, c, d)

    def s_full_nocarry(cols):
        a, b, c, d = cols
        p = ops.and_kleene(ops.and_kleene(
            ops.gt(a, b), ops.eq(ops.rem(c, 7), 0)), ops.lt_eq(d, 50))
        # carry p.values[0] directly, no popcount
        bump = (p.values[0] >> 31).astype(jnp.uint32)
        return (dc.replace(a, values=a.values + bump), b, c, d)

    def s_rem_gt_nok(cols):
        # non-kleene and: same data flow, simpler validity math
        a, b, c, d = cols
        p = ops.and_(ops.and_(ops.gt(a, b), ops.eq(ops.rem(c, 7), 0)),
                     ops.lt_eq(d, 50))
        return (carry(a, p.values), b, c, d)

    for name, fn in [("kleene(gt, rem)", s_2term),
                     ("kleene(rem, lteq)", s_2term_rem_lteq),
                     ("full reordered", s_full_reorder),
                     ("full + barrier on rem", s_full_barrier),
                     ("full, no popcount carry", s_full_nocarry),
                     ("full non-kleene", s_rem_gt_nok)]:
        dt = loop_time(fn, (a, b, c, d), k_lo=1, reps=3)
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__" and "--barrier" not in __import__("sys").argv:
    main()


def barrier_variant():
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    import numpy as np
    from bench import loop_time, _int64_col
    from arrowtpu import ops
    from arrowtpu.core import bitmap as bm

    n = 8_000_000
    rng = np.random.default_rng(1)
    a, _ = _int64_col(rng, n, -10**6, 10**6, 0.10)
    b, _ = _int64_col(rng, n, -10**6, 10**6, 0.10)
    c, _ = _int64_col(rng, n, 0, 10**6, 0.05)
    d, _ = _int64_col(rng, n, 0, 100, 0.0)

    def bar(p):
        return dc.replace(p, values=jax.lax.optimization_barrier(p.values))

    def s_full_barrier_all(cols):
        a, b, c, d = cols
        p = ops.and_kleene(ops.and_kleene(
            bar(ops.gt(a, b)), bar(ops.eq(ops.rem(c, 7), 0))),
            bar(ops.lt_eq(d, 50)))
        cnt = bm.count_set_bits(p.values)
        bump = (cnt >> 30).astype(jnp.uint32)
        return (dc.replace(a, values=a.values + bump), b, c, d)

    dt = loop_time(s_full_barrier_all, (a, b, c, d), k_lo=1, reps=3)
    print(f"full + barrier on ALL cmps: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__" and "--barrier" in __import__("sys").argv:
    barrier_variant()
