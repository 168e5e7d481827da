"""Feasibility probe for the dense-range GROUP BY fast path: can XLA
evaluate per-bucket masked reductions (histogram/sums/mins over 257
buckets x 8M rows) without materializing the broadcast?  Compare the 2D
axis-reduce formulation vs a per-bucket scalar-reduce list."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import loop_time, _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NB = 257


def main():
    n = 8_000_000
    rng = np.random.default_rng(3)
    bucket = jnp.asarray(rng.integers(0, 200, n, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                       .astype(np.uint32))

    ids2 = jnp.arange(NB, dtype=jnp.int32)[:, None]

    def s_2d(state):
        b, v = state
        eq = b[None, :] == ids2                       # (NB, n) virtual
        cnt = jnp.sum(eq, axis=1, dtype=jnp.int32)
        sums = []
        for k in range(4):
            byte = ((v >> jnp.uint32(8 * k)) & jnp.uint32(0xFF))
            sums.append(jnp.sum(jnp.where(eq, byte[None, :], 0),
                                axis=1, dtype=jnp.uint32))
        mn = jnp.min(jnp.where(eq, v[None, :], jnp.uint32(0xFFFFFFFF)),
                     axis=1)
        bump = ((cnt[0] + sums[0][0] + mn[0]) >> 31).astype(jnp.uint32)
        return (b + bump.astype(jnp.int32), v)

    def s_list(state):
        b, v = state
        cnts, mns = [], []
        sums = [[] for _ in range(4)]
        for c in range(NB):
            eq = b == c
            cnts.append(jnp.sum(eq, dtype=jnp.int32))
            for k in range(4):
                byte = (v >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
                sums[k].append(jnp.sum(jnp.where(eq, byte, jnp.uint32(0)),
                                       dtype=jnp.uint32))
            mns.append(jnp.min(jnp.where(eq, v, jnp.uint32(0xFFFFFFFF))))
        cnt = jnp.stack(cnts)
        mn = jnp.stack(mns)
        s0 = jnp.stack(sums[0])
        bump = ((cnt[0] + s0[0] + mn[0]) >> 31).astype(jnp.uint32)
        return (b + bump.astype(jnp.int32), v)

    import time
    for name, fn in [("2D axis-reduce", s_2d)]:
        t0 = time.time()
        dt = loop_time(fn, (bucket, vals), k_lo=1, reps=3)
        print(f"{name}: {dt*1e3:.2f} ms (compile+run {time.time()-t0:.0f}s)",
              flush=True)
    for name, fn in [("per-bucket list", s_list)]:
        t0 = time.time()
        dt = loop_time(fn, (bucket, vals), k_lo=1, reps=3)
        print(f"{name}: {dt*1e3:.2f} ms (compile+run {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
