"""Profile lax.sort cost structure on the real chip: operand-count
scaling, single-key sorts at several sizes, VPU compare throughput, and
histogram-style one-hot costs.  Informs the round-4 radix-sort design."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import loop_time, _enable_cache  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    _enable_cache()
    n = 32 * 1024 * 1024
    rng = np.random.default_rng(0)
    planes = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                          .astype(np.uint32)) for _ in range(8)]
    iota = jnp.arange(n, dtype=jnp.int32)

    def carry_bump(out):
        # fold sort output back into the first operand (anti-DCE)
        return (out[0] >> 31).astype(jnp.uint32)

    for n_ops, n_keys in [(2, 1), (3, 2), (5, 4), (9, 8), (9, 1)]:
        ops = planes[: n_ops - 1] + [iota]

        def step(state, n_keys=n_keys, k=n_ops - 1):
            ops2 = list(state)
            out = jax.lax.sort(ops2, dimension=0, is_stable=True,
                               num_keys=n_keys)
            bump = carry_bump(out)
            return tuple(
                [state[0] + bump] + list(state[1:]))

        dt = loop_time(step, tuple(ops), k_lo=1, reps=3)
        print(f"sort n=32M ops={n_ops} keys={n_keys}: {dt*1e3:.1f} ms "
              f"({n/dt/1e6:.0f} M rows/s)", flush=True)

    # one-hot histogram cost: digits (n,) -> counts per bucket B
    for B in (16, 64, 256):
        digits = planes[0] & jnp.uint32(B - 1)

        def histo(state, B=B):
            d = state
            m = d.reshape(-1, 128)
            counts = []
            for b in range(B):
                counts.append(jnp.sum((m == b).astype(jnp.int32)))
            c = jnp.stack(counts)
            return d + (c[0] >> 30).astype(jnp.uint32)

        dt = loop_time(histo, digits, k_lo=1, reps=3)
        print(f"histogram B={B} n=32M: {dt*1e3:.1f} ms", flush=True)

    # gather cost check (round-3 claim: 53ms per 8M)
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))

    def gat(state):
        v, idx = state
        g = v[idx]
        return (v + (g[0] >> 31).astype(jnp.uint32), idx)

    dt = loop_time(gat, (planes[0], idx), k_lo=1, reps=3)
    print(f"gather 32M random: {dt*1e3:.1f} ms", flush=True)

    # elementwise roofline pass for scale
    def ew(v):
        return v + 1

    dt = loop_time(ew, planes[0], k_lo=2, reps=3)
    print(f"elementwise 32M u32 (r+w 256MB): {dt*1e3:.2f} ms "
          f"= {n*8/dt/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
