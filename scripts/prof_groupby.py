"""Stage-level profile of the group_by pipeline on device (round 4):
which of sort / boundaries / chunk-cumsums / compactions / minmax sweep
dominates the 8M-row 107 ms."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import loop_time, _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import arrowtpu as at  # noqa: E402
from arrowtpu.core import bitmap as bm  # noqa: E402
from arrowtpu.rowformat import encode as rf, pack as rp  # noqa: E402

U32 = jnp.uint32


def main():
    n = 8_000_000
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1_000_000, n, dtype=np.int32)
    vals = rng.integers(-1000, 1000, n)
    b = at.record_batch({
        "k": at.primitive(keys, at.schema.int32, length=n),
        "v": at.primitive(vals, at.schema.int64, length=n),
    })
    kc, vc = b["k"], b["v"]
    cap = b.capacity

    planes = rf.encode_columns([kc])
    iota = jnp.arange(cap, dtype=jnp.int32)
    agg_ops = [vc.valid_bool(), vc.values[:, 0], vc.values[:, 1],
               kc.values.astype(jnp.int32)]

    def bump_of(x):
        return (x[0] >> 31).astype(U32)

    # 1. the sort alone (packed keys + payload)
    def s_sort(state):
        pl, ops = state
        sp, so = rp.sort_by_planes(pl, cap, n, ops)
        return ([p + bump_of(so[0]).astype(p.dtype) for p in pl], ops)

    dt = loop_time(s_sort, (planes, agg_ops), k_lo=1, reps=3)
    print(f"sort(packed)+carry: {dt*1e3:.1f} ms", flush=True)

    # precompute sorted state for downstream stages
    sp, so = jax.jit(lambda pl, ops: rp.sort_by_planes(pl, cap, n, ops))(
        planes, agg_ops)

    live = iota < jnp.int32(n)

    def boundaries(spl):
        boundary = jnp.zeros(cap, dtype=jnp.bool_)
        for p in spl:
            boundary = boundary | jnp.concatenate(
                [jnp.array([True]), p[1:] != p[:-1]])
        return boundary & live

    def s_bound(state):
        spl = state
        bd = boundaries(spl)
        cnt = jnp.sum(bd.astype(jnp.int32))
        return [p + (jnp.uint32(cnt) >> 31) for p in spl]

    dt = loop_time(s_bound, [p.astype(U32) for p in sp], k_lo=1, reps=3)
    print(f"boundaries+count: {dt*1e3:.2f} ms", flush=True)

    # 3. one 8M u32 cumsum
    x = so[1].astype(U32)

    def s_cumsum(v):
        c = jnp.cumsum(v, dtype=U32)
        return v + (c[0] >> 31)

    dt = loop_time(s_cumsum, x, k_lo=1, reps=3)
    print(f"single u32 cumsum 8M: {dt*1e3:.2f} ms", flush=True)

    # 4. the 9 chunk cumsums of _segment_sum_planes (w=8 -> 4 per plane
    # x 2 limb planes + 1 count)
    def s_chunks(state):
        lo, hi, ok = state
        prefixes = []
        for plane in (lo, hi):
            masked = jnp.where(ok, plane.astype(U32), U32(0))
            for k in range(4):
                ch = (masked >> U32(8 * k)) & U32(0xFF)
                prefixes.append(jnp.cumsum(ch, dtype=U32))
        prefixes.append(jnp.cumsum(ok.astype(U32), dtype=U32))
        bump = prefixes[0][0] >> 31
        return (lo + bump, hi, ok)

    ok = so[0] != 0
    dt = loop_time(s_chunks, (so[1].astype(U32), so[2].astype(U32), ok),
                   k_lo=1, reps=3)
    print(f"9 chunk cumsums: {dt*1e3:.2f} ms", flush=True)

    # 5. one multi-plane compaction P=9 at 8M
    from arrowtpu.pallas import compact2 as pc2

    bd = jax.jit(lambda spl: boundaries(spl))(sp)
    planes9 = jnp.stack([so[1].astype(U32)] * 9)

    def s_compact(state):
        pl, mask = state
        out = pc2.compact_planes(pl, mask.astype(jnp.uint8))
        return (pl.at[0, 0].add(out[0, 0] >> 31), mask)

    dt = loop_time(s_compact, (planes9, bd), k_lo=1, reps=3)
    print(f"compact P=9 8M: {dt*1e3:.2f} ms", flush=True)

    def s_compact2(state):
        pl, mask = state
        out = pc2.compact_planes(pl[:2], mask.astype(jnp.uint8))
        return (pl.at[0, 0].add(out[0, 0] >> 31), mask)

    dt = loop_time(s_compact2, (planes9, bd), k_lo=1, reps=3)
    print(f"compact P=2 8M: {dt*1e3:.2f} ms", flush=True)

    # 6. minmax suffix-doubling sweep (23 rounds, 2 planes)
    def s_minmax(state):
        ph, pl_, okk = state
        from arrowtpu.ops.groupby import _segment_minmax_planes, _Ctx
        ctx = _Ctx(bd, bd, live, cap, jnp.int32(100))
        bh, bl = _segment_minmax_planes([ph, pl_], okk, ctx, True)
        return (ph + (bh[0] >> 31), pl_, okk)

    dt = loop_time(s_minmax, (so[2].astype(U32), so[1].astype(U32), ok),
                   k_lo=1, reps=3)
    print(f"minmax sweep+compact: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
