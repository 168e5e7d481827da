"""True cost of the i64 const-divisor rem chain (with a varying carry so
nothing hoists), vs the same math on separate lo/hi (n,) planes with no
(n,2) stacking between steps."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import loop_time, _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arrowtpu.core import wide as wd  # noqa: E402

U32 = jnp.uint32


def main():
    n = 8_000_000
    rng = np.random.default_rng(1)
    c = jnp.asarray(wd.split_numpy(rng.integers(0, 10**6, n)))

    # current implementation, carry into c so it cannot hoist
    def s_cur(x):
        q, r = wd.divmod_signed_const(x, 7)
        bump = (wd.lo(r)[0] * 0 + wd.lo(q)[0] * 0).astype(U32)
        eqz = (wd.lo(r) == 0) & (wd.hi(r) == 0)
        cnt = jnp.sum(eqz, dtype=jnp.int32)
        return x.at[0, 0].add((jnp.uint32(cnt) >> 30) + bump)

    dt = loop_time(s_cur, c, k_lo=1, reps=3)
    print(f"divmod_signed_const (n,2): {dt*1e3:.2f} ms", flush=True)

    # split-plane version: identical math, tuples of (n,) arrays
    def mul32x32(a, b):
        al, ah = a & U32(0xFFFF), a >> U32(16)
        bl, bh = b & U32(0xFFFF), b >> U32(16)
        ll = al * bl
        lh = al * bh
        hl = ah * bl
        hh = ah * bh
        mid = (ll >> U32(16)) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
        lo_ = (ll & U32(0xFFFF)) | (mid << U32(16))
        hi_ = hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
        return lo_, hi_

    def mulhi64_sp(al, ah, bl, bh):
        p0l, p0h = mul32x32(al, bl)
        p1l, p1h = mul32x32(al, bh)
        p2l, p2h = mul32x32(ah, bl)
        p3l, p3h = mul32x32(ah, bh)
        t1 = p0h + p1l
        c1 = (t1 < p0h).astype(U32)
        t1b = t1 + p2l
        c1 = c1 + (t1b < t1).astype(U32)
        t2 = p1h + p2h
        c2 = (t2 < p1h).astype(U32)
        t2b = t2 + p3l
        c2 = c2 + (t2b < t2).astype(U32)
        t2c = t2b + c1
        c2 = c2 + (t2c < t2b).astype(U32)
        return t2c, p3h + c2

    def mul64_sp(al, ah, bl, bh):
        ll, lh = mul32x32(al, bl)
        m1, _ = mul32x32(al, bh)
        m2, _ = mul32x32(ah, bl)
        return ll, lh + m1 + m2

    def sub64(al, ah, bl, bh):
        lo_ = al - bl
        borrow = (al < bl).astype(U32)
        return lo_, ah - bh - borrow

    def add64c(al, ah, k):
        lo_ = al + U32(k)
        carry = (lo_ < al).astype(U32)
        return lo_, ah + carry

    def lt64u(al, ah, bl, bh):
        return (ah < bh) | ((ah == bh) & (al < bl))

    d = 7
    m = (1 << 64) // d
    mL, mH = U32(m & 0xFFFFFFFF), U32(m >> 32)
    dL, dH = U32(d), U32(0)

    def s_split(x):
        al, ah = x[..., 0], x[..., 1]
        neg = (ah >> 31) != 0
        nl_, nh_ = sub64(U32(0), U32(0), al, ah)
        ual = jnp.where(neg, nl_, al)
        uah = jnp.where(neg, nh_, ah)
        ql, qh = mulhi64_sp(ual, uah, jnp.broadcast_to(mL, ual.shape),
                            jnp.broadcast_to(mH, ual.shape))
        pl_, ph_ = mul64_sp(ql, qh, jnp.broadcast_to(dL, ql.shape),
                            jnp.broadcast_to(dH, ql.shape))
        rl, rh = sub64(ual, uah, pl_, ph_)
        for _ in range(2):
            ge = ~lt64u(rl, rh, jnp.broadcast_to(dL, rl.shape),
                        jnp.broadcast_to(dH, rl.shape))
            qc = add64c(ql, qh, 1)
            rc = sub64(rl, rh, jnp.broadcast_to(dL, rl.shape),
                       jnp.broadcast_to(dH, rl.shape))
            ql = jnp.where(ge, qc[0], ql)
            qh = jnp.where(ge, qc[1], qh)
            rl = jnp.where(ge, rc[0], rl)
            rh = jnp.where(ge, rc[1], rh)
        # remainder sign = dividend sign
        rnl, rnh = sub64(U32(0), U32(0), rl, rh)
        rl = jnp.where(neg, rnl, rl)
        rh = jnp.where(neg, rnh, rh)
        eqz = (rl == 0) & (rh == 0)
        cnt = jnp.sum(eqz, dtype=jnp.int32)
        return x.at[0, 0].add(jnp.uint32(cnt) >> 30)

    dt2 = loop_time(s_split, c, k_lo=1, reps=3)
    print(f"split-plane rem: {dt2*1e3:.2f} ms", flush=True)

    # sanity: equal results
    got1 = np.asarray(jax.device_get(jax.jit(
        lambda x: wd.divmod_signed_const(x, 7)[1])(c)))
    import numpy as _np
    vals = wd.join_numpy(np.asarray(jax.device_get(c)), _np.int64)
    want = vals - (vals // 7 + ((vals % 7 != 0) & (vals < 0))) * 7  # trunc
    got = wd.join_numpy(got1, _np.int64)
    assert _np.array_equal(got, want), "divmod mismatch"
    print("results verified")


if __name__ == "__main__":
    main()
