"""The round-5 ask #3 measurement: what does ONE radix partition pass
actually cost on this chip?

A B-bucket stable partition decomposes into log2(B) binary
stable-partition passes; a binary stable partition over P planes is two
streaming compactions (keep-left on the bit, keep-right on its
complement) — built here from the best movement kernel in the repo
(pallas/compact3.py gather-movement).  Measured at 32M rows x 4 planes
(3 packed key words + 1 payload, the BASELINE config-3 shape), the cost
per BIT of radix work is directly comparable to lax.sort's measured
marginal key cost (~40 ms/u32 key at 32M)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench._enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arrowtpu.pallas import compact3 as pc3  # noqa: E402

n = 32 * 1024 * 1024
P = 4
rng = np.random.default_rng(7)
planes_np = rng.integers(0, 2**32, (P, n), dtype=np.uint32)
planes = jnp.asarray(planes_np)


def binary_partition(pl, bit):
    """One stable binary-split pass on `bit` of plane 0: rows with
    bit=0 stream left, bit=1 stream right (two compactions + stitch)."""
    b = ((pl[0] >> bit) & jnp.uint32(1)).astype(jnp.uint8)
    keep0 = jnp.uint8(1) - b
    left = pc3.compact_planes(pl, keep0)
    right = pc3.compact_planes(pl, b)
    cnt0 = jnp.sum(keep0.astype(jnp.int32))
    # stitch: right block rotated up to start at cnt0 (roll is an
    # elementwise pass; a fused kernel would write in place)
    idx = jnp.arange(n, dtype=jnp.int32)
    take_left = idx < cnt0
    rolled = [jnp.roll(r, cnt0) for r in right]
    return jnp.stack([jnp.where(take_left, l, r)
                      for l, r in zip(left, rolled)])


def step(pl):
    out = binary_partition(pl, 0)
    # anti-DCE: fold a data-dependent bump
    bump = (out[0][0] >> 31).astype(jnp.uint32) & jnp.uint32(0)
    return out.at[0, 0].add(bump + jnp.uint32(1))


t0 = time.time()
dt = bench.loop_time(step, planes, k_lo=1, reps=3)
print(f"binary partition pass, {P} planes @ {n//2**20}M: "
      f"{dt*1e3:.1f} ms   (wall {time.time()-t0:.0f}s)", flush=True)
print(f"per 8-bit digit (8 binary passes): {dt*8e3:.0f} ms", flush=True)
print(f"83-bit key LSD total: {dt*83e3:.0f} ms "
      f"vs measured 3-key lax.sort 192 ms @32M", flush=True)


# --- grouped string sort: 1M x 64-byte strings (round-5 ask #4) ----------
def _strsort():
    import arrowtpu as at
    from arrowtpu import schema as st
    from arrowtpu.core import column as col
    import importlib

    S = importlib.import_module("arrowtpu.ops.sort")
    ns = 1_000_000
    r = np.random.default_rng(5)
    prefixes = [f"shared-prefix-{i:03d}-abcdefgh" for i in range(16)]
    strs = [prefixes[int(r.integers(0, 16))]
            + "".join(chr(97 + int(x)) for x in r.integers(0, 6, 40))
            for _ in range(ns)]
    c = col.string_view(strs, st.utf8)

    def step(cc):
        import dataclasses as dc
        idx = S.sort_to_indices(cc)
        bump = (idx.values[0] >> 31).astype(jnp.uint32)
        return dc.replace(cc, views=cc.views + bump)

    t0 = time.time()
    dt = bench.loop_time(step, c, k_lo=1, reps=3)
    print(f"grouped string sort 1M x 64B: {dt*1e3:.1f} ms "
          f"(wall {time.time()-t0:.0f}s)", flush=True)
    idx = S.sort_to_indices(c)
    got = np.asarray(jax.device_get(idx.values))[:ns]
    order = np.asarray(sorted(range(ns), key=lambda i: (strs[i], i)))
    assert np.array_equal(got, order), "string sort mismatch"
    print("string sort bit-exact OK", flush=True)


_strsort()
