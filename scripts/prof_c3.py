"""Config-3 breakdown at 100M rows: where do the 795 ms go?

Stages timed separately (bench.py loop_time methodology), pure-sort
costs first (the gather probes crashed a TPU worker once; run them
last so the headline numbers always land):
  E. lax.sort 3 u32 keys + 1 payload at 100M   E1. 1 key + payload
  A. encode_columns (incl. the 1000-entry rank gather)
  D. encode + plane stats + pack into 3 words (no sort)
  B. rank gather alone  ranks[keys]
  C2/C. rank alternatives (take_along_axis lanes / select ladder)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench._enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import arrowtpu as at  # noqa: E402
from arrowtpu import ops, schema as st  # noqa: E402
from arrowtpu.core import column as cc  # noqa: E402
from arrowtpu.core import bitmap as bm  # noqa: E402
from arrowtpu import rowformat as rf  # noqa: E402
from arrowtpu.rowformat import pack as rp  # noqa: E402

n = 100_000_000
rng = np.random.default_rng(2)
i32 = rng.integers(-100, 100, n, dtype=np.int32)
f64 = np.round(rng.standard_normal(n), 2)
keys = rng.integers(0, 1000, n, dtype=np.int32)
words = [f"w{i:03d}" for i in rng.permutation(1000)]

c1 = at.primitive(i32, at.schema.int32, length=n)
c2 = at.primitive(f64, at.schema.float64, length=n)
dict_proto = cc.dictionary_encode_host(words, st.Dictionary(st.int32, st.utf8))
values, ranks = dict_proto.values, dict_proto.value_ranks
dcol = cc.DictionaryColumn(
    at.primitive(keys, at.schema.int32, length=n), values, ranks,
    st.Dictionary(st.int32, st.utf8))

cols = (c1, c2, dcol)
cap = c1.capacity
print(f"capacity={cap}", flush=True)


def t(name, step, x, **kw):
    t0 = time.time()
    dt = bench.loop_time(step, x, k_lo=1, reps=3, **kw)
    print(f"{name}: {dt*1e3:.1f} ms   (wall {time.time()-t0:.0f}s)",
          flush=True)
    return dt


# --- E. pure sorts at 100M ------------------------------------------------
w0 = jnp.asarray(rng.integers(0, 2**31, cap, dtype=np.int64).astype(np.uint32))
w1 = jnp.asarray(rng.integers(0, 2**31, cap, dtype=np.int64).astype(np.uint32))
w2 = jnp.asarray(rng.integers(0, 2**31, cap, dtype=np.int64).astype(np.uint32))
iota = jnp.arange(cap, dtype=jnp.int32)


def step_sort3(ws):
    a, b, c, it = ws
    out = jax.lax.sort([a, b, c, it], dimension=0, is_stable=True, num_keys=3)
    idx = out[3]
    bump = (idx[0] >> 31).astype(jnp.uint32)
    return (a + bump, b, c, it)


t("E lax.sort 3 keys+payload", step_sort3, (w0, w1, w2, iota))


def step_sort1(ws):
    a, b, c, it = ws
    out = jax.lax.sort([a, it], dimension=0, is_stable=True, num_keys=1)
    idx = out[1]
    bump = (idx[0] >> 31).astype(jnp.uint32)
    return (a + bump, b, c, it)


t("E1 lax.sort 1 key+payload", step_sort1, (w0, w1, w2, iota))


# --- A. encode only -------------------------------------------------------
def step_encode(colstup):
    c1, c2, dcol = colstup
    planes = rf.encode_columns([c1, c2, dcol])
    bump = (planes[3][0] >> 31).astype(c1.values.dtype)
    import dataclasses as d_
    return (d_.replace(c1, values=c1.values + bump), c2, dcol)


t("A encode_columns", step_encode, cols)


# --- D. encode + stats + pack (no sort) ----------------------------------
def step_pack(colstup):
    c1, c2, dcol = colstup
    planes = [p.astype(jnp.uint32) for p in rf.encode_columns([c1, c2, dcol])]
    live = bm.row_mask_bool(cap, c1.length)
    shifted, bits = rp._plane_stats(planes, live)
    words = rp._pack_words(shifted, bits, live, 3, cap)
    bump = (words[0][0] >> 31).astype(c1.values.dtype)
    import dataclasses as d_
    return (d_.replace(c1, values=c1.values + bump), c2, dcol)


t("D encode+stats+pack(3w)", step_pack, cols)


# --- B. rank gather alone -------------------------------------------------
kv = dcol.keys.values


def step_gather(k):
    r = ranks[jnp.clip(k.astype(jnp.int32), 0, 999)]
    return k + (r >> 30).astype(k.dtype)


t("B rank gather (1000-entry)", step_gather, kv)


def step_tala(k):
    # lane-gather path: tile rows of 128 lanes; table broadcast to tile rows
    tbl = jnp.pad(ranks.astype(jnp.uint32), (0, 1024 - ranks.shape[0]))
    ki = jnp.clip(k.astype(jnp.int32), 0, 999).reshape(-1, 128)
    rows = ki.shape[0]
    acc = jnp.zeros_like(ki, dtype=jnp.uint32)
    for h in range(8):
        blk = jnp.broadcast_to(tbl[h * 128:(h + 1) * 128], (rows, 128))
        v = jnp.take_along_axis(blk, ki & 127, axis=1)
        acc = jnp.where((ki >> 7) == h, v, acc)
    return k + (acc.reshape(-1) >> 30).astype(k.dtype)


t("C2 rank take_along_axis x8", step_tala, kv)
