"""Runtime-adaptive sort-key compression: pack order-preserving u32
planes into the minimal number of u32 key words, then sort with exactly
that many keys.

Why (measured on v5e, scripts/prof_sort.py, 32M rows):

    jax.lax.sort cost is linear in num_keys and FREE in payload operands
        1 key  :  83 ms     (9 operands with 1 key: also 83 ms)
        2 keys : 118 ms
        4 keys : 200 ms
        8 keys : 397 ms
    random gather:     491 ms   (15x the 1-key sort — scatter/gather
                                 permutation application is off the table)
    elementwise pass:  0.41 ms  (654 GB/s roofline)

The reference's answer to multi-column sort cost is the row format +
radix sort (arrow-row/src/lib.rs:17-23).  An LSD radix kernel on TPU
must MOVE every key+payload plane on every digit pass; at the streaming
compaction kernel's measured efficiency (~114 GB/s end-to-end) a
16-bucket pass over 4 planes costs ~2.3 ns/row, so 21 passes (82 active
key bits at 4 bits/pass) ≈ 48 ns/row — vs 3-key lax.sort at ~5 ns/row,
which also carries ANY number of payload operands for free.  The
TPU-native translation of "radix sort over the row format" is therefore
inverted: spend elementwise passes (≈free) to MINIMIZE the number of
32-bit sort keys, and let XLA's tuned sort do the movement.

Mechanism (all inside jit, no host sync):
  * per plane, compute min/max over live rows (one fused reduction pass)
    and the needed bit width  bits_i = 32 - clz(max_i - min_i);
  * rebase each plane to  p - min_i  (order-isomorphic on u32) and
    concatenate the bit fields MSB-first into ceil((1+sum bits_i)/32)
    words; bit 0 of word 0 is the capacity-padding flag (padding rows
    sort last), replacing the separate padding key plane;
  * dispatch on the needed word count with a static lax.switch ladder
    (1..MAX_WORDS words, plus a full-plane fallback branch) — the word
    count is data-dependent but each branch is a statically-shaped sort.

Constant planes (null sentinels of all-valid columns, constant columns)
compress to zero bits and vanish; dictionary ranks compress to
log2(cardinality); an Int64 column whose values fit 20 bits costs 20
bits.  The 8-plane lexsort of BASELINE config 3 (i32 range 200, f64,
dict-1000) packs to 83 bits = 3 words: 397 ms -> ~160 ms at 32M rows,
and a single-word GROUP BY key sorts at the 83 ms floor with the entire
aggregation payload riding free.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import bitmap as bm

U32 = jnp.uint32
MAX_WORDS = 4


def _plane_stats(planes: List[jax.Array], live: jax.Array):
    """Per plane: (rebased-to-zero values, traced bit width)."""
    shifted, bits = [], []
    for p in planes:
        p = p.astype(U32)
        lo = jnp.min(jnp.where(live, p, U32(0xFFFFFFFF)))
        hi = jnp.max(jnp.where(live, p, U32(0)))
        rng = hi - lo
        nb = (jnp.int32(32) - jax.lax.clz(rng).astype(jnp.int32))
        shifted.append(jnp.where(live, p - lo, U32(0)))
        bits.append(nb)
    return shifted, jnp.stack(bits)


def _pack_words(shifted: List[jax.Array], bits: jax.Array, live: jax.Array,
                k: int, capacity: int) -> List[jax.Array]:
    """Concatenate bit fields MSB-first into k u32 words.  Stream bit 0
    (MSB of word 0) is the padding flag; field i occupies the next
    bits[i] stream bits.  Traced shift amounts; clipped so no shift op
    sees an out-of-range amount."""
    words = [jnp.zeros(capacity, U32) for _ in range(k)]
    words[0] = jnp.where(live, U32(0), U32(0x80000000))
    pos = jnp.int32(1)
    for i, v in enumerate(shifted):
        end = pos + bits[i]
        for w in range(k):
            sh = jnp.int32(32 * (w + 1)) - end
            shl = jnp.clip(sh, 0, 31).astype(U32)
            shr = jnp.clip(-sh, 0, 31).astype(U32)
            contrib = jnp.where(
                sh >= 32, U32(0),
                jnp.where(sh >= 0, v << shl,
                          jnp.where(sh > -32, v >> shr, U32(0))))
            words[w] = words[w] | contrib
        pos = end
    return words


def sort_by_planes(
    planes: Sequence[jax.Array],
    capacity: int,
    length,
    extras: Sequence[jax.Array] = (),
    max_words: int = MAX_WORDS,
    live: jax.Array | None = None,
    return_planes: bool = True,
) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Stable sort rows by (live-first, planes lexicographic ascending).

    Returns (sorted_planes, sorted_extras) — the planes and every extra
    operand permuted by the sort (payload operands are free; see module
    docstring).  `planes` are order-preserving u32 planes MSB-first
    (rowformat.encode); `extras` may be any dtype lax.sort accepts.
    `live` overrides the default capacity/length row mask (rows with
    live=False sort last and contribute nothing to key statistics).
    `return_planes=False` skips carrying the planes (sorted_planes comes
    back empty) — callers that only need the permutation save the
    operand output buffers, which matters at 100M-row scale.
    """
    planes = [p.astype(U32) for p in planes]
    extras = list(extras)
    P = len(planes)
    if live is None:
        live = bm.row_mask_bool(capacity, length)
    shifted, bits = _plane_stats(planes, live)
    total_bits = jnp.int32(1) + jnp.sum(bits)
    words_needed = (total_bits + 31) // 32
    # branch 0..max_words-1: pack into (b+1) words; branch max_words:
    # full-plane fallback (padding plane + every plane as a key)
    branch = jnp.clip(words_needed, 1, max_words + 1) - 1

    carried = (planes if return_planes else []) + extras
    n_planes = P if return_planes else 0

    def make_packed(k):
        def br(ops):
            words = _pack_words(shifted, bits, live, k, capacity)
            out = jax.lax.sort(words + list(ops), dimension=0,
                               is_stable=True, num_keys=k)
            return tuple(out[k:])
        return br

    def fallback(ops):
        pad = (~live).astype(U32)
        keys = [pad] + shifted
        out = jax.lax.sort(keys + list(ops), dimension=0, is_stable=True,
                           num_keys=1 + P)
        return tuple(out[1 + P:])

    branches = [make_packed(k) for k in range(1, max_words + 1)] + [fallback]
    out = jax.lax.switch(branch, branches, tuple(carried))
    return list(out[:n_planes]), list(out[n_planes:])


def sort_by_plane_groups(
    groups: Sequence[Sequence[jax.Array]],
    capacity: int,
    length,
    extras: Sequence[jax.Array] = (),
) -> List[jax.Array]:
    """Stable lexicographic sort over plane GROUPS: chained packed sorts
    with rank carry-over (the string prefix-plane design, round-5 ask
    #4 / PERF.md:118-123).

    A long varlen key would explode into len_bound/4+1 planes and blow
    the 4-word pack budget into the slow multi-key fallback.  Instead
    the planes split into groups of a few planes each; sort 1 orders by
    group 0 (e.g. first 16 string bytes), then each refinement sort
    orders by [run-rank, next group's planes] — the rank plane encodes
    everything already compared, packs to log2(#distinct runs) bits, and
    ties resolve group by group.  Every sort stays within the packed
    1..4-word fast path.  Returns the sorted extras (e.g. the
    permutation iota)."""
    groups = [list(g) for g in groups if len(g)]
    if len(groups) <= 1:
        _, out = sort_by_planes(groups[0] if groups else [], capacity,
                                length, list(extras), return_planes=False)
        return out
    extras = list(extras)
    n_extra = len(extras)
    later = [p.astype(U32) for g in groups[1:] for p in g]
    sizes = [len(g) for g in groups[1:]]

    sorted_g, carried = sort_by_planes(
        groups[0], capacity, length, later + extras, return_planes=True)
    rank = _run_rank(sorted_g, None)
    pos = 0
    for gi, sz in enumerate(sizes):
        g_planes = carried[pos:pos + sz]
        rest = carried[pos + sz:]
        sorted_g, carried2 = sort_by_planes(
            [rank] + g_planes, capacity, length, rest,
            return_planes=True)
        rank = _run_rank(sorted_g, None)
        carried = carried2
        pos = 0
    return carried[len(carried) - n_extra:]


def _run_rank(planes: List[jax.Array], live) -> jax.Array:
    """u32 run id per sorted row: rows compare equal on `planes` iff
    same rank (cumsum of adjacent-difference boundaries)."""
    boundary = None
    for p in planes:
        d = jnp.concatenate([jnp.ones(1, jnp.bool_), p[1:] != p[:-1]])
        boundary = d if boundary is None else (boundary | d)
    return (jnp.cumsum(boundary.astype(U32), dtype=U32) - U32(1))
