"""Masked stream compaction, v3 (round 5): hardware lane-gather movement,
scalar-prefetched tile offsets, clamped window DMAs.

Reference behavior spec: /root/reference/arrow-select/src/filter.rs:201
(`filter` — keep masked rows in order).  v1/v2 history in compact.py /
compact2.py.  v3 is a structural rework driven by the round-5 device
profile (scripts/prof_gather.py):

  * **Movement via hardware lane-gather.**  Mosaic lowers
    `jnp.take_along_axis(x, idx, axis=1)` to a dynamic in-register lane
    gather measured at ~1/5 the cost of the 14 roll+select rounds it
    replaces.  v3 routes a SINGLE packed (lane | distance<<8) index plane
    through the 7 monotone-compaction rounds, composes the per-row
    stream rotation into the resulting source-lane map with one more
    gather, and then moves each data plane with ONE gather — data planes
    no longer pay per-round VPU work at all, so wide plane stacks
    (64-bit limb pairs, string matrices) scale at ~1 gather/plane.
  * **Scalar-prefetched tile offsets.**  v2 accumulated the output stream
    position in SMEM, serializing every tile's prefix-sum chain.  v3
    computes per-tile selected counts from the plan's packed mask words
    in the (already mandatory) XLA mask pass and prefetches the
    exclusive prefix, leaving only the one-row carry RMW as a
    cross-tile dependency.
  * **Clamped window DMAs.**  v2 wrote the full (R+2)-row window per tile
    (>2x write amplification at 45% selectivity); v3 picks the smallest
    of four static window heights covering the rows that actually
    contain new data.  The height is a pure function of the prefetched
    offsets, so the deferred double-buffered wait can reconstruct the
    same DMA descriptor two tiles later.
  * The keep mask arrives as the v2-style (n,) u8 vector: the engine's
    packed bitmap is sublane-major (core/bitmap.py docstring), so a
    tile's rows touch one bit of 65536 scattered words — only the XLA
    unpack (which is a free fused reshape by that design) can restore
    row order.  The same fused pass emits the per-tile count prefix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128


def _iota2(shape, dim, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, shape, dim)


def _route_sourcemap(keep_i32, rank):
    """7-round monotone compaction of a packed (lane | d<<8) plane.

    Returns phi0 (R,128) i32: phi0[r, j] = source lane of the element at
    compacted position j of row r (garbage for j >= row count, masked by
    the caller's low/high masks).  Same movement scheme as v2's
    _lane_compact_left_multi, but routing 8-bit lane indices instead of
    the data planes; the distance rides in bits 8..15 of the same plane.
    """
    shape = keep_i32.shape
    lane = _iota2(shape, 1)
    d = jnp.where(keep_i32 == 1, lane - rank, 0)
    plane = lane | (d << 8)
    for b in range(7):
        s = 1 << b
        s8 = s << 8
        pm = pltpu.roll(plane, _L - s, axis=1)
        arrive = ((pm & s8) != 0) & (lane < _L - s)
        moving = (plane & s8) != 0
        plane = jnp.where(arrive, pm - s8,
                          jnp.where(moving, plane & 0xFF, plane))
    return plane & 0xFF


def _extract_bytes(comb):
    """u32-valued i32 (R,128) -> four i8 byte planes (extracted once per
    plane; reused by every scatter slab)."""
    xu = comb if comb.dtype == jnp.uint32 else comb.astype(jnp.uint32)
    return [((xu >> (8 * k)) & 0xFF).astype(jnp.int8) for k in range(4)]


def _rowscatter_mxu_u32(byte_planes, onehot, win):
    """Move row r to window row q[r]: four per-byte one-hot int8 matmuls
    sharing one (R, win) matrix (exact: every output cell receives at
    most one nonzero contribution)."""
    out = jnp.zeros((win, _L), jnp.uint32)
    for k in range(4):
        y = jax.lax.dot_general(
            onehot, byte_planes[k],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = out | ((y.astype(jnp.uint32) & 0xFF) << (8 * k))
    return out


def _need_rows(offs, t):
    """Rows of tile t's window that contain new data or the carry row —
    a pure function of the prefetched offsets, so start/wait sites can
    agree on the DMA descriptor height."""
    pos = offs[t]
    end = (pos % _L) + (offs[t + 1] - pos)
    return end // _L + 1


def _ladder_copy(obuf_slot, out_ref, out_row, need, sem, ladder, *, wait):
    """Start (or wait for) the smallest ladder copy with height >= need."""
    for i, h in enumerate(ladder):
        lo_ok = need <= h
        if i > 0:
            lo_ok = jnp.logical_and(lo_ok, need > ladder[i - 1])

        @pl.when(lo_ok)
        def _(h=h):
            cp = pltpu.make_async_copy(
                obuf_slot.at[:, pl.ds(0, h)],
                out_ref.at[:, pl.ds(out_row, h)],
                sem)
            if wait:
                cp.wait()
            else:
                cp.start()


def _compact3_kernel(offs_ref, keep_ref, x_ref, outinit_ref, out_ref,
                     obuf_ref, carry_ref, sems, *, tile_r, cap_rows, P,
                     ladder, win_rows, stages=15):
    del outinit_ref  # aliased with out_ref; present only for zero-init
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    R = tile_r
    WIN = win_rows

    pos = offs_ref[t]
    total = offs_ref[t + 1] - pos
    out_row = pos // _L
    base = pos % _L

    @pl.when(t == 0)
    def _():
        carry_ref[...] = jnp.zeros((P, 8, _L), jnp.uint32)

    keep_i32 = keep_ref[...].astype(jnp.int32)
    keep_i8 = keep_ref[...].astype(jnp.int8)

    # ---- prefix sums (MXU) ----------------------------------------------
    if not (stages & 16):
        up_strict = (_iota2((_L, _L), 0)
                     < _iota2((_L, _L), 1)).astype(jnp.int8)
        rank = jax.lax.dot_general(
            keep_i8, up_strict,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # (R,128) exclusive
        counts = rank[:, _L - 1:] + keep_i32[:, _L - 1:]  # (R,1)
        row_tri = (_iota2((R, R), 0)
                   > _iota2((R, R), 1)).astype(jnp.bfloat16)
        rowx = jnp.dot(row_tri, counts.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        rank = keep_i32 * 0
        counts = keep_i32[:, _L - 1:] * 0 + 58
        rowx = _iota2((R, 1), 0) * 58

    Q = base + rowx                        # (R,1) flat starts in window
    S = Q % _L
    q = Q // _L                            # dest window row, <= R

    # ---- in-row movement: routed source map + one gather per plane ------
    lane = _iota2((R, _L), 1)
    if stages & 1:
        phi0 = _route_sourcemap(keep_i32, rank)
        rot_idx = (lane - S) & (_L - 1)
        phi = jnp.take_along_axis(phi0, rot_idx, axis=1)  # compose rotation
    else:
        phi = lane
    if stages & 2:
        xs = [jnp.take_along_axis(x_ref[p].astype(jnp.int32), phi, axis=1)
              for p in range(P)]
    else:
        xs = [x_ref[p].astype(jnp.int32) + phi for p in range(P)]

    # ---- split / merge / scatter / stitch --------------------------------
    e = S + counts
    low_mask = (lane >= S) & (lane < jnp.minimum(e, _L))
    high_mask = lane < (e - _L)
    first_row = _iota2((R, _L), 0) == 0

    end = base + total                     # flat stream end within window
    end_row = end // _L
    end_lane = end % _L
    qlast1 = q[R - 1, 0] + 1               # <= WIN - 1
    live_lane = _iota2((8, _L), 1) < end_lane
    live_row0 = _iota2((8, _L), 0) == 0
    slot = t % 2
    need = end_row + 1

    @pl.when(jnp.logical_and(t >= 2, (stages & 128) == 0))
    def _():
        prev_row = offs_ref[t - 2] // _L
        _ladder_copy(obuf_ref.at[slot], out_ref, prev_row,
                     _need_rows(offs_ref, t - 2), sems.at[slot], ladder,
                     wait=True)

    # the scatter runs in vertical window slabs matching the DMA ladder:
    # slab k (window rows [ladder[k-1], ladder[k])) is computed only when
    # the tile's data reaches it — the one-hot build cost and MAC count
    # adapt to the tile's selectivity with no dispatch.  The final tile
    # computes every slab so the capacity-clamp copy sees zeros.
    if stages & 4:
        combs = []
        for p in range(P):
            x = xs[p]
            high = jnp.where(high_mask, x, 0)
            if not (stages & 64):
                low = jnp.where(low_mask, x, 0)
                high_dn = pltpu.roll(high, 1, axis=0)
                high_dn = jnp.where(first_row, 0, high_dn)
                comb = low | high_dn
            else:
                comb = x
            combs.append(_extract_bytes(comb))
        bounds = (0,) + ladder
        for k in range(len(ladder)):
            lo, hi = bounds[k], bounds[k + 1]

            @pl.when(jnp.logical_or(need > lo, t == nt - 1))
            def _(lo=lo, hi=hi):
                onehot_k = (q - lo == _iota2((R, hi - lo), 1)
                            ).astype(jnp.int8)
                for p in range(P):
                    scat = _rowscatter_mxu_u32(combs[p], onehot_k, hi - lo)
                    obuf_ref[slot, p, lo:hi] = scat
    else:
        for p in range(P):
            x = xs[p]
            high = jnp.where(high_mask, x, 0)
            comb = x if (stages & 64) else jnp.where(low_mask, x, 0)
            scat = jnp.concatenate(
                [comb, jnp.zeros((WIN - R, _L), jnp.int32)], 0)
            obuf_ref[slot, p] = scat.astype(jnp.uint32)

    if not (stages & 32):
        for p in range(P):
            x = xs[p]
            high = jnp.where(high_mask, x, 0)
            row0 = obuf_ref[slot, p, :1].astype(jnp.int32)
            obuf_ref[slot, p, :1] = (
                row0 | carry_ref[p, :1].astype(jnp.int32)).astype(jnp.uint32)

            # wrapped tail of the LAST source row lands one row below its
            # scatter destination: single dynamic-row RMW
            blk = obuf_ref[slot, p, pl.ds(qlast1, 1)].astype(jnp.int32)
            hv32 = high[R - 1:R].astype(jnp.int32)
            obuf_ref[slot, p, pl.ds(qlast1, 1)] = (
                blk | hv32).astype(jnp.uint32)

            # new carry: the partial row at the stream end
            blk2 = obuf_ref[slot, p, pl.ds(end_row, 1)].astype(jnp.int32)
            newc = jnp.where(live_row0 & live_lane, blk2, 0)
            carry_ref[p] = newc.astype(jnp.uint32)

    @pl.when(jnp.logical_and(t < nt - 1, (stages & 128) == 0))
    def _():
        _ladder_copy(obuf_ref.at[slot], out_ref, out_row, need,
                     sems.at[slot], ladder, wait=False)

    @pl.when(t == nt - 1)
    def _():
        # final tile: clamp the window so nothing writes past cap_rows.
        # out_row <= cap_rows - R always, so over = out_row+WIN-cap_rows
        # is in (-inf, 2].
        over = out_row + WIN - cap_rows

        for h, cond_of in ((WIN, lambda o: o <= 0), (WIN - 1, lambda o: o == 1),
                           (WIN - 2, lambda o: o >= 2)):
            @pl.when(cond_of(over))
            def _(h=h):
                cp = pltpu.make_async_copy(
                    obuf_ref.at[slot, :, pl.ds(0, h)],
                    out_ref.at[:, pl.ds(out_row, h)],
                    sems.at[slot])
                cp.start()
                cp.wait()

        @pl.when(jnp.logical_and(nt >= 2, (stages & 128) == 0))
        def _():
            prev_row = offs_ref[t - 1] // _L
            _ladder_copy(obuf_ref.at[1 - slot], out_ref, prev_row,
                         _need_rows(offs_ref, t - 1), sems.at[1 - slot],
                         ladder, wait=True)


def tile_offsets(keep_u8, tile_r):
    """Exclusive per-tile prefix of selected counts (nt+1,) int32.  Under
    jit this fuses with the bitmap unpack that produced keep_u8."""
    per_tile = jnp.sum(keep_u8.reshape(-1, tile_r * _L), axis=1,
                       dtype=jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(per_tile, dtype=jnp.int32)])


@functools.partial(jax.jit, static_argnames=("tile_r", "nladder", "stages", "win_rows"))
def _compact3_call(planes, keep_u8, offs, *, tile_r, nladder=4, stages=15,
                   win_rows=None, outinit=None):
    P, n = planes.shape
    cap_rows = n // _L
    nt = n // (tile_r * _L)
    win = tile_r + 2 if win_rows is None else win_rows
    nladder = max(nladder, 1)
    ladder = tuple(win * (i + 1) // nladder for i in range(nladder - 1)
                   ) + (win,)
    if outinit is None:
        outinit = jnp.zeros((P, cap_rows, _L), jnp.uint32)
    else:
        outinit = outinit.reshape(P, cap_rows, _L)
    kern = functools.partial(_compact3_kernel, tile_r=tile_r,
                             cap_rows=cap_rows, P=P, ladder=ladder,
                             win_rows=win, stages=stages)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((tile_r, _L), lambda t, offs: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, tile_r, _L), lambda t, offs: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, P, win, _L), jnp.uint32),
                pltpu.VMEM((P, 8, _L), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((P, cap_rows, _L), jnp.uint32),
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(offs, keep_u8.reshape(-1, _L),
          planes.reshape(P, -1, _L), outinit)
    return out.reshape(P, n)


TILE_R_OPTIONS = (1024, 512, 256, 128)

_VMEM_BUDGET = 13 * 1024 * 1024


def _vmem_bytes(tile_r: int, P: int) -> int:
    win = tile_r + 2
    return 4 * (
        2 * P * win * _L          # double-buffered output windows
        + P * 8 * _L              # carry rows
        + 2 * P * tile_r * _L     # pipelined input plane blocks (2 slots)
        + 2 * tile_r * _L         # padded keep-word blocks (2 slots)
    )


def pick_tile_r(n: int, P: int = 1):
    for r in TILE_R_OPTIONS:
        if n % (r * _L) == 0 and _vmem_bytes(r, P) <= _VMEM_BUDGET:
            return r
    return None


def supported(n: int, P: int = 1) -> bool:
    return n > 0 and pick_tile_r(n, P) is not None


def compact_planes(planes, keep_u8, *, tile_r=None, offs=None,
                   nladder=4):
    """Compact (P, n) u32 planes by an (n,) u8 0/1 keep mask.

    Returns the (P, n) compacted planes: words [0, count) kept in order,
    words [count, n) zero.  The count is offs[-1] (or the plan popcount).

    Wide plane stacks are split into VMEM-budget chunks sharing the mask
    (and the offsets pass).
    """
    P, n = planes.shape
    if tile_r is None:
        p_max = P
        while p_max > 1 and pick_tile_r(n, p_max) is None:
            p_max -= 1
        if pick_tile_r(n, p_max) is None:
            raise ValueError(
                f"compact3: n={n} not a multiple of any tile size")
        tile_r = pick_tile_r(n, p_max)
        if p_max < P:
            if offs is None:
                offs = tile_offsets(keep_u8, tile_r)
            outs = [
                compact_planes(planes[i:i + p_max], keep_u8,
                               tile_r=tile_r, offs=offs, nladder=nladder)
                for i in range(0, P, p_max)
            ]
            return jnp.concatenate(outs, axis=0)
    if offs is None:
        offs = tile_offsets(keep_u8, tile_r)
    return _compact3_call(planes, keep_u8, offs, tile_r=tile_r,
                          nladder=nladder)
