"""Masked stream compaction as a Pallas TPU kernel.

The selection plane's core primitive (reference arrow-select/src/filter.rs:201
`filter`; our engine-wide capacity+count contract in ops/filter.py): given
value planes and a keep mask, move kept rows to the front preserving order.
An HLO scatter serializes on TPU (~0.3 GB/s measured round 1); this kernel
streams orders of magnitude faster (crossbar/VPU-bound, see bench.py).

Algorithm (validated against numpy in tests/test_pallas_compact.py):

  each plane is viewed as (rows, 128) row-major, walked in tiles of
  (TILE_R, 128) words by a sequential grid.  Per tile:

  1. *ranks*: the within-row exclusive prefix sum of `keep` rides the MXU
     as an int8 matmul with a strictly-upper-triangular ones matrix
     (exclusive sums are <= 127 so int8 operands are exact; accumulation
     is exact because partial products are 0/1).  The across-row offset
     cumsum is a bf16 matmul (counts <= 128 are exact in bf16; f32
     accumulation is exact below 2^24).
  2. *lane compaction*: each 128-lane row compacts its kept words to the
     front with log2(128)=7 rounds of roll+select.  Destinations are
     monotone within a row, so rounds never collide (elements move left
     by bit b of their remaining distance; vacated slots zero their
     distance so stale copies can never move again).  The distance
     bookkeeping is computed once and shared by every plane.
  3. *row rotate*: row r's compacted run belongs at window flat offset
     Q_r = base + sum(counts[<r]); rotate the row right by Q_r % 128
     (per-row circular rotation, 7 conditional-roll rounds, bits shared
     across planes).
  4. *row scatter*: split each rotated row into its non-wrapped (`low`)
     and wrapped (`high`) lane regions; high_(r) merges into low_(r+1)
     (same destination row, disjoint lanes).  The merged rows move to
     their destination rows with a one-hot (R, WIN) int8 matmul — one
     shared matrix per tile, so the MXU does the cross-row movement; u32
     payloads are split into exact byte planes.  A VPU log-shift fallback
     exists behind `rs_mode`.
  5. *append*: the (R+8)-row window lands at the 8-row-aligned output
     superblock containing the stream position (int8 memrefs require
     8-row-aligned DMA offsets) via one async copy for all planes; a VMEM
     carry superblock stitches the partial boundary between tiles.  The
     TPU grid is sequential, so appends happen in order; window cells past
     the stream are zero, so chained windows leave zeros behind the data
     (padding contract).

Entry points (static shapes, jit-safe):

  compact_words(plane_u32, keep_u8)  -> (compacted u32 plane, count)
  compact_bytes(plane_u8,  keep_u8)  -> (compacted u8 plane, count)
  tile_info / compact_planes_info    -> multi-plane form: (P, n) planes of
     one dtype share one keep mask, one tile_info, and one in-kernel
     bookkeeping pass (the 64-bit limb / string-view column fast path;
     ops/filter.py uses this)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R_OPTIONS = (512, 256, 128)   # rows of 128 words per tile (largest wins)
TILE_R = 128                       # smallest supported tile (back-compat)
TILE = TILE_R * 128                # smallest tile in words (16384)
_L = 128                           # lanes


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _lane_compact_left_multi(xs, keep_i32, rank):
    """Per-row monotone left compaction (7 roll+select rounds); the
    distance bookkeeping is shared across all payload planes."""
    shape = xs[0].shape
    lane = _iota2(shape, 1)
    d = jnp.where(keep_i32 == 1, lane - rank, 0)
    xs = list(xs)
    for b in range(7):
        s = 1 << b
        dm = pltpu.roll(d, _L - s, axis=1)      # d of lane+s (circular view)
        arrive = ((dm & s) != 0) & (lane < _L - s)
        moving = (d & s) != 0
        for i, x in enumerate(xs):
            xs[i] = jnp.where(arrive, pltpu.roll(x, _L - s, axis=1), x)
        d = jnp.where(arrive, dm - s, jnp.where(moving, 0, d))
    return xs


def _rotate_rows_right_multi(xs, shift):
    """Rotate row r right by shift[r] (per-row circular rotation)."""
    xs = list(xs)
    for b in range(7):
        s = 1 << b
        bit = (shift & s) != 0                  # (R,1) broadcasts over lanes
        for i, x in enumerate(xs):
            xs[i] = jnp.where(bit, pltpu.roll(x, s, axis=1), x)
    return xs


def _rowscatter_mxu_plane(onehot_i8, plane_i32):
    """One byte plane: out[j,l] = sum_r onehot[r,j] * plane[r,l], exact
    (every output cell receives at most one nonzero contribution; the int8
    cast sign-extends bytes >= 128, recovered by & 0xFF on the way out)."""
    return jax.lax.dot_general(
        onehot_i8, plane_i32.astype(jnp.int8),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _rowscatter_mxu_u32(comb, onehot, win):
    """Move row r of comb (u32 bit patterns) to window row q[r]: four
    per-byte one-hot int8 matmuls sharing one (R, win) matrix."""
    xu = comb if comb.dtype == jnp.uint32 else comb.astype(jnp.uint32)
    out = jnp.zeros((win, _L), jnp.uint32)
    for k in range(4):
        plane = ((xu >> (8 * k)) & 0xFF).astype(jnp.int32)
        y = _rowscatter_mxu_plane(onehot, plane)
        out = out | ((y.astype(jnp.uint32) & 0xFF) << (8 * k))
    return out.astype(jnp.int32)


def _rowscatter_mxu_u8(comb_i32, onehot):
    """Byte payloads (values 0..255): a single one-hot matmul."""
    y = _rowscatter_mxu_plane(onehot, comb_i32)
    return (y & 0xFF).astype(jnp.int32)


def _rowscatter_vpu(comb_i32, q, win):
    """Log-shift rows upward with OR-merge (safe: equal-dest rows merge at
    equal remaining distance; distinct dests never collide — monotone).
    Destinations may sit up to `win - R` rows BELOW the source, so comb is
    first placed at the bottom of the window and everything shifts up."""
    R = comb_i32.shape[0]
    pad = win - R
    comb = jnp.concatenate(
        [jnp.zeros((pad, _L), comb_i32.dtype), comb_i32], axis=0)
    dr = (_iota2((win, 1), 0)
          - jnp.concatenate([jnp.zeros((pad, 1), jnp.int32), q], axis=0))
    dr = jnp.where(_iota2((win, 1), 0) < pad, 0, dr)   # padding rows inert
    for b in range(win.bit_length()):
        s = 1 << b
        if s >= win:
            break
        drm = pltpu.roll(dr, win - s, axis=0)
        cm = pltpu.roll(comb, win - s, axis=0)
        arrive = ((drm & s) != 0) & (_iota2((win, 1), 0) < win - s)
        moving = (dr & s) != 0
        stay = jnp.where(moving, 0, comb)
        comb = jnp.where(arrive, cm, 0) | stay
        dr = jnp.where(arrive, drm - s, jnp.where(moving, 0, dr))
    return comb


def _compact_kernel(info_ref, keep_ref, x_ref, outinit_ref, out_ref,
                    obuf_ref, carry_ref, sems, *, is_u32, rs_mode, tile_r):
    del outinit_ref  # aliased with out_ref; only there for zero-init
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    R = tile_r
    _WIN = R + 8
    _SUPER = 8 * _L      # flat words per aligned 8-row superblock
    P = x_ref.shape[0]
    odtype = out_ref.dtype

    @pl.when(t == 0)
    def _():
        carry_ref[...] = jnp.zeros((P, 8, _L), odtype)

    keep_i8 = keep_ref[...].astype(jnp.int8)             # (R,128) 0/1 (MXU)
    keep_i32 = keep_ref[...].astype(jnp.int32)           # (8-bit vector
    # comparisons are rejected by this target, so compares run in i32)
    # payload stays in its storage dtype through the movement stages
    # (rolls/selects are dtype-agnostic); the 8-bit mode widens, since
    # Mosaic rejects 8-bit rolls on this toolchain.
    xs = [x_ref[p] if is_u32 else x_ref[p].astype(jnp.int32)
          for p in range(P)]
    zero_x = jnp.zeros((), xs[0].dtype)

    # ---- stage 1: prefix sums (MXU) -------------------------------------
    up_strict = (_iota2((_L, _L), 0) < _iota2((_L, _L), 1)).astype(jnp.int8)
    rank = jax.lax.dot_general(
        keep_i8, up_strict,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                    # (R,128) exclusive
    counts = rank[:, _L - 1:] + keep_i32[:, _L - 1:]     # (R,1)
    row_tri = (_iota2((R, R), 0) > _iota2((R, R), 1)).astype(jnp.bfloat16)
    rowx = jnp.dot(row_tri, counts.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    total = rowx[R - 1, 0] + counts[R - 1, 0]            # scalar

    # window anchor: the 8-row superblock containing the stream position
    base = info_ref[t] % _SUPER              # flat offset within superblock
    Q = base + rowx                          # (R,1) flat starts in window
    S = Q % _L
    q = Q // _L                              # dest window row, < R + 8

    # ---- stages 2+3: in-row movement (VPU, shared bookkeeping) -----------
    xs = _lane_compact_left_multi(xs, keep_i32, rank)
    xs = _rotate_rows_right_multi(xs, S)

    # ---- stage 4+5: split, merge, row scatter, window stitch --------------
    lane = _iota2((R, _L), 1)
    e = S + counts
    low_mask = (lane >= S) & (lane < jnp.minimum(e, _L))
    high_mask = lane < (e - _L)
    first_row = _iota2((R, _L), 0) == 0
    onehot = (q == _iota2((R, _WIN), 1)).astype(jnp.int8) \
        if rs_mode == "mxu" else None

    end = base + total                       # flat stream end within window
    end_row = end // _L
    end_lane = end % _L
    del end_lane
    slot = t % 2

    @pl.when(t >= 2)
    def _():
        prev_row = pl.multiple_of((info_ref[t - 2] // _SUPER) * 8, 8)
        pltpu.make_async_copy(
            obuf_ref.at[slot],
            out_ref.at[:, pl.ds(prev_row, _WIN)],
            sems.at[slot],
        ).wait()

    qlast1 = q[R - 1, 0] + 1
    ql8 = pl.multiple_of((qlast1 // 8) * 8, 8)
    sel_over = _iota2((8, _L), 0) == (qlast1 - ql8)
    er8 = pl.multiple_of((end_row // 8) * 8, 8)
    flat = (er8 * _L + _iota2((8, _L), 0) * _L + _iota2((8, _L), 1))
    live_tail = flat < end

    for p in range(P):
        x = xs[p]
        low = jnp.where(low_mask, x, zero_x)
        high = jnp.where(high_mask, x, zero_x)
        high_dn = pltpu.roll(high, 1, axis=0)
        high_dn = jnp.where(first_row, zero_x, high_dn)
        comb = low | high_dn
        if rs_mode == "mxu" and is_u32:
            scat = _rowscatter_mxu_u32(comb, onehot, _WIN)
        elif rs_mode == "mxu":
            scat = _rowscatter_mxu_u8(comb, onehot)
        else:
            scat = _rowscatter_vpu(comb, q, _WIN)

        # window = scat | carry (first superblock); the overflow row (the
        # wrapped part of the last source row) lands via an aligned 8-row
        # read-modify-write.  Selects run in the i32 domain: Mosaic cannot
        # relayout i1 masks between 32-bit and 8-bit tilings.
        carry_pad = jnp.concatenate(
            [carry_ref[p].astype(jnp.int32),
             jnp.zeros((_WIN - 8, _L), jnp.int32)], axis=0)
        window = scat.astype(jnp.int32) | carry_pad
        obuf_ref[slot, p] = window.astype(odtype)

        blk = obuf_ref[slot, p, pl.ds(ql8, 8)].astype(jnp.int32)
        hv32 = high[R - 1:R].astype(jnp.int32)
        obuf_ref[slot, p, pl.ds(ql8, 8)] = (
            blk | jnp.where(sel_over, hv32, 0)).astype(odtype)

        # new carry: the partial superblock at the stream end
        blk2 = obuf_ref[slot, p, pl.ds(er8, 8)].astype(jnp.int32)
        carry_ref[p] = jnp.where(live_tail, blk2, 0).astype(odtype)

    out_row = pl.multiple_of((info_ref[t] // _SUPER) * 8, 8)
    cp = pltpu.make_async_copy(
        obuf_ref.at[slot], out_ref.at[:, pl.ds(out_row, _WIN)], sems.at[slot]
    )
    cp.start()

    @pl.when(t == nt - 1)
    def _():
        cp.wait()

        @pl.when(nt >= 2)
        def _():
            prev_row = pl.multiple_of((info_ref[t - 1] // _SUPER) * 8, 8)
            pltpu.make_async_copy(
                obuf_ref.at[1 - slot],
                out_ref.at[:, pl.ds(prev_row, _WIN)],
                sems.at[1 - slot],
            ).wait()


@functools.partial(jax.jit, static_argnames=("is_u32", "rs_mode", "interpret",
                                             "tile_r"))
def _compact_call(planes, keep_u8, info, *, is_u32, rs_mode, interpret,
                  tile_r):
    P, n = planes.shape
    nt = n // (tile_r * _L)
    win = tile_r + 8
    out_rows = n // _L + win
    odtype = planes.dtype
    outinit = jnp.zeros((P, out_rows, _L), odtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile_r, _L), lambda t, info: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, tile_r, _L), lambda t, info: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, P, win, _L), odtype),
            pltpu.VMEM((P, 8, _L), odtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_compact_kernel, is_u32=is_u32, rs_mode=rs_mode,
                             tile_r=tile_r)
    # The engine enables jax x64 globally (core/wide.py); inside the kernel
    # Python int literals would then trace as i64 scalars, which Mosaic
    # cannot lower.  Trace the kernel with x64 off — all kernel dtypes are
    # explicit 32-bit-or-narrower.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((P, out_rows, _L), odtype),
            input_output_aliases={3: 0},  # outinit (after info/keep/x) -> out
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(info, keep_u8.reshape(-1, _L), planes.reshape(P, -1, _L), outinit)
    return out.reshape(P, -1)[:, :n]


def _tile_info(keep_u8, nt, tile):
    counts = jnp.sum(keep_u8.reshape(nt, tile), axis=1, dtype=jnp.int32)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])


def pick_tile_r(n: int):
    """Largest supported tile height whose word-tile divides n, or None."""
    for r in TILE_R_OPTIONS:
        if n % (r * _L) == 0:
            return r
    return None


def supported(n: int) -> bool:
    """Whether a flat plane of n words can use the kernel directly."""
    return n > 0 and pick_tile_r(n) is not None


def tile_info(keep_u8, tile_r):
    """Cumulative kept counts per tile (scalar-prefetch input); shareable
    across planes compacted with the same keep mask."""
    tile = tile_r * _L
    return _tile_info(keep_u8, keep_u8.shape[0] // tile, tile)


def compact_planes_info(planes, keep_u8, info, tile_r, *, is_u32,
                        rs_mode="mxu", interpret=False):
    """Compact (P, n) same-dtype planes sharing one keep mask, tile_info
    and one in-kernel bookkeeping pass.  Returns ((P, n) out, count)."""
    out = _compact_call(planes, keep_u8, info, is_u32=is_u32,
                        rs_mode=rs_mode, interpret=interpret, tile_r=tile_r)
    return out, info[-1]


def _compact1(plane, keep_u8, *, is_u32, rs_mode, interpret, tile_r):
    n = plane.shape[0]
    tile_r = tile_r or pick_tile_r(n)
    if tile_r is None:
        raise ValueError(f"compact: n={n} not a multiple of any tile size")
    info = tile_info(keep_u8, tile_r)
    out, cnt = compact_planes_info(plane.reshape(1, -1), keep_u8, info,
                                   tile_r, is_u32=is_u32, rs_mode=rs_mode,
                                   interpret=interpret)
    return out[0], cnt


def compact_words(plane_u32, keep_u8, *, rs_mode="mxu", interpret=False,
                  tile_r=None):
    """Compact a (n,) uint32 plane by a (n,) uint8 0/1 keep mask.

    Returns (out, count): out[(i < count)] are the kept words in order,
    out[(i >= count)] are zero.  Requires pick_tile_r(n) to succeed.
    """
    return _compact1(plane_u32, keep_u8, is_u32=True, rs_mode=rs_mode,
                     interpret=interpret, tile_r=tile_r)


def compact_bytes(plane_u8, keep_u8, *, rs_mode="mxu", interpret=False,
                  tile_r=None):
    """Compact a (n,) uint8 plane by a (n,) uint8 0/1 keep mask."""
    return _compact1(plane_u8, keep_u8, is_u32=False, rs_mode=rs_mode,
                     interpret=interpret, tile_r=tile_r)
