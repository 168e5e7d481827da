"""Masked stream compaction as a fused Pallas TPU kernel.

The filter kernel's core problem (reference arrow-select/src/filter.rs:201;
our XLA formulation in ops/filter.py) is: given value planes and a keep
mask, move kept rows to the front, preserving order.  HLO scatter
serializes this on TPU.  Here it runs at vector/MXU speed:

  * the input is viewed per plane as (rows, 128) uint32 — row-major, so
    logical element e lives at (e // 128, e % 128); XLA reshapes to this
    layout for free;
  * the grid walks tiles of TILE = G*128 elements.  Within a tile the
    exclusive prefix sum of `keep` (= each kept element's output slot) is
    computed with triangular-ones matmuls on the MXU;
  * compaction itself is a one-hot matmul: out2d = Pg^T @ M, where
    Pg[i, g] = keep[i] & (slot(i)//128 == g) selects the output row and
    M[i, l] = value(i) * (slot(i)%128 == l) places the value in its output
    lane.  Values are split into u16 halves so f32 MXU accumulation is
    exact (every output cell receives at most one nonzero term);
  * tiles append to the global output stream with a DMA at a dynamic
    (unaligned) row offset; a carry row + running remainder stitch tile
    boundaries (elements are rolled by the remainder with pltpu.roll).
    The TPU grid is sequential, so appends happen in order;
  * a second zero-block DMA per step clears the region ahead of the
    stream so the engine's padding contract (rows >= count are zero)
    holds without an extra XLA pass over the output.

Returns the compacted planes; the caller computes the count (a cheap XLA
reduction) and carries it as the new column length.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _transpose(x):
    """(a, b) -> (b, a).  jnp.transpose is not generally lowerable in
    Mosaic for non-square shapes; contract dim0 against an identity on the
    MXU instead (exact for integer-valued f32 inputs)."""
    a = x.shape[0]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (a, a), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (a, a), 1)
    ).astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    return jax.lax.dot_general(x, eye, dn, preferred_element_type=jnp.float32)


def _kernel(keep_ref, *refs, g_rows, n_planes):
    plane_refs = refs[:n_planes]
    out_refs = refs[n_planes : 2 * n_planes]
    # scratch: per-plane append buffers, zeros block, carry rows, smem state,
    # dma sems
    bufs = refs[2 * n_planes : 3 * n_planes]
    zeros_blk = refs[3 * n_planes]
    carry = refs[3 * n_planes + 1]  # (n_planes, LANES) u32
    state = refs[3 * n_planes + 2]  # SMEM (2,) int32: [rem, w]
    sems = refs[3 * n_planes + 3]

    G = g_rows
    TILE = G * LANES
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        state[0] = 0
        state[1] = 0
        carry[...] = jnp.zeros_like(carry)
        zeros_blk[...] = jnp.zeros_like(zeros_blk)

    keep2d = keep_ref[...].astype(jnp.float32)  # (G, LANES) 0/1

    # --- exclusive prefix sum over the tile (row-major element order) ----
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    l_iota_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    strict_ut = (l_iota < l_iota_c).astype(jnp.float32)  # [l', l] = l' < l
    dn = (((1,), (0,)), ((), ()))
    lane_excl = jax.lax.dot_general(keep2d, strict_ut, dn,
                                    preferred_element_type=jnp.float32)
    ones_col = jnp.ones((LANES, 1), dtype=jnp.float32)
    row_tot = jax.lax.dot_general(keep2d, ones_col, dn,
                                  preferred_element_type=jnp.float32)  # (G,1)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    g_iota_c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    strict_lt = (g_iota_c < g_iota).astype(jnp.float32)
    row_off = jax.lax.dot_general(strict_lt, row_tot, dn,
                                  preferred_element_type=jnp.float32)  # (G,1)
    pos = (lane_excl + row_off).astype(jnp.int32)  # (G, LANES) output slot
    cnt = (row_off[G - 1, 0] + row_tot[G - 1, 0]).astype(jnp.int32)

    keep_i = keep_ref[...]
    pos_l = pos & (LANES - 1)
    pos_g = pos >> 7

    # --- transposed forms: element i = g*LANES + l maps to chunk row l ---
    pos_lT = _transpose(pos_l.astype(jnp.float32)).astype(jnp.int32)  # (LANES, G)
    pos_gT = _transpose(pos_g.astype(jnp.float32)).astype(jnp.int32)
    keepT = _transpose(keep_i.astype(jnp.float32)).astype(jnp.int32)

    # Pg: (TILE, G) one-hot output-row selector, assembled G chunk-rows at
    # a time in transposed (lane-chunk) form.
    lane_rows = jax.lax.broadcasted_iota(jnp.int32, (LANES, G), 1)  # target g
    pg_chunks = []
    for g in range(G):
        sel = (pos_gT[:, g : g + 1] == lane_rows) & (keepT[:, g : g + 1] == 1)
        pg_chunks.append(sel.astype(jnp.float32))
    pg = jnp.concatenate(pg_chunks, axis=0)  # (TILE, G)

    lane_cols = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    rem = state[0]
    w = state[1]

    out_row_iota = jax.lax.broadcasted_iota(jnp.int32, (G, LANES), 0)
    out_lane_iota = jax.lax.broadcasted_iota(jnp.int32, (G, LANES), 1)
    out_elem = out_row_iota * LANES + out_lane_iota

    dnc = (((0,), (0,)), ((), ()))  # contract TILE dim

    for p in range(n_planes):
        v = plane_refs[p][...]  # (G, LANES) uint32
        v_hi = (v >> 16).astype(jnp.int32).astype(jnp.float32)
        v_lo = (v & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
        v_hiT = _transpose(v_hi)  # (LANES, G)
        v_loT = _transpose(v_lo)
        m_hi_chunks = []
        m_lo_chunks = []
        for g in range(G):
            onehot = (pos_lT[:, g : g + 1] == lane_cols) & (
                keepT[:, g : g + 1] == 1
            )
            oh = onehot.astype(jnp.float32)
            m_hi_chunks.append(oh * v_hiT[:, g : g + 1])
            m_lo_chunks.append(oh * v_loT[:, g : g + 1])
        m_hi = jnp.concatenate(m_hi_chunks, axis=0)  # (TILE, LANES)
        m_lo = jnp.concatenate(m_lo_chunks, axis=0)
        c_hi = jax.lax.dot_general(pg, m_hi, dnc,
                                   preferred_element_type=jnp.float32)
        c_lo = jax.lax.dot_general(pg, m_lo, dnc,
                                   preferred_element_type=jnp.float32)
        comp = (c_hi.astype(jnp.int32).astype(jnp.uint32) << 16) | c_lo.astype(
            jnp.int32
        ).astype(jnp.uint32)  # (G, LANES), element m at (m//128, m%128)
        comp = jnp.where(out_elem < cnt, comp, jnp.uint32(0))

        # ragged append: roll by rem with inter-row carry
        comp_z = jnp.concatenate(
            [comp, jnp.zeros((1, LANES), dtype=jnp.uint32)], axis=0
        )  # (G+1, LANES)
        lr = pltpu.roll(comp_z, rem, axis=1)
        lr_prev = jnp.concatenate(
            [jnp.zeros((1, LANES), dtype=jnp.uint32), lr[:G]], axis=0
        )
        lane_pos = jax.lax.broadcasted_iota(jnp.int32, (G + 1, LANES), 1)
        rolled = jnp.where(lane_pos >= rem, lr, lr_prev)
        # merge carry into row 0 (carry holds lanes < rem; rolled row0 lanes
        # < rem are zero)
        first = rolled[0:1] | carry[p : p + 1]
        # scratch rows are padded to a sublane multiple; write/DMA explicit
        # slices (whole-ref DMA of an unaligned scratch faults the backend)
        bufs[p][0 : G + 1, :] = jnp.concatenate([first, rolled[1:]], axis=0)

    new_total = rem + cnt
    full_rows = new_total >> 7
    new_rem = new_total & (LANES - 1)

    # zero the block ahead of the stream (keeps padding-zero contract);
    # must land before this step's data in case of overlap
    out_rows = out_refs[0].shape[0]
    zoff = jnp.minimum((step + 1) * (G + 1), out_rows - (G + 1))
    for p in range(n_planes):
        dz = pltpu.make_async_copy(
            zeros_blk.at[pl.ds(jnp.int32(0), G + 1)],
            out_refs[p].at[pl.ds(zoff, G + 1)],
            sems,
        )
        dz.start()
        dz.wait()
    for p in range(n_planes):
        d = pltpu.make_async_copy(
            bufs[p].at[pl.ds(jnp.int32(0), G + 1)],
            out_refs[p].at[pl.ds(w, G + 1)],
            sems,
        )
        d.start()
        d.wait()
        # new carry = the (possibly partial) row at full_rows
        carry[p : p + 1] = bufs[p][pl.ds(full_rows, 1), :]

    state[0] = new_rem
    state[1] = w + full_rows


@functools.partial(
    jax.jit, static_argnames=("g_rows", "interpret")
)
def compact_planes(
    planes: Sequence[jax.Array],
    keep: jax.Array,
    g_rows: int = 32,
    interpret: bool = False,
):
    """Compact uint32 planes by a boolean keep mask, preserving order.

    planes: list of (n,) uint32 arrays (n % (g_rows*128) == 0).
    keep:   (n,) bool.
    Returns ([compacted (n,) uint32 ...], count int32); elements beyond
    count are zero.
    """
    planes = list(planes)
    n = planes[0].shape[0]
    G = g_rows
    TILE = G * LANES
    assert n % TILE == 0, (n, TILE)
    num_tiles = n // TILE
    rows = n // LANES
    out_rows = rows + G + 1

    keep2d = keep.reshape(rows, LANES).astype(jnp.int32)
    planes2d = [p.reshape(rows, LANES) for p in planes]
    np_ = len(planes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((G, LANES), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec((G, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM)
            for _ in range(np_)
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(np_)],
        scratch_shapes=[pltpu.VMEM((G + 8, LANES), jnp.uint32) for _ in range(np_)]
        + [
            pltpu.VMEM((G + 8, LANES), jnp.uint32),  # zeros block
            pltpu.VMEM((np_, LANES), jnp.uint32),  # carries
            pltpu.SMEM((2,), jnp.int32),  # rem, w
            pltpu.SemaphoreType.DMA,
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, g_rows=G, n_planes=np_),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32)
            for _ in range(np_)
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(keep2d, *planes2d)
    count = jnp.sum(keep2d, dtype=jnp.int32)
    return [o[:rows].reshape(n) for o in outs], count
