"""Stage-ablation timing for the Pallas compaction kernel.

Variants (timing-only; outputs wrong for ablated stages):
  copy      — pure windowed passthrough (grid + DMA floor)
  book      — bookkeeping (rank/offsets) + passthrough
  lane      — + lane compaction rolls
  rot       — + row rotation
  full      — + split/merge/rowscatter (== real kernel)
"""
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import sys
    sys.path.insert(0, "/root/repo")
    from arrowtpu.pallas import compact as pc
    from bench import loop_time

    _L = 128

    def _iota2(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

    def kernel(info_ref, keep_ref, x_ref, outinit_ref, out_ref,
               obuf_ref, carry_ref, sems, *, tile_r, stage):
        del outinit_ref
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        R = tile_r
        _WIN = R + 8
        _SUPER = 8 * _L
        P = x_ref.shape[0]
        odtype = out_ref.dtype

        @pl.when(t == 0)
        def _():
            carry_ref[...] = jnp.zeros((P, 8, _L), odtype)

        keep_i8 = keep_ref[...].astype(jnp.int8)
        keep_i32 = keep_ref[...].astype(jnp.int32)
        xs = [x_ref[p] for p in range(P)]

        if stage >= 1:
            up_strict = (_iota2((_L, _L), 0) < _iota2((_L, _L), 1)).astype(jnp.int8)
            rank = jax.lax.dot_general(
                keep_i8, up_strict,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            counts = rank[:, _L - 1:] + keep_i32[:, _L - 1:]
            row_tri = (_iota2((R, R), 0) > _iota2((R, R), 1)).astype(jnp.bfloat16)
            rowx = jnp.dot(row_tri, counts.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            base = info_ref[t] % _SUPER
            Q = base + rowx
            S = Q % _L
            q = Q // _L
        if stage >= 2:
            xs = pc._lane_compact_left_multi(xs, keep_i32, rank)
        if stage >= 3:
            xs = pc._rotate_rows_right_multi(xs, S)
        if stage >= 4:
            lane = _iota2((R, _L), 1)
            e = S + counts
            low_mask = (lane >= S) & (lane < jnp.minimum(e, _L))
            high_mask = lane < (e - _L)
            first_row = _iota2((R, _L), 0) == 0
            onehot = (q == _iota2((R, _WIN), 1)).astype(jnp.int8)

        slot = t % 2

        @pl.when(t >= 2)
        def _():
            prev_row = pl.multiple_of(((t - 2) * R // 8) * 8, 8)
            pltpu.make_async_copy(
                obuf_ref.at[slot],
                out_ref.at[:, pl.ds(prev_row, _WIN)],
                sems.at[slot],
            ).wait()

        for p in range(P):
            x = xs[p]
            if stage >= 4:
                low = jnp.where(low_mask, x, 0)
                high = jnp.where(high_mask, x, 0)
                high_dn = pltpu.roll(high, 1, axis=0)
                high_dn = jnp.where(first_row, 0, high_dn)
                comb = low | high_dn
                scat = pc._rowscatter_mxu_u32(comb, onehot, _WIN)
                win = scat.astype(jnp.int32)
            else:
                win = jnp.concatenate(
                    [x.astype(jnp.int32), jnp.zeros((8, _L), jnp.int32)], 0)
            obuf_ref[slot, p] = win.astype(odtype)

        out_row = pl.multiple_of((t * R // 8) * 8, 8)
        cp = pltpu.make_async_copy(
            obuf_ref.at[slot], out_ref.at[:, pl.ds(out_row, _WIN)], sems.at[slot])
        cp.start()

        @pl.when(t == nt - 1)
        def _():
            cp.wait()

            @pl.when(nt >= 2)
            def _():
                prev_row = pl.multiple_of(((t - 1) * R // 8) * 8, 8)
                pltpu.make_async_copy(
                    obuf_ref.at[1 - slot],
                    out_ref.at[:, pl.ds(prev_row, _WIN)],
                    sems.at[1 - slot],
                ).wait()

    @functools.partial(jax.jit, static_argnames=("tile_r", "stage"))
    def call(planes, keep_u8, info, *, tile_r, stage):
        P, n = planes.shape
        nt = n // (tile_r * _L)
        win = tile_r + 8
        out_rows = n // _L + win
        outinit = jnp.zeros((P, out_rows, _L), jnp.uint32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nt,),
            in_specs=[
                pl.BlockSpec((tile_r, _L), lambda t, info: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, tile_r, _L), lambda t, info: (0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, P, win, _L), jnp.uint32),
                pltpu.VMEM((P, 8, _L), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ])
        kern = functools.partial(kernel, tile_r=tile_r, stage=stage)
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((P, out_rows, _L), jnp.uint32),
                input_output_aliases={3: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(info, keep_u8.reshape(-1, _L), planes.reshape(P, -1, _L), outinit)
        return out.reshape(P, -1)[:, :n]

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8060928)
    ap.add_argument("--P", default="1,2")
    ap.add_argument("--tiles", default="512,256")
    ap.add_argument("--stages", default="0,1,2,3,4")
    args = ap.parse_args()
    n = args.n
    names = {0: "copy", 1: "book", 2: "lane", 3: "rot", 4: "full"}
    rng = np.random.default_rng(0)
    keep = jnp.asarray((rng.random(n) > 0.5).astype(np.uint8))
    for P in [int(x) for x in args.P.split(",")]:
        planes = jnp.asarray(rng.integers(0, 2**32, (P, n), dtype=np.uint32))
        for tile_r in [int(x) for x in args.tiles.split(",")]:
            info = jax.jit(lambda k: pc.tile_info(k, tile_r))(keep)
            for stage in [int(x) for x in args.stages.split(",")]:
                name = names[stage]
                def step(args):
                    pp, kk, ii = args
                    out = call(pp, kk, ii, tile_r=tile_r, stage=stage)
                    bump = (out[0, 0] >> 31).astype(pp.dtype) & 0
                    # data-dependent carry: xor a lane of output into keep? keep it simple
                    return (pp + (out[0, 0] >> 31).astype(pp.dtype), kk, ii)
                dt = loop_time(step, (planes, keep, info))
                gbps = (P * n * 4 * 2 + n) / dt / 1e9
                print(f"P={P} tile_r={tile_r} {name:5s}: {dt*1e3:7.3f} ms  ({gbps:5.0f} GB/s moved)")


if __name__ == "__main__":
    main()
