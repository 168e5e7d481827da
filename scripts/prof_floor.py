"""DMA-structure floor probes: passthrough kernels with different output
strategies, timed with the fori-slope harness.

  A: output via pipelined BlockSpec (block t = rows [t*R,(t+1)*R))
  B: manual async copy, aligned non-overlapping R-row blocks, 2 slots
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from bench import loop_time

    _L = 128

    # ---- A: pipelined output BlockSpec --------------------------------
    def kern_a(keep_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...] + keep_ref[...][None].astype(jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("tile_r",))
    def call_a(planes, keep, *, tile_r):
        P, n = planes.shape
        nt = n // (tile_r * _L)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern_a,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((tile_r, _L), lambda t: (t, 0)),
                    pl.BlockSpec((P, tile_r, _L), lambda t: (0, t, 0)),
                ],
                out_specs=pl.BlockSpec((P, tile_r, _L), lambda t: (0, t, 0)),
                out_shape=jax.ShapeDtypeStruct((P, n // _L, _L), jnp.uint32),
            )(keep.reshape(-1, _L), planes.reshape(P, -1, _L))

    # ---- B: manual aligned async copies -------------------------------
    def kern_b(keep_ref, x_ref, o_ref, obuf, sems, *, tile_r):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        P = x_ref.shape[0]
        R = tile_r
        slot = t % 2

        @pl.when(t >= 2)
        def _():
            pltpu.make_async_copy(
                obuf.at[slot], o_ref.at[:, pl.ds((t - 2) * R, R)],
                sems.at[slot]).wait()

        for p in range(P):
            obuf[slot, p] = x_ref[p] + keep_ref[...].astype(jnp.uint32)

        cp = pltpu.make_async_copy(
            obuf.at[slot], o_ref.at[:, pl.ds(t * R, R)], sems.at[slot])
        cp.start()

        @pl.when(t == nt - 1)
        def _():
            cp.wait()

            @pl.when(nt >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[1 - slot], o_ref.at[:, pl.ds((t - 1) * R, R)],
                    sems.at[1 - slot]).wait()

    @functools.partial(jax.jit, static_argnames=("tile_r",))
    def call_b(planes, keep, *, tile_r):
        P, n = planes.shape
        nt = n // (tile_r * _L)
        with jax.enable_x64(False):
            return pl.pallas_call(
                functools.partial(kern_b, tile_r=tile_r),
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((tile_r, _L), lambda t: (t, 0)),
                    pl.BlockSpec((P, tile_r, _L), lambda t: (0, t, 0)),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((P, n // _L, _L), jnp.uint32),
                scratch_shapes=[
                    pltpu.VMEM((2, P, tile_r, _L), jnp.uint32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(keep.reshape(-1, _L), planes.reshape(P, -1, _L))

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8060928)
    ap.add_argument("--P", default="2")
    ap.add_argument("--tiles", default="512,1024")
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(0)
    keep = jnp.asarray((rng.random(n) > 0.5).astype(np.uint8))
    for P in [int(x) for x in args.P.split(",")]:
        planes = jnp.asarray(rng.integers(0, 2**32, (P, n), dtype=np.uint32))
        for tile_r in [int(x) for x in args.tiles.split(",")]:
            if n % (tile_r * _L):
                continue
            for name, call in (("blockspec", call_a), ("manual", call_b)):
                def step(args_):
                    pp, kk = args_
                    out = call(pp, kk, tile_r=tile_r)
                    return (pp + (out[0, 0, 0] >> 31).astype(pp.dtype), kk)
                dt = loop_time(step, (planes, keep))
                gbps = (P * n * 4 * 2 + n) / dt / 1e9
                print(f"P={P} tile_r={tile_r:5d} {name:9s}: {dt*1e3:7.3f} ms"
                      f"  ({gbps:5.0f} GB/s moved)", flush=True)


if __name__ == "__main__":
    main()
