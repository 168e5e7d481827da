"""Probe: dynamic lane gather on (R, 256) blocks (cross-register) vs
(R, 128); static expand gather; interleave shuffles.  Decides whether the
interleaved pair kernel (compact4) is viable."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import loop_time

    R = 512
    n_rows = 123 * R  # tiles
    rng = np.random.default_rng(0)

    def bench(name, kern, arrs, L):
        try:
            @jax.jit
            def run(*xs):
                grid = xs[0].shape[0] // R
                return pl.pallas_call(
                    kern,
                    grid=(grid,),
                    in_specs=[pl.BlockSpec((R, a.shape[1]),
                                           lambda t: (t, 0),
                                           memory_space=pltpu.VMEM)
                              for a in xs],
                    out_specs=pl.BlockSpec((R, L), lambda t: (t, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((xs[0].shape[0], L),
                                                   jnp.int32),
                )(*xs)

            def step(t):
                o = run(*t)
                bump = (o[:1, :1] >> 31).astype(jnp.int32)
                return (t[0].at[0, 0].add(bump[0, 0]),) + tuple(t[1:])
            dt = loop_time(step, tuple(arrs))
            per_elem = dt / (n_rows * 256) * 1e12
            print(f"{name:42s}: {dt*1e3:.3f} ms")
            return dt
        except Exception as e:
            print(f"{name:42s}: FAIL {type(e).__name__} {str(e)[:140]}")
            return None

    x256 = jnp.asarray(rng.integers(0, 2**31, (n_rows, 256), np.int64),
                       jnp.int32)
    x128 = x256[:, :128]
    idx256 = jnp.asarray(rng.integers(0, 256, (n_rows, 256)), jnp.int32)
    idx128 = jnp.asarray(rng.integers(0, 128, (n_rows, 128)), jnp.int32)

    # copy floors
    bench("copy 256", lambda i, o: o.__setitem__(..., i[...]), [x256], 256)

    # dynamic gather within 128 lanes (known good)
    def g128(i_ref, j_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(i_ref[...], j_ref[...], axis=1)
    bench("dyn gather 128", g128, [x128, idx128], 128)

    # dynamic gather across 256 lanes
    def g256(i_ref, j_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(i_ref[...], j_ref[...], axis=1)
    bench("dyn gather 256", g256, [x256, idx256], 256)

    # dynamic PAIR gather emulation: idx within 128 elements, expanded to
    # 256 interleaved lanes in-kernel (the compact4 movement pattern)
    def gpair(i_ref, j_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 256), 1)
        jj = jnp.take_along_axis(
            jnp.concatenate([j_ref[...], j_ref[...]], 1), lane >> 1, axis=1)
        o_ref[...] = jnp.take_along_axis(
            i_ref[...], jj * 2 + (lane & 1), axis=1)
    bench("pair gather 256 (expand + dyn)", gpair, [x256, idx128], 256)

    # static deinterleave + 2x 128 gather + static interleave
    def gsplit(i_ref, j_ref, o_ref):
        x = i_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        lo = jnp.take_along_axis(x, lane * 2, axis=1)[:, :128]
        hi = jnp.take_along_axis(x, lane * 2 + 1, axis=1)[:, :128]
        j = j_ref[...]
        lo = jnp.take_along_axis(lo, j, axis=1)
        hi = jnp.take_along_axis(hi, j, axis=1)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, 256), 1)
        cat = jnp.concatenate([lo, hi], axis=1)
        o_ref[...] = jnp.take_along_axis(
            cat, (lane2 >> 1) + (lane2 & 1) * 128, axis=1)
    bench("deint + 2x g128 + reint", gsplit, [x256, idx128], 256)


if __name__ == "__main__":
    main()
