"""Probe: in-register pair deinterleave/reinterleave on (R,256) tiles via
static 128-lane gathers + selects, plus the dynamic movement gather.
Decides compact4 viability and cost vs a plain copy."""
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
    T = 123
    n_rows = T * R
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**31, (n_rows, 256), np.int64), jnp.int32)
    sm = jnp.asarray(rng.integers(0, 128, (n_rows, 128)), jnp.int32)

    def deint(xt):
        lane = jax.lax.broadcasted_iota(jnp.int32, xt.shape[:1] + (128,), 1)
        e2 = (lane & 63) * 2
        h0 = xt[:, :128]
        h1 = xt[:, 128:]
        half = lane < 64
        lo = jnp.where(half, jnp.take_along_axis(h0, e2, axis=1),
                       jnp.take_along_axis(h1, e2, axis=1))
        hi = jnp.where(half, jnp.take_along_axis(h0, e2 + 1, axis=1),
                       jnp.take_along_axis(h1, e2 + 1, axis=1))
        return lo, hi

    def reint(lo, hi):
        lane = jax.lax.broadcasted_iota(jnp.int32, lo.shape[:1] + (128,), 1)
        par = (lane & 1) == 1
        i0 = lane >> 1
        h0 = jnp.where(par, jnp.take_along_axis(hi, i0, axis=1),
                       jnp.take_along_axis(lo, i0, axis=1))
        i1 = 64 + i0
        h1 = jnp.where(par, jnp.take_along_axis(hi, i1, axis=1),
                       jnp.take_along_axis(lo, i1, axis=1))
        return jnp.concatenate([h0, h1], axis=1)

    def bench(name, kern, arrs):
        try:
            @jax.jit
            def run(*xs):
                grid = xs[0].shape[0] // R
                return pl.pallas_call(
                    kern,
                    grid=(grid,),
                    in_specs=[pl.BlockSpec((R, a.shape[1]), lambda t: (t, 0),
                                           memory_space=pltpu.VMEM)
                              for a in xs],
                    out_specs=pl.BlockSpec((R, 256), lambda t: (t, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((xs[0].shape[0], 256),
                                                   jnp.int32),
                )(*xs)
            # correctness first
            o = np.asarray(jax.device_get(run(*arrs)))
            def step(t):
                o = run(*t)
                bump = (o[:1, :1] >> 31).astype(jnp.int32)
                return (t[0].at[0, 0].add(bump[0, 0]),) + tuple(t[1:])
            dt = loop_time(step, tuple(arrs))
            print(f"{name:40s}: {dt*1e3:.3f} ms")
            return o
        except Exception as e:
            print(f"{name:40s}: FAIL {type(e).__name__} {str(e)[:140]}")
            return None

    bench("copy 256", lambda i, o: o.__setitem__(..., i[...]), [x])

    def k_roundtrip(i_ref, o_ref):
        lo, hi = deint(i_ref[...])
        o_ref[...] = reint(lo, hi)
    o = bench("deint + reint", k_roundtrip, [x])
    if o is not None:
        ok = np.array_equal(o, np.asarray(x))
        print("  roundtrip exact:", ok)

    def k_move(i_ref, s_ref, o_ref):
        lo, hi = deint(i_ref[...])
        s = s_ref[...]
        lo = jnp.take_along_axis(lo, s, axis=1)
        hi = jnp.take_along_axis(hi, s, axis=1)
        o_ref[...] = reint(lo, hi)
    o = bench("deint + dyn move + reint", k_move, [x, sm])
    if o is not None:
        xn = np.asarray(x).reshape(n_rows, 128, 2)
        smn = np.asarray(sm)
        want = np.take_along_axis(xn, smn[:, :, None], axis=1).reshape(
            n_rows, 256)
        print("  move exact:", np.array_equal(o, want))


if __name__ == "__main__":
    main()
