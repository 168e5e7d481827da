"""Round-5 probe that settled the 64-bit filter relayout question.

Hypothesis tested: the i64 filter path pays two HBM transposes
((cap,2) <-> (2,cap)) plus a 64 MB zero-init, so a pair-native kernel
(interleaved (R,256) tiles, in-register deinterleave) should save
~0.4 ms at the 8M bench shape.

Findings (v5e, all measured here):
  1. Mosaic's dynamic lane gather is hard-limited to 128 lanes; 256-lane
     take_along_axis fails to compile.  In-register pair deinterleave /
     reinterleave via four static 128-lane gathers + selects works and
     costs ~0.03 ms per 64 MB over a copy.
  2. A full pair-in variant of compact3 plus an interleave epilogue was
     built and bit-exact at every selectivity — and SLOWER end to end.
  3. Root cause, isolated below: XLA:TPU stores (n, 2) arrays physically
     as PLANES (layout {0,1}), so the filter path's jnp.transpose calls
     were already free metadata ops, and any kernel producing
     (cap_rows, 256) interleaved tiles forces a genuine relayout when
     its result is viewed as (n, 2): consuming o[0, 0] on the reshaped
     result costs ~6.4 ms by itself vs 0.25 ms for the same kernel
     consumed flat.  The pair-native design has no layout to save; it
     was reverted.

The probe: identical pallas interleave kernel; the only variable is the
result view / consumption.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def _iota2(shape, dim):
    import jax
    import jax.numpy as jnp
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _reint(lo, hi):
    """Two (R, 128) limb planes -> (R, 256) interleaved pair tile."""
    import jax.numpy as jnp
    lane = _iota2(lo.shape[:1] + (128,), 1)
    par = (lane & 1) == 1
    i0 = lane >> 1
    h0 = jnp.where(par, jnp.take_along_axis(hi, i0, axis=1),
                   jnp.take_along_axis(lo, i0, axis=1))
    i1 = 64 + i0
    h1 = jnp.where(par, jnp.take_along_axis(hi, i1, axis=1),
                   jnp.take_along_axis(lo, i1, axis=1))
    return jnp.concatenate([h0, h1], axis=1)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import loop_time

    n = 8_060_928
    _L, _L2 = 128, 256
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 2**32, (2, n), dtype=np.uint32))

    def kern(lo_ref, hi_ref, o_ref):
        lo = lo_ref[...].astype(jnp.int32)
        hi = hi_ref[...].astype(jnp.int32)
        o_ref[...] = _reint(lo, hi).astype(jnp.uint32)

    def mkcall(shape_mode):
        @jax.jit
        def call(planes):
            cap_rows = n // _L
            with jax.enable_x64(False):
                out = pl.pallas_call(
                    kern, grid=(cap_rows // 512,),
                    in_specs=[pl.BlockSpec((512, _L), lambda t: (t, 0),
                                           memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec((512, _L2), lambda t: (t, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((cap_rows, _L2),
                                                   jnp.uint32),
                )(planes[0].reshape(cap_rows, _L),
                  planes[1].reshape(cap_rows, _L))
            return out.reshape(n, 2) if shape_mode != "tiles" else out
        return call

    for mode, bump in (("tiles, flat consume", "flat"),
                       ("(n,2), flat consume", "flat"),
                       ("(n,2), o[0,0] consume", "pair")):
        call = mkcall(mode)
        def step(t, call=call, bump=bump):
            p, = t
            o = call(p)
            if bump == "pair":
                return (p.at[0, 0].add(o[0, 0] >> 31),)
            return (p.at[0, 0].add(o.reshape(-1)[0] >> 31),)
        dt = loop_time(step, (planes,))
        print(f"{mode:26s}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
