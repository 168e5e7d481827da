"""Is the (n,2) result shape itself the poison?"""
import functools
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
    from arrowtpu.pallas.compact4 import _reint
    from bench import loop_time

    n = 8_060_928
    _L, _L2 = 128, 256
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 2**32, (2, n), dtype=np.uint32))
    cnt0 = jnp.asarray([3_000_000], jnp.int32)

    def kern(cnt_ref, lo_ref, hi_ref, o_ref):
        lo = lo_ref[...].astype(jnp.int32)
        hi = hi_ref[...].astype(jnp.int32)
        o_ref[...] = _reint(lo, hi).astype(jnp.uint32)

    def mkcall(shape_mode):
        @jax.jit
        def call(planes, cnt):
            if shape_mode == "cntin":
                cnt = jnp.reshape(cnt[0], (1,)).astype(jnp.int32)
            cap_rows = n // _L
            with jax.enable_x64(False):
                gs = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(cap_rows // 512,),
                    in_specs=[
                        pl.BlockSpec((512, _L), lambda t, c: (t, 0),
                                     memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec((512, _L2), lambda t, c: (t, 0),
                                           memory_space=pltpu.VMEM),
                )
                out = pl.pallas_call(
                    kern, grid_spec=gs,
                    out_shape=jax.ShapeDtypeStruct((cap_rows, _L2),
                                                   jnp.uint32),
                )(cnt, planes[0].reshape(cap_rows, _L),
                  planes[1].reshape(cap_rows, _L))
            if shape_mode == "pairs":
                return out.reshape(n, 2)
            if shape_mode == "flat":
                return out.reshape(n * 2)
            return out
        return call

    for mode in ("tiles", "cntin", "pairs"):
        call = mkcall(mode)
        def step(t, call=call):
            p, = t
            o = call(p, cnt0)
            if mode == "pairs":
                return (p.at[0, 0].add(o[0, 0] >> 31),)
            return (p.at[0, 0].add(o.reshape(-1)[0] >> 31),)
        dt = loop_time(step, (planes,))
        print(f"result={mode:6s}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
