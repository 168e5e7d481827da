"""Probe: Mosaic lane/sublane gather support + cost; copy floor; roll cost."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import loop_time

    n = 8_060_928  # 123 * 512 * 128
    R = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int64).astype(np.uint32))

    def call(kern, ninputs, extra=(), R_=R):
        @jax.jit
        def run(*arrs):
            grid = arrs[0].shape[0] // (R_ * 128)
            return pl.pallas_call(
                kern,
                grid=(grid,),
                in_specs=[pl.BlockSpec((R_, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM)] * ninputs,
                out_specs=pl.BlockSpec((R_, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((arrs[0].shape[0] // 128, 128),
                                               arrs[0].dtype),
            )(*[a.reshape(-1, 128) for a in arrs])
        return run

    def bench(name, kern, arrs, R_=R):
        try:
            run = call(kern, len(arrs), R_=R_)

            def step(t):
                o = run(*t)
                bump = o.reshape(-1)[:1] >> 31
                return (t[0] + bump,) + tuple(t[1:])
            dt = loop_time(step, tuple(arrs))
            print(f"{name:40s}: {dt*1e3:.3f} ms")
            return dt
        except Exception as e:
            print(f"{name:40s}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return None

    # 1. pure copy floor
    bench("copy (BlockSpec in/out)", lambda i, o: o.__setitem__(..., i[...]),
          [x])

    # 2. roll chains
    def mk_rolls(k):
        def kern(i_ref, o_ref):
            v = i_ref[...]
            for j in range(k):
                v = pltpu.roll(v, 1 + (j % 7), axis=1)
            o_ref[...] = v
        return kern
    bench("7 lane rolls", mk_rolls(7), [x])
    bench("14 lane rolls", mk_rolls(14), [x])
    bench("28 lane rolls", mk_rolls(28), [x])

    # 3. roll + select chains (the compaction inner op pair)
    def mk_rollsel(k):
        def kern(i_ref, m_ref, o_ref):
            v = i_ref[...]
            m = m_ref[...] > (1 << 30)
            for j in range(k):
                v = jnp.where(m, pltpu.roll(v, 1 + (j % 7), axis=1), v)
            o_ref[...] = v
        return kern
    m = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int64).astype(np.uint32))
    bench("14 roll+where", mk_rollsel(14), [x, m])

    # 4. lane gather: take_along_axis axis=1
    idxl = jnp.asarray(rng.integers(0, 128, n, dtype=np.int32))

    def g1(i_ref, ix_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(
            i_ref[...], ix_ref[...], axis=1).astype(i_ref.dtype)
    bench("take_along_axis lanes (u32 data)", g1, [x, idxl])

    # 4b. gather of int32 data
    xi = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int64).astype(np.int32))
    bench("take_along_axis lanes (i32 data)", g1, [xi, idxl])

    # 5. sublane gather axis=0
    idxs = jnp.asarray(rng.integers(0, R, n, dtype=np.int32))

    def g0(i_ref, ix_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(
            i_ref[...], ix_ref[...], axis=0).astype(i_ref.dtype)
    bench("take_along_axis sublanes", g0, [xi, idxs])

    # 6. small-table lane gather: broadcast a (1,128) table, gather per row
    def gt_(i_ref, ix_ref, o_ref):
        tbl = i_ref[0:1, :]  # (1,128)
        tblb = jnp.broadcast_to(tbl, ix_ref.shape)
        o_ref[...] = jnp.take_along_axis(
            tblb, ix_ref[...], axis=1).astype(i_ref.dtype)
    bench("row-bcast table gather", gt_, [xi, idxl])

    # 7. two chained gathers (φ then apply)
    def g2(i_ref, ix_ref, o_ref):
        a = jnp.take_along_axis(i_ref[...], ix_ref[...], axis=1)
        o_ref[...] = jnp.take_along_axis(
            a, (ix_ref[...] ^ 63), axis=1).astype(i_ref.dtype)
    bench("2 chained lane gathers", g2, [xi, idxl])

    # 8. int8 512-lane bitcast matmul scatter probe:
    #    u32 (R,128) -> (R,512) i8 one-hot rowmove matmul -> back
    def sc(i_ref, o_ref):
        xv = i_ref[...]
        x8 = jax.lax.bitcast_convert_type(xv, jnp.int8)  # (R,128,4)
        x8 = x8.reshape(R, 512)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) - 1
                  ).astype(jnp.int8)
        y = jax.lax.dot_general(onehot, x8, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y8 = y.astype(jnp.int8).reshape(R, 128, 4)
        o_ref[...] = jax.lax.bitcast_convert_type(y8, jnp.uint32)
    bench("bitcast int8 512-lane matmul rowmove", sc, [x])

    # 9. current-style per-byte matmul scatter for comparison
    def sc4(i_ref, o_ref):
        xv = i_ref[...]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) - 1
                  ).astype(jnp.int8)
        out = jnp.zeros((R, 128), jnp.uint32)
        for k in range(4):
            plane = ((xv >> (8 * k)) & 0xFF).astype(jnp.int8)
            y = jax.lax.dot_general(onehot, plane, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            out = out | ((y.astype(jnp.uint32) & 0xFF) << (8 * k))
        o_ref[...] = out
    bench("per-byte 4-matmul rowmove (current)", sc4, [x])


if __name__ == "__main__":
    main()
