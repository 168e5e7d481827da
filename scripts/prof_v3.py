"""Round-5 config-1 breakdown: where do the 1.47 ms go?

Also calibrates pltpu.roll cost and tests whether take_along_axis /
dynamic_gather lowers inside a Pallas TPU kernel on this jax version.
"""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import dataclasses as dc
    import arrowtpu as at
    from arrowtpu import ops
    from arrowtpu.core import bitmap as bm
    from arrowtpu.ops import filter as flt
    from arrowtpu.pallas import compact2 as pc2
    from bench import loop_time

    n = 8_000_000
    rng = np.random.default_rng(0)
    vals = rng.integers(-1000, 1000, n)
    valid = rng.random(n) > 0.10
    c = at.primitive(vals, at.schema.int64,
                     validity=at.bitmap.from_numpy_bools(valid), length=n)

    # 0. whole pipeline (as bench config1)
    def step_full(col):
        out = ops.filter_(col, ops.gt(col, 0))
        return dc.replace(out, validity=col.validity, length=col.length)
    t_full = loop_time(step_full, c)
    print(f"full filter step:        {t_full*1e3:.3f} ms")

    # 1. gt only
    def step_gt(col):
        m = ops.gt(col, 0)
        bump = (m.values[0] >> 31).astype(col.values.dtype)
        return dc.replace(col, values=col.values + bump)
    t_gt = loop_time(step_gt, c)
    print(f"gt (mask build):         {t_gt*1e3:.3f} ms")

    # 2. gt + build_plan
    def step_plan(col):
        plan = flt.build_plan(ops.gt(col, 0))
        bump = (plan.count >> 30).astype(col.values.dtype)
        return dc.replace(col, values=col.values + bump)
    t_plan = loop_time(step_plan, c)
    print(f"gt+build_plan:           {t_plan*1e3:.3f} ms")

    # 3. kernel alone, P=2, precomputed keep_u8
    mask = jax.jit(lambda col: ops.gt(col, 0))(c)
    plan = jax.jit(flt.build_plan)(mask)
    keep_u8 = jnp.asarray(
        np.asarray(jax.device_get(plan.keep)).astype(np.uint8))
    planes = jax.jit(lambda c: jnp.transpose(
        jax.lax.bitcast_convert_type(c.values, jnp.uint32)))(c)
    planes = jnp.asarray(np.asarray(jax.device_get(planes)))
    print(f"planes {planes.shape} keep {keep_u8.shape} "
          f"tile_r={pc2.pick_tile_r(planes.shape[1], 2)}")

    def mk_step(stages, P):
        def step(args):
            p, k = args
            out = pc2.compact_planes(p[:P], k, stages=stages)
            return (p + (out[0, :1] >> 31).astype(p.dtype), k)
        return step

    for P in (1, 2):
        for stages, label in ((15, "full"), (14, "no-lanecompact"),
                              (13, "no-rotate"), (11, "no-scatter"),
                              (8, "scatteronly"), (0, "copyonly")):
            t = loop_time(mk_step(stages, P), (planes, keep_u8))
            print(f"kernel P={P} stages={stages:2d} ({label:14s}): "
                  f"{t*1e3:.3f} ms")

    # 4. outinit memset cost: jnp.zeros of output shape (fused alone)
    def step_zeros(x):
        z = jnp.zeros((2, n), jnp.uint32)
        return x + z[0, :1]
    t_z = loop_time(step_zeros, planes[0, :1] * 0)
    print(f"zeros (2,{n}) memset:     {t_z*1e3:.3f} ms")

    # 5. roll calibration: 14 rolls+selects on (Rt,128) u32 via pallas
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mk_roll_kernel(nrolls, nsel):
        def kern(x_ref, o_ref):
            x = x_ref[...]
            m = x > 7
            for i in range(nrolls):
                y = pltpu.roll(x, 1 + (i % 7), axis=1)
                if i < nsel:
                    x = jnp.where(m, y, x)
                else:
                    x = y
            o_ref[...] = x
        return kern

    def mk_roll_step(nrolls, nsel):
        kern = mk_roll_kernel(nrolls, nsel)

        @jax.jit
        def run(p):
            grid = p.shape[0] // (512 * 128)
            return pl.pallas_call(
                kern,
                grid=(grid,),
                in_specs=[pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((p.shape[0] // 128, 128),
                                               jnp.uint32),
            )(p.reshape(-1, 128))

        def step(p):
            o = run(p)
            return p + o.reshape(-1)[:1]
        return step

    one = planes[0]
    for nrolls, nsel in ((0, 0), (14, 0), (14, 14), (28, 28), (56, 56)):
        t = loop_time(mk_roll_step(nrolls, nsel), one)
        print(f"pallas {nrolls:2d} rolls {nsel:2d} sels 1 plane: "
              f"{t*1e3:.3f} ms")

    # 6. take_along_axis inside pallas: supported? cost?
    def gather_kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    try:
        @jax.jit
        def run_g(p, idx):
            grid = p.shape[0] // (512 * 128)
            return pl.pallas_call(
                gather_kern,
                grid=(grid,),
                in_specs=[pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((p.shape[0] // 128, 128),
                                               jnp.uint32),
            )(p.reshape(-1, 128), idx.reshape(-1, 128))

        idx = jnp.asarray(
            rng.integers(0, 128, n, dtype=np.int32).reshape(-1))

        def step_g(args):
            p, idx = args
            o = run_g(p, idx)
            return (p + o.reshape(-1)[:1], idx)
        t = loop_time(step_g, (one, idx))
        print(f"pallas take_along_axis lanes, 1 plane: {t*1e3:.3f} ms")
    except Exception as e:
        print(f"take_along_axis in pallas: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")

    # 7. sublane gather (axis=0) within (512,128) blocks
    def gather_kern0(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    try:
        @jax.jit
        def run_g0(p, idx):
            grid = p.shape[0] // (512 * 128)
            return pl.pallas_call(
                gather_kern0,
                grid=(grid,),
                in_specs=[pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((512, 128), lambda t: (t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((p.shape[0] // 128, 128),
                                               jnp.uint32),
            )(p.reshape(-1, 128), idx.reshape(-1, 128))

        idx0 = jnp.asarray(
            rng.integers(0, 512, n, dtype=np.int32).reshape(-1))

        def step_g0(args):
            p, idx = args
            o = run_g0(p, idx)
            return (p + o.reshape(-1)[:1], idx)
        t = loop_time(step_g0, (one, idx0))
        print(f"pallas take_along_axis sublanes, 1 plane: {t*1e3:.3f} ms")
    except Exception as e:
        print(f"take_along_axis axis0 in pallas: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
