"""Breakdown of config1 (filter 8M int64) time on the real device."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import arrowtpu as at
    from arrowtpu import ops
    from arrowtpu.core import bitmap as bm
    from arrowtpu.pallas import compact as pc
    import dataclasses as dc

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
    print(f"full filter step: {t_full*1e3:.3f} ms")

    # 1. mask build only (gt + plan build)
    def step_mask(col):
        mask = ops.gt(col, 0)
        from arrowtpu.ops import filter as _f
        plan = _f.build_plan(mask)
        bump = (plan.count >> 30).astype(col.values.dtype)
        return dc.replace(col, values=col.values + bump)
    from arrowtpu.ops import filter as flt
    t_mask = loop_time(step_mask, c)
    print(f"mask+plan build: {t_mask*1e3:.3f} ms")

    # 2. tile_info only (given precomputed keep)
    mask = jax.jit(lambda col: ops.gt(col, 0))(c)
    plan = jax.jit(flt.build_plan)(mask)
    keep_u8 = np.asarray(jax.device_get(plan.keep)).astype(np.uint8)
    keep_u8 = jnp.asarray(keep_u8)
    cap = c.capacity
    tile_r = pc.pick_tile_r(cap)
    print(f"capacity={cap} tile_r={tile_r}")

    def step_info(k):
        info = pc.tile_info(k, tile_r)
        return k + (info[-1] >> 30).astype(jnp.uint8)
    t_info = loop_time(step_info, keep_u8)
    print(f"tile_info: {t_info*1e3:.3f} ms")

    # 3. kernel only (2 planes u32, precomputed info)
    vals2 = jax.jit(lambda c: jax.lax.bitcast_convert_type(c.values, jnp.uint32))(c)
    planes = jnp.transpose(vals2)  # (2, n)
    info = jax.jit(lambda k: pc.tile_info(k, tile_r))(keep_u8)

    def step_kern(args):
        p, k, inf = args
        out, cnt = pc.compact_planes_info(p, k, inf, tile_r, is_u32=True)
        return (p + (cnt >> 30).astype(p.dtype), k, inf)
    t_kern = loop_time(step_kern, (planes, keep_u8, info))
    print(f"kernel (2xu32 planes): {t_kern*1e3:.3f} ms")

    # 3b. kernel 1 plane
    def step_kern1(args):
        p, k, inf = args
        out, cnt = pc.compact_planes_info(p[:1], k, inf, tile_r, is_u32=True)
        return (p + (cnt >> 30).astype(p.dtype), k, inf)
    t_k1 = loop_time(step_kern1, (planes, keep_u8, info))
    print(f"kernel (1xu32 plane): {t_k1*1e3:.3f} ms")

    # 4. pure HBM copy of same planes for reference
    def step_copy(p):
        return p + jnp.uint32(1)
    t_copy = loop_time(step_copy, planes)
    print(f"elementwise 2-plane copy: {t_copy*1e3:.3f} ms")

    print(f"sum(mask+info+kernel) = {(t_mask+t_info+t_kern)*1e3:.3f} ms vs full {t_full*1e3:.3f}")


if __name__ == "__main__":
    main()
