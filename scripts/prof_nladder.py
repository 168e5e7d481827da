"""nladder / window-slab sweep for compact3 at the config-1 shape."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from arrowtpu.pallas import compact3 as pc3
    from bench import loop_time

    n = 8_060_928
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 2**32, (2, n), dtype=np.uint32))
    tile_r = pc3.pick_tile_r(n, 2)

    for sel in (0.1, 0.45, 0.9):
      keep = jnp.asarray((rng.random(n) < sel).astype(np.uint8))
      for nl in (2, 4):
        def step(t, nl=nl):
            p, k = t
            offs = pc3.tile_offsets(k, tile_r)
            o = pc3._compact3_call(p, k, offs, tile_r=tile_r, nladder=nl)
            return (p, k.at[0].add((o[0, 0] >> 31).astype(jnp.uint8)))
        dt = loop_time(step, (planes, keep))
        print(f"sel={sel} nladder={nl}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
