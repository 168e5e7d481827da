"""Trace-based stage ablation for compact2 (run on the real TPU)."""
import glob
import gzip
import json
import collections
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def trace_time(fn, args, tag, iters=30):
    import jax
    import jax.profiler
    out = fn(*args)
    jax.block_until_ready(out)
    d = f"/tmp/jtv2_{tag}"
    jax.profiler.start_trace(d)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    f = sorted(glob.glob(f"{d}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    names = {e["pid"]: e["args"]["name"] for e in tr["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and names.get(e["pid"], "").startswith("/device"):
            dur[e["name"]] += e.get("dur", 0)
    # the top-level jit event covers the whole dispatch
    top = [v for k, v in dur.items() if k.startswith("jit_")]
    return max(top) / iters / 1e3 if top else None, dur, iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from arrowtpu.pallas import compact2 as pc2

    n = 8060928
    rng = np.random.default_rng(0)
    keep = jnp.asarray((rng.random(n) < 0.45).astype(np.uint8))
    for P in (2,):
        planes = jnp.asarray(rng.integers(0, 2**32, (P, n), dtype=np.uint32))
        for tile_r in (512,):
            for stages, name in [(0, "copy"), (1, "lane"), (3, "lane+rot"),
                                 (7, "full"), (6, "rot+scat"), (5, "lane+scat")]:
                @jax.jit
                def fn(p, k):
                    return pc2.compact_planes(p, k, tile_r=tile_r,
                                              stages=stages)
                ms, dur, iters = trace_time(fn, (planes, keep),
                                            f"{P}_{tile_r}_{stages}")
                kern = max((v for k_, v in dur.items()
                            if "_compact2_call" in k_), default=0) / iters / 1e3
                print(f"P={P} tile={tile_r} stages={name:10s}: total "
                      f"{ms:7.3f} ms  kernel {kern:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
