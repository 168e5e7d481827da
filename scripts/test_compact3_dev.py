"""compact3 device correctness + perf vs compact2."""
import numpy as np


def pack_bits(bools):
    n = bools.size
    pad = (-n) % 32
    b = np.concatenate([bools, np.zeros(pad, bool)])
    return np.packbits(b.reshape(-1, 32)[:, ::-1], axis=1).view(">u4").astype(
        np.uint32).reshape(-1)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from arrowtpu.pallas import compact3 as pc3
    from arrowtpu.core import bitmap as bm
    from bench import loop_time

    rng = np.random.default_rng(42)
    fails = 0
    for n, P, dens in [(65536, 1, 0.45), (65536, 2, 0.45), (131072, 2, 0.0),
                       (131072, 2, 1.0), (131072, 3, 0.31), (262144, 2, 0.9),
                       (262144, 2, 0.02), (131072, 1, 0.5)]:
        keep = rng.random(n) < dens
        planes = rng.integers(0, 2**32, (P, n), dtype=np.uint32)
        ku8 = jnp.asarray(keep.astype(np.uint8))
        got = np.asarray(jax.device_get(
            pc3.compact_planes(jnp.asarray(planes), ku8)))
        cnt = int(keep.sum())
        want = planes[:, keep]
        ok = (np.array_equal(got[:, :cnt], want)
              and not got[:, cnt:].any())
        if not ok:
            fails += 1
            print(f"FAIL n={n} P={P} dens={dens}: "
                  f"first mismatch col {np.argmax((got[:, :cnt] != want).any(0)) if got[:,:cnt].shape==want.shape else '?'}")
            bad = np.where((got[:, :cnt] != want).any(axis=0))[0][:5]
            print("  bad cols", bad, "got", got[0, bad], "want", want[0, bad])
        else:
            print(f"ok n={n} P={P} dens={dens} tile={pc3.pick_tile_r(n, P)}")
    print(f"fails: {fails}")
    if fails:
        return

    # ---- perf on the bench shape --------------------------------------
    n = 8_060_928
    vals = rng.integers(-1000, 1000, n)
    valid = rng.random(n) > 0.10
    keep = valid & (vals > 0)
    planes = np.stack([(vals & 0xFFFFFFFF).astype(np.uint32),
                       ((vals >> 32) & 0xFFFFFFFF).astype(np.uint32)])
    keepj = jnp.asarray(keep.astype(np.uint8))
    planesj = jnp.asarray(planes)

    for nladder in (1, 4, 8):
        def step(args, nl=nladder):
            p, w = args
            offs = pc3.tile_offsets(w, 512)
            out = pc3.compact_planes(p, w, tile_r=512, offs=offs,
                                     nladder=nl)
            return (p + (out[0, :1] >> 31).astype(p.dtype), w)
        dt = loop_time(step, (planesj, keepj))
        print(f"compact3 P=2 8M nladder={nladder}: {dt*1e3:.3f} ms")

    # offsets pass alone
    def step_o(w):
        offs = pc3.tile_offsets(w, 512)
        return w + (offs[-1] >> 30).astype(jnp.uint8)
    print(f"tile_offsets alone: {loop_time(step_o, keepj)*1e3:.3f} ms")

    # correctness at bench shape
    offs = jax.jit(lambda w: pc3.tile_offsets(w, 512))(keepj)
    out = jax.jit(lambda p, w, o: pc3.compact_planes(
        p, w, tile_r=512, offs=o))(planesj, keepj, offs)
    got = np.asarray(jax.device_get(out))
    cnt = int(keep.sum())
    want = planes[:, keep]
    assert np.array_equal(got[:, :cnt], want), "8M values mismatch"
    assert not got[:, cnt:].any(), "8M padding not zero"
    print("8M correctness ok")


if __name__ == "__main__":
    main()
