"""Which masked-reduction structure fuses: where-sum vs multiply-sum vs
dot, and how cost scales with live quantity count (the first probe was
partially DCE'd)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import loop_time, _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NB = 256
U32 = jnp.uint32


def main():
    n = 8_000_000
    rng = np.random.default_rng(3)
    bucket = jnp.asarray(rng.integers(0, 200, n, dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                     .astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                     .astype(np.uint32))

    def consume(arrs):
        tot = jnp.uint32(0)
        for a in arrs:
            tot = tot + jnp.sum(a)
        return tot

    def make_step(nq, structure):
        chunks = [(lo >> U32(8 * k)) & U32(0xFF) for k in range(4)] + \
                 [(hi >> U32(8 * k)) & U32(0xFF) for k in range(4)]

        def step(b):
            outs = []
            per_bucket = {q: [] for q in range(nq)}
            cnts = []
            for c in range(NB):
                m = b == c
                cnts.append(jnp.sum(m, dtype=jnp.int32))
                for q in range(nq):
                    ch = chunks[q]
                    if structure == "where":
                        per_bucket[q].append(
                            jnp.sum(jnp.where(m, ch, U32(0)), dtype=U32))
                    else:
                        per_bucket[q].append(
                            jnp.sum(ch * m.astype(U32), dtype=U32))
            outs.append(jnp.stack(cnts))
            for q in range(nq):
                outs.append(jnp.stack(per_bucket[q]))
            tot = consume(outs)
            return b + (tot >> 31).astype(jnp.int32)

        return step

    for nq in (0, 1, 4, 8):
        for structure in (("where", "mul") if nq else ("where",)):
            dt = loop_time(make_step(nq, structure), bucket, k_lo=1,
                           reps=3)
            print(f"nq={nq} {structure}: {dt*1e3:.2f} ms", flush=True)

    # dot formulation: one-hot bf16 matmul for counts+sums
    def step_dot(b):
        oh = jax.nn.one_hot(b, NB, dtype=jnp.bfloat16)      # (n, NB)
        chunks = [(lo >> U32(8 * k)) & U32(0xFF) for k in range(4)]
        outs = [jnp.sum(oh, axis=0)]
        for ch in chunks:
            outs.append(ch.astype(jnp.bfloat16) @ oh)
        tot = jnp.uint32(0)
        for a in outs:
            tot = tot + jnp.sum(a).astype(U32)
        return b + (tot >> 31).astype(jnp.int32)

    dt = loop_time(step_dot, bucket, k_lo=1, reps=3)
    print(f"dot(bf16, 4 chunks+count): {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
