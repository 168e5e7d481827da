"""Config-4 high-card breakdown at 8M rows, cardinality 1M: where do
the 104 ms go?  Times the sort-pipeline group-by with cumulative
aggregate sets, plus the raw packed sort."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench._enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import arrowtpu as at  # noqa: E402
from arrowtpu import schema as st  # noqa: E402
from arrowtpu.ops import groupby  # noqa: E402
from arrowtpu import rowformat as rfm  # noqa: E402
from arrowtpu.rowformat import pack as rp  # noqa: E402
from arrowtpu.rowformat.encode import encode_columns  # noqa: E402

n = 8_000_000
rng = np.random.default_rng(3)
keys = rng.integers(0, 1_000_000, n, dtype=np.int32)
vals = rng.integers(-1000, 1000, n)
b = at.record_batch({
    "k": at.primitive(keys, at.schema.int32, length=n),
    "v": at.primitive(vals, at.schema.int64, length=n),
})
cap = b.capacity


def t(name, step, x, **kw):
    t0 = time.time()
    dt = bench.loop_time(step, x, k_lo=1, reps=3, **kw)
    print(f"{name}: {dt*1e3:.2f} ms   (wall {time.time()-t0:.0f}s)",
          flush=True)
    return dt


def bump_batch(bb, res):
    import dataclasses as dcl
    v = bb["v"]
    first = res.columns[0]
    lead = first.values[0] if getattr(first.values, "ndim", 1) == 1 \
        else first.values[0][0]
    bump = (jnp.asarray(lead).astype(jnp.uint32) >> 31).astype(jnp.uint32)
    v2 = dcl.replace(v, values=v.values + bump)
    cols = tuple(v2 if c is v else c for c in bb.columns)
    from arrowtpu.core.batch import RecordBatch
    return RecordBatch(bb.schema, cols)


# raw packed sort with full payload (iota + key ops + agg ops = 6 ops)
def step_sort(bb):
    import dataclasses as dcl
    kc = bb["k"]
    vc = bb["v"]
    planes = encode_columns([kc])
    iota = jnp.arange(cap, dtype=jnp.int32)
    extras = [iota, kc.valid_bool(), kc.values, vc.valid_bool(),
              vc.values[:, 0], vc.values[:, 1]]
    _, out = rp.sort_by_planes(planes, cap, bb.length, extras,
                               return_planes=True)
    bump = (out[0][0] >> 31).astype(jnp.uint32)
    v2 = dcl.replace(vc, values=vc.values + bump)
    cols = tuple(v2 if c is vc else c for c in bb.columns)
    from arrowtpu.core.batch import RecordBatch
    return RecordBatch(bb.schema, cols)


t("sort+payload only", step_sort, b)

for label, aggs in [
    ("count", [("v", "count")]),
    ("sum", [("v", "sum")]),
    ("min", [("v", "min")]),
    ("sum+count", [("v", "sum"), ("v", "count")]),
    ("sum+count+min", [("v", "sum"), ("v", "count"), ("v", "min")]),
]:
    fn = jax.jit(lambda bb, a=tuple(aggs): groupby._sort_group_by(
        bb, ["k"], list(a)))

    def step(bb, fn=fn):
        return bump_batch(bb, fn(bb))

    t(f"groupby[{label}]", step, b)


# round-5 late: plan-time narrow sums (vals fit 16 bits -> biased sums)
for label, aggs in [
    ("sum (narrow plan)", [("v", "sum")]),
    ("sum+count+min (narrow plan)",
     [("v", "sum"), ("v", "count"), ("v", "min")]),
]:
    fn = groupby.plan_group_by(b, ["k"], list(aggs))

    def step(bb, fn=fn):
        return bump_batch(bb, fn(bb))

    t(f"groupby[{label}]", step, b)
