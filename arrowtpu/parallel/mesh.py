"""Device mesh helpers + SPMD harness for sharded batches.

The reference's scale-out story is Arrow Flight (gRPC streaming of IPC
frames, /root/reference/arrow-flight/src/, SURVEY §5.8).  The TPU-native
equivalent is a jax.sharding Mesh with XLA collectives over ICI: each mesh
device owns one RecordBatch shard, and the exchange operator (shuffle) is
an all_to_all instead of a network of DoGet/DoPut streams.

`shard_map_batches` is the SPMD entry: per-device batches are stacked on a
leading device axis, shard_map splits them, and the body sees ordinary
local RecordBatch pytrees plus an axis_name for collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import schema as st
from ..core import batch as bt
from ..core import bitmap as bm
from ..core import column as col


def make_mesh(n_devices: int | None = None, axis_name: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise st.InvalidArgumentError(
            f"requested {n_devices} devices, have {len(devs)}"
        )
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def _force_validity(c: col.Column) -> col.Column:
    """Give every column an explicit validity bitmap so shards have
    identical pytree structure (stacking requires it)."""
    if isinstance(c, col.DictionaryColumn):
        import dataclasses

        return dataclasses.replace(c, keys=_force_validity(c.keys))
    if getattr(c, "validity", None) is None and not isinstance(c, col.NullColumn):
        return c.with_validity(
            bm.all_valid(c.capacity) & bm.row_mask_words(c.capacity, c.length)
        )
    return c


def normalize_batch(batch: bt.RecordBatch) -> bt.RecordBatch:
    return bt.RecordBatch(
        batch.schema, tuple(_force_validity(c) for c in batch.columns)
    )


def _align_strings(batches):
    """Pad string arenas / len_bounds to a common shape so shards form one
    stackable pytree (host-side prep only)."""
    import dataclasses

    import jax.numpy as jnp

    ncols = len(batches[0].columns)
    out = [list(b.columns) for b in batches]
    for j in range(ncols):
        cols = [b.columns[j] for b in batches]
        if not isinstance(cols[0], col.StringViewColumn):
            continue
        arena_cap = max(c.arena.shape[0] for c in cols)
        bound = max((c.len_bound or 0) for c in cols) or None
        for i, c in enumerate(cols):
            pad = arena_cap - c.arena.shape[0]
            arena = jnp.pad(c.arena, (0, pad)) if pad else c.arena
            out[i][j] = dataclasses.replace(c, arena=arena, len_bound=bound)
    return [
        bt.RecordBatch(b.schema, tuple(cs)) for b, cs in zip(batches, out)
    ]


def stack_batches(batches: Sequence[bt.RecordBatch]):
    """Stack per-device batches on a new leading axis (host-side prep for
    shard_map_batches).  All batches must share schema and capacity."""
    batches = _align_strings([normalize_batch(b) for b in batches])
    return jax.tree_util.tree_map(lambda *xs: jax.numpy.stack(xs), *batches)


def unstack_batches(stacked) -> list:
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)
    ]


def shard_map_batches(fn: Callable, mesh: Mesh, *stacked_inputs,
                      axis_name: str | None = None):
    """Run fn(local_batch..., axis_name=...) SPMD across the mesh.

    stacked_inputs: pytrees with a leading device axis (from stack_batches).
    fn receives local pytrees (leading axis stripped) and must return a
    pytree; outputs are re-stacked on the device axis."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]

    def body(*locals_):
        squeezed = [
            jax.tree_util.tree_map(lambda x: x[0], t) for t in locals_
        ]
        out = fn(*squeezed)
        return jax.tree_util.tree_map(lambda x: x[None], out)

    shmapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(P(axis_name) for _ in stacked_inputs),
        out_specs=P(axis_name),
        # kernels mix replicated constants (hash-table init) with varying
        # shards inside lax.while_loop carries; skip the vma type check
        check_vma=False,
    )
    return shmapped(*stacked_inputs)
