"""Union kernels: union_extract + take/filter support.

Capability mirror of /root/reference/arrow-select/src/union_extract.rs:79
(extract one child of a union as a top-level column, null where the row's
type_id differs) and the union paths of take/filter.

TPU-native design: sparse unions are a struct-of-children with a type_id
selector lane, so extraction is a validity AND with `type_id == code` —
one fused VPU pass.  Dense unions gather through offsets (one dense
gather), same machine shape as take.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col


def union_extract(u: col.UnionColumn, field: str) -> col.Column:
    """reference union_extract.rs:79: child values where type_id matches,
    null elsewhere."""
    names = [f.name for f in u.dtype.fields]
    if field not in names:
        raise st.SchemaError(f"union has no field {field!r}")
    child_i = names.index(field)
    codes = u.dtype.type_ids or tuple(range(len(u.dtype.fields)))
    code = codes[child_i]
    child = u.children[child_i]
    sel = u.type_id_arr == jnp.int32(code)

    if u.is_dense:
        # gather child rows through offsets; rows of other types -> null
        from .take import take as _take

        idx = col.PrimitiveColumn(
            jnp.where(sel, u.offsets, 0), bm.pack(sel), u.length, st.int32
        )
        return _take(child, idx)

    # sparse: child is row-parallel; mask validity where type differs
    new_validity = bm.pack(sel) & child.validity_or_full()
    return child.with_validity(new_validity).with_length(u.length)


def take_union(u: col.UnionColumn, indices: col.PrimitiveColumn) -> col.UnionColumn:
    """Gather union rows (reference take.rs union path)."""
    from .take import take as _take
    import dataclasses

    if indices.wide is not None:
        from ..core import wide as wd

        raw = wd.lo(indices.values).astype(jnp.int32)
    else:
        raw = indices.values.astype(jnp.int32)
    idx = jnp.clip(raw, 0, u.capacity - 1)
    tids = u.type_id_arr[idx]
    if u.is_dense:
        offs = u.offsets[idx]
        return dataclasses.replace(
            u, type_id_arr=tids, offsets=offs, length=indices.length
        )
    children = tuple(_take(c, indices) for c in u.children)
    return dataclasses.replace(
        u, type_id_arr=tids, children=children, length=indices.length
    )
