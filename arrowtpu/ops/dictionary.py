"""Dictionary maintenance kernels.

Capability mirror of /root/reference/arrow-select/src/dictionary.rs:
`garbage_collect_dictionary` (:45 drop values no key references),
`should_merge_dictionary_values` (:152 ptr_eq interning heuristic) and
value merging (:179) used by concat/interleave.

TPU-native design: GC is a scatter-max "referenced" mask + prefix-sum
renumbering — the same mask->scan->compact machine shape as filter; merge
builds a combined value set host-side at build time (dictionaries are
built host-side here) or via rank-join on device.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col


def garbage_collect_dictionary(d: col.DictionaryColumn) -> col.DictionaryColumn:
    """Drop dictionary values not referenced by any live key and renumber
    keys (reference dictionary.rs:45).  Value capacity is static, so the
    compacted values keep the same physical capacity with a shrunken
    length — HBM is not reclaimed until the host rebuilds, matching the
    'logical GC' the reference performs before serialization."""
    from .filter import filter_ as _filter

    vcap = d.values.capacity
    keys_ok = d.keys.valid_bool()
    keys = jnp.clip(d.keys.values.astype(jnp.int32), 0, vcap - 1)
    # referenced[v] = any live key == v
    referenced = (
        jnp.zeros(vcap, jnp.int32).at[keys].max(keys_ok.astype(jnp.int32)).astype(bool)
    )
    # new index of value v = exclusive prefix count of referenced
    new_index = jnp.cumsum(referenced.astype(jnp.int32)) - referenced.astype(jnp.int32)
    mask = col.BooleanColumn(bm.pack(referenced), None, d.values.length)
    new_values = _filter(d.values, mask)
    new_keys = dataclasses.replace(
        d.keys, values=new_index[keys].astype(d.keys.values.dtype)
    )
    return col.DictionaryColumn(new_keys, new_values, None, d.dtype)


def should_merge_dictionary_values(dicts) -> bool:
    """reference dictionary.rs:152: merge unless all inputs share one
    interned value column.  Here interning = identical device buffer."""
    first = dicts[0].values
    return not all(d.values is first for d in dicts[1:])


def merge_dictionary_values(dicts):
    """Host-side value-set union + key remap (reference dictionary.rs:179
    merges via bytes interner).  Returns (merged_values, [remapped key
    columns]).  Host-side because dictionary *construction* is host-side
    in this framework (strings enter via builders); remapping itself is a
    device gather."""
    sets = [d.values.to_pylist() for d in dicts]
    merged, where = [], {}
    maps = []
    for vals in sets:
        m = []
        for v in vals:
            k = ("\0n",) if v is None else v
            if k not in where:
                where[k] = len(merged)
                merged.append(v)
            m.append(where[k])
        maps.append(jnp.asarray(m, jnp.int32))
    merged_col = col.from_pylist(merged, dicts[0].dtype.value)
    remapped = []
    for d, m in zip(dicts, maps):
        keys = jnp.clip(d.keys.values.astype(jnp.int32), 0, m.shape[0] - 1)
        remapped.append(
            dataclasses.replace(d.keys, values=m[keys].astype(d.keys.values.dtype))
        )
    return merged_col, remapped
