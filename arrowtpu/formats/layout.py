"""Arrow physical layout <-> device columns, numpy-only (no pyarrow).

The IPC and Parquet writers/readers speak the Arrow columnar *physical*
layout (validity bitmap / offsets / values buffers per type — reference
arrow-data/src/data.rs:1796 `layout()` registry).  This module converts
between that layout and arrowtpu's device-resident representation
(views/arenas/limb pairs) entirely with vectorized numpy at the host
boundary.

ArrowField nodes mirror the reference's FieldNode + Buffer flattening
(arrow-ipc/src/writer.rs:571 IpcDataGenerator::encoded_batch walks ArrayData
depth-first emitting (length, null_count) nodes and raw buffers)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..config import round_up
from ..core import bitmap as bm
from ..core import column as col
from ..core import wide as wd


@dataclasses.dataclass
class Node:
    """(length, null_count) + this column's own buffers, preorder children."""

    length: int
    null_count: int
    buffers: List[np.ndarray]  # uint8 arrays
    children: List["Node"]
    dictionary: Optional[col.Column] = None  # set on dictionary columns


# ---------------------------------------------------------------------------
# column -> layout
# ---------------------------------------------------------------------------


def _validity_buf(c: col.Column, n: int):
    if c.validity is None:
        return np.zeros(0, np.uint8), 0
    bits = bm.to_numpy_bools(c.validity, n)
    nulls = int(n - bits.sum())
    if nulls == 0:
        return np.zeros(0, np.uint8), 0
    return np.packbits(bits, bitorder="little"), nulls


def string_offsets_data(c: col.StringViewColumn):
    """views+arena -> (int32 offsets, uint8 data): the same two-pool
    repeat-gather as the pyarrow bridge, kept numpy-only here."""
    n = c.concrete_length()
    views = np.asarray(c.views)[:n]
    arena = np.asarray(c.arena)
    valid = (
        bm.to_numpy_bools(c.validity, n) if c.validity is not None else np.ones(n, bool)
    )
    lens = views[:, 0].astype(np.int64)
    lens_eff = np.where(valid, lens, 0)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_eff, out=offsets[1:])
    total = int(offsets[-1])
    view_bytes = (
        np.ascontiguousarray(views).view(np.uint8).reshape(n, 16)
        if n
        else np.zeros((0, 16), np.uint8)
    )
    pool = np.concatenate([arena, view_bytes.reshape(-1)])
    inline = lens <= 12
    src = np.where(inline, arena.shape[0] + np.arange(n) * 16 + 4, views[:, 3].astype(np.int64))
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets[:-1], lens_eff)
        + np.repeat(src, lens_eff)
    )
    data = pool[idx] if total else np.zeros(0, np.uint8)
    return offsets.astype(np.int32), data


def list_flat_indices(c: col.ListViewColumn):
    """(start,size) views -> (int32 offsets, child gather indices)."""
    n = c.concrete_length()
    starts = np.asarray(c.starts)[:n].astype(np.int64)
    sizes = np.asarray(c.sizes)[:n].astype(np.int64)
    valid = (
        bm.to_numpy_bools(c.validity, n) if c.validity is not None else np.ones(n, bool)
    )
    sizes_eff = np.where(valid, sizes, 0)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes_eff, out=offsets[1:])
    total = int(offsets[-1])
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets[:-1], sizes_eff)
        + np.repeat(starts, sizes_eff)
    )
    return offsets.astype(np.int32), idx


def column_to_layout(c: col.Column) -> Node:
    n = c.concrete_length()
    if isinstance(c, col.NullColumn):
        return Node(n, n, [], [])
    vbuf, nulls = _validity_buf(c, n)
    if isinstance(c, col.BooleanColumn):
        bits = bm.to_numpy_bools(c.values, n)
        return Node(n, nulls, [vbuf, np.packbits(bits, bitorder="little")], [])
    if isinstance(c, col.PrimitiveColumn):
        kind = c.wide
        if kind is not None:
            npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
            vals = wd.join_numpy(np.asarray(c.values)[:n], npdt)
        else:
            vals = np.asarray(c.values)[:n]
        return Node(n, nulls, [vbuf, np.ascontiguousarray(vals).view(np.uint8)], [])
    if isinstance(c, col.StringViewColumn):
        offsets, data = string_offsets_data(c)
        return Node(n, nulls, [vbuf, offsets.view(np.uint8), data], [])
    if isinstance(c, col.DictionaryColumn):
        keys = column_to_layout(c.keys)
        return Node(n, keys.null_count, keys.buffers, [], dictionary=c.values)
    if isinstance(c, col.ListViewColumn):
        offsets, idx = list_flat_indices(c)
        from ..ops.take import take

        flat_child = take(
            c.child,
            col.primitive(idx.astype(np.int32), st.int32),
        ).with_length(len(idx))
        return Node(
            n, nulls, [vbuf, offsets.view(np.uint8)], [column_to_layout(flat_child)]
        )
    if isinstance(c, col.StructColumn):
        return Node(
            n,
            nulls,
            [vbuf],
            [column_to_layout(ch.with_length(n)) for ch in c.children],
        )
    if isinstance(c, col.FixedSizeListColumn):
        child = c.child.with_length(n * c.dtype.size)
        return Node(n, nulls, [vbuf], [column_to_layout(child)])
    if isinstance(c, col.UnionColumn):
        # no validity buffer (union_array.rs layout): [int8 type_ids]
        # (+ [int32 offsets] iff dense) then children at their own length
        tids = np.asarray(c.type_id_arr)[:n].astype(np.int8)
        bufs = [np.ascontiguousarray(tids).view(np.uint8)]
        if c.offsets is not None:
            offs = np.asarray(c.offsets)[:n].astype(np.int32)
            bufs.append(np.ascontiguousarray(offs).view(np.uint8))
        return Node(n, 0, bufs, [column_to_layout(ch) for ch in c.children])
    raise st.SchemaError(f"no arrow layout for {type(c).__name__}")


# ---------------------------------------------------------------------------
# layout -> column
# ---------------------------------------------------------------------------


def _validity_words(vbuf: np.ndarray, n: int, cap: int, null_count: int):
    if null_count == 0 or len(vbuf) == 0:
        return None
    bits = np.unpackbits(vbuf[: (n + 7) // 8], bitorder="little")[:n].astype(bool)
    padded = np.zeros(cap, bool)
    padded[:n] = bits
    return bm.from_numpy_bools(padded)


def layout_to_column(node: Node, dt: st.DataType) -> col.Column:
    n = node.length
    cap = round_up(max(n, 1))
    if isinstance(dt, st.Null):
        return col.null_column(n)
    bufs = node.buffers
    validity = _validity_words(bufs[0] if bufs else np.zeros(0, np.uint8), n, cap, node.null_count)
    if isinstance(dt, st.Boolean):
        raw = bufs[1]
        bits = np.unpackbits(raw[: (n + 7) // 8], bitorder="little")[:n].astype(bool)
        padded = np.zeros(cap, bool)
        padded[:n] = bits
        if validity is not None:
            padded[:n] &= bm.to_numpy_bools(validity, n)
        words = bm.from_numpy_bools(padded)
        return col.BooleanColumn(words, validity, jnp.int32(n))
    if isinstance(dt, st.Dictionary):
        keys = layout_to_column(
            dataclasses.replace(node, dictionary=None), dt.key
        )
        values = node.dictionary
        return col.DictionaryColumn(keys, values, None, dt)
    nl_dec = st.decimal_limbs(dt)
    if nl_dec is not None:
        limbs_np = np.frombuffer(
            bufs[1].tobytes(), np.uint32, count=n * nl_dec
        ).reshape(n, nl_dec).copy()
        if validity is not None:
            ok = bm.to_numpy_bools(validity, n)
            limbs_np[~ok] = 0
        return col.primitive(limbs_np, dt, validity=validity, capacity=cap)
    if dt.is_primitive or isinstance(dt, st.Int) or isinstance(dt, st.Float):
        kind = st.wide_kind(dt)
        if kind is not None:
            npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
            vals = np.frombuffer(bufs[1].tobytes(), dtype=npdt, count=n)
            if validity is not None:
                ok = bm.to_numpy_bools(validity, n)
                vals = np.where(ok, vals, np.zeros(1, npdt))
            return col.primitive(vals, dt, validity=validity, capacity=cap)
        npdt = np.dtype(dt.to_jnp().name)
        vals = np.frombuffer(bufs[1].tobytes(), dtype=npdt, count=n)
        if validity is not None:
            ok = bm.to_numpy_bools(validity, n)
            vals = np.where(ok, vals, np.zeros(1, npdt))
        return col.primitive(vals, dt, validity=validity, capacity=cap)
    if isinstance(dt, (st.Utf8, st.Binary)):
        offsets = np.frombuffer(bufs[1].tobytes(), dtype=np.int32, count=n + 1)
        data = bufs[2]
        return _strings_from_offsets(offsets.astype(np.int64), data, validity, n, cap, dt)
    if isinstance(dt, (st.List, st.Map)):
        offsets = np.frombuffer(bufs[1].tobytes(), dtype=np.int32, count=n + 1).astype(np.int64)
        child_dt = dt.entry_struct if isinstance(dt, st.Map) else dt.value
        child = layout_to_column(node.children[0], child_dt)
        starts = np.zeros(cap, np.int32)
        sizes = np.zeros(cap, np.int32)
        starts[:n] = offsets[:-1]
        sizes[:n] = np.diff(offsets)
        if validity is not None:
            ok = bm.to_numpy_bools(validity, n)
            starts[:n] = np.where(ok, starts[:n], 0)
            sizes[:n] = np.where(ok, sizes[:n], 0)
        return col.ListViewColumn(
            jnp.asarray(starts), jnp.asarray(sizes), child, validity, jnp.int32(n), dt
        )
    if isinstance(dt, st.Struct):
        children = tuple(
            _grow_to(layout_to_column(ch, f.dtype), cap)
            for ch, f in zip(node.children, dt.fields)
        )
        return col.StructColumn(children, validity, jnp.int32(n), dt)
    if isinstance(dt, st.FixedSizeList):
        child = layout_to_column(node.children[0], dt.value)
        target = cap * dt.size
        if child.capacity < target:
            child = _grow_to(child, target)
        return col.FixedSizeListColumn(child, validity, jnp.int32(n), dt)
    if isinstance(dt, st.Union):
        tids = np.frombuffer(node.buffers[0].tobytes(), np.int8,
                             count=n).astype(np.int32)
        offs = None
        if dt.mode == "dense":
            offs = np.frombuffer(node.buffers[1].tobytes(), np.int32,
                                 count=n)
        children = [layout_to_column(ch, f.dtype)
                    for ch, f in zip(node.children, dt.fields)]
        return col.union_column(tids, children, dt, offsets=offs, length=n)
    raise st.SchemaError(f"cannot rebuild column of type {dt}")


def _strings_from_offsets(offsets, data, validity, n, cap, dt):
    lens = np.diff(offsets)
    if validity is not None:
        ok = bm.to_numpy_bools(validity, n)
        lens = np.where(ok, lens, 0)
    view_bytes = np.zeros((cap, 16), dtype=np.uint8)
    if n:
        view_bytes[:n, 0:4] = lens.astype(np.uint32)[:, None].view(np.uint8).reshape(n, 4)
        padded = np.concatenate([data, np.zeros(12, np.uint8)])
        grab_idx = np.minimum(offsets[:n, None] + np.arange(12)[None, :], len(data))
        grab = padded[grab_idx] * (np.arange(12)[None, :] < lens[:, None])
        inline = lens <= 12
        view_bytes[:n, 4:8] = grab[:, :4]
        view_bytes[:n, 8:16] = np.where(inline[:, None], grab[:, 4:12], 0)
        views_u32 = view_bytes.view(np.uint32).reshape(cap, 4)
        views_u32[:n, 3] = np.where(inline, views_u32[:n, 3], offsets[:n].astype(np.uint32))
    views = view_bytes.view(np.uint32).reshape(cap, 4)
    arena_cap = round_up(max(len(data), 1))
    arena = np.zeros(arena_cap, np.uint8)
    arena[: len(data)] = data
    return col.StringViewColumn(
        jnp.asarray(views), jnp.asarray(arena), validity, jnp.int32(n), dt,
        len_bound=int(lens.max()) if n else 0,
    )


def _grow_to(c: col.Column, cap: int) -> col.Column:
    from ..interop.pyarrow_bridge import _grow

    return _grow(c, cap) if c.capacity < cap else c
