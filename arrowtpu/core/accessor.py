"""Streaming accessors and iterators over columns.

Capability mirror of the reference's iterator layer
(/root/reference/arrow-array/src/iterator.rs `ArrayIter` over the
`ArrayAccessor` trait, arrow-array/src/array/mod.rs:44): typed
element access and lazy iteration without materializing the whole
column on the host.

TPU-first shape: device columns live in HBM; random scalar reads would
cost a device round-trip each.  Accessors therefore fetch fixed-size
row WINDOWS (one `device_get` per window, amortized across its rows)
and serve Python values out of the cached window — `iter_column` over a
100M-row column holds one window of host memory at a time, unlike
`to_pylist`, which materializes everything.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import numpy as np

from .. import schema as st
from . import bitmap as bm
from . import column as col

DEFAULT_WINDOW = 8192


class ArrayAccessor:
    """Windowed element access over any column (reference ArrayAccessor:
    `value(i)` + `len`; here value() is null-aware and returns None)."""

    def __init__(self, c: col.Column, window: int = DEFAULT_WINDOW):
        self._c = c
        self._n = c.concrete_length()
        self._window = max(int(window), 1)
        self._lo = 0
        self._cache: Optional[list] = None

    def __len__(self) -> int:
        return self._n

    def value(self, i: int) -> Any:
        if not 0 <= i < self._n:
            raise IndexError(f"accessor index {i} out of range {self._n}")
        if self._cache is None or not (
                self._lo <= i < self._lo + len(self._cache)):
            self._lo = (i // self._window) * self._window
            hi = min(self._lo + self._window, self._n)
            self._cache = self._fetch(self._lo, hi)
        return self._cache[i - self._lo]

    def _fetch(self, lo: int, hi: int) -> list:
        return _window_values(self._c, lo, hi)

    def __iter__(self) -> Iterator[Any]:
        for lo in range(0, self._n, self._window):
            hi = min(lo + self._window, self._n)
            yield from self._fetch(lo, hi)


def _slice_validity(c: col.Column, lo: int, hi: int) -> np.ndarray:
    if getattr(c, "validity", None) is None:
        return np.ones(hi - lo, bool)
    return bm.to_numpy_bools(c.validity, c.concrete_length())[lo:hi]


def _window_values(c: col.Column, lo: int, hi: int) -> list:
    """Host values for rows [lo, hi) — ONE device fetch per buffer,
    sliced before transfer."""
    n = hi - lo
    ok = _slice_validity(c, lo, hi)
    if isinstance(c, col.NullColumn):
        return [None] * n
    if isinstance(c, col.BooleanColumn):
        vals = bm.to_numpy_bools(c.values, c.concrete_length())[lo:hi]
        return [bool(v) if k else None for v, k in zip(vals, ok)]
    if isinstance(c, col.PrimitiveColumn):
        import dataclasses

        sub = dataclasses.replace(
            c, values=c.values[lo:hi],
            validity=None, length=np.int32(n))
        vals = sub.to_pylist()
        return [v if k else None for v, k in zip(vals, ok)]
    if isinstance(c, col.StringViewColumn):
        views = np.asarray(c.views[lo:hi])
        is_utf8 = isinstance(c.dtype, st.Utf8)
        arena: Optional[np.ndarray] = None
        out = []
        for i in range(n):
            if not ok[i]:
                out.append(None)
                continue
            ln = int(views[i, 0])
            if ln <= 12:
                raw = views[i, 1:].astype("<u4").tobytes()[:ln]
            else:
                if arena is None:  # fetched once per window, only if needed
                    arena = np.asarray(c.arena)
                off = int(views[i, 3])
                raw = arena[off:off + ln].tobytes()
            out.append(raw.decode("utf-8") if is_utf8 else raw)
        return out
    if isinstance(c, col.DictionaryColumn):
        keys = np.asarray(c.keys.values[lo:hi])
        kok = _slice_validity(c.keys, lo, hi)
        values = c.values.to_pylist()
        return [values[int(k)] if o else None for k, o in zip(keys, kok)]
    if isinstance(c, col.StructColumn):
        names = [f.name for f in c.dtype.fields]
        kids = [_window_values(ch, lo, hi) for ch in c.children]
        return [dict(zip(names, vals)) if k else None
                for k, vals in zip(ok, zip(*kids) if kids else [()] * n)]
    if isinstance(c, col.ListViewColumn):
        starts = np.asarray(c.starts[lo:hi])
        sizes = np.asarray(c.sizes[lo:hi])
        out = []
        acc = ArrayAccessor(c.child)
        for i in range(n):
            if not ok[i]:
                out.append(None)
                continue
            vals = [acc.value(int(starts[i]) + j)
                    for j in range(int(sizes[i]))]
            if isinstance(c.dtype, st.Map):
                vals = [(None if v is None else (v["key"], v["value"]))
                        for v in vals]
            out.append(vals)
        return out
    # fallback: whole-column (REE/Union and other long-tail layouts)
    return c.to_pylist()[lo:hi]


def iter_column(c: col.Column,
                window: int = DEFAULT_WINDOW) -> Iterator[Any]:
    """Lazy element iterator (reference ArrayIter): yields Python values
    with None for nulls, fetching one window at a time."""
    return iter(ArrayAccessor(c, window))


def iter_rows(batch, window: int = DEFAULT_WINDOW) -> Iterator[dict]:
    """Lazy row iterator over a RecordBatch: one dict per row, windowed
    fetches per column."""
    names = list(batch.schema.names)
    iters = [iter_column(c, window) for c in batch.columns]
    for vals in zip(*iters):
        yield dict(zip(names, vals))
