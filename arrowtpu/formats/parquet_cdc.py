"""Parquet content-defined chunking (CDC) page boundaries.

Capability mirror of the reference's
parquet/src/column/chunker/cdc.rs:88 `ContentDefinedChunker` (FastCDC
gearhash with a min-size skip window, 8-consecutive-match CLT
normalization and a max-size cap) behind a WriterProperties knob
(file/properties.rs CdcOptions).  Boundaries depend only on the data,
so inserting or editing one row re-chunks only the affected pages —
content-addressable storage then dedups the untouched pages across
file versions.

The per-byte rolling hash runs in native C++ (native/src/cdchunk.cpp);
a pure-Python fallback keeps the feature available without a compiler.
"""

from __future__ import annotations

import ctypes
import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .. import schema as st

NUM_TABLES = 8


@dataclasses.dataclass(frozen=True)
class CdcOptions:
    """reference file/properties.rs CdcOptions."""

    min_chunk_size: int = 256 * 1024
    max_chunk_size: int = 1024 * 1024
    norm_level: int = 0


def calculate_mask(min_chunk_size: int, max_chunk_size: int,
                   norm_level: int) -> int:
    """cdc.rs calculate_mask: top-bits mask sized so chunk sizes
    approximate a normal distribution between min and max."""
    if min_chunk_size < 0:
        raise st.ArrowTpuError("cdc: min_chunk_size must be non-negative")
    if max_chunk_size <= min_chunk_size:
        raise st.ArrowTpuError("cdc: max_chunk_size must exceed min")
    avg = (min_chunk_size + max_chunk_size) // 2
    target = (avg - min_chunk_size) // NUM_TABLES
    mask_bits = target.bit_length() - 1 if target > 0 else 0
    effective = mask_bits - norm_level
    if not 1 <= effective <= 63:
        raise st.ArrowTpuError(
            f"cdc: mask bits must be in 1..63, got {effective}")
    return (0xFFFFFFFFFFFFFFFF << (64 - effective)) & 0xFFFFFFFFFFFFFFFF


def _splitmix64(state: int) -> Tuple[int, int]:
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return state, z ^ (z >> 31)


_TABLES: Optional[np.ndarray] = None


def gear_tables() -> np.ndarray:
    """(NUM_TABLES, 256) u64, identical to the native generator."""
    global _TABLES
    if _TABLES is None:
        state = 0x6172727774707565
        out = np.empty(NUM_TABLES * 256, np.uint64)
        for i in range(NUM_TABLES * 256):
            state, v = _splitmix64(state)
            out[i] = v
        _TABLES = out.reshape(NUM_TABLES, 256)
    return _TABLES


def row_boundaries(data: bytes, row_off: np.ndarray,
                   levels: Optional[np.ndarray],
                   options: CdcOptions) -> np.ndarray:
    """Per-row bool: a new chunk starts AFTER this row.  data is the
    concatenated per-row value bytes; row_off its (nrows+1) offsets;
    levels the optional per-row def levels."""
    mask = calculate_mask(options.min_chunk_size, options.max_chunk_size,
                          options.norm_level)
    nrows = len(row_off) - 1
    out = np.zeros(nrows, np.uint8)
    from .. import native

    lib = native.load("cdchunk")
    if lib is not None:
        tables = np.ascontiguousarray(gear_tables())
        ro = np.ascontiguousarray(row_off, np.int64)
        lv = (np.ascontiguousarray(levels, np.uint8)
              if levels is not None else np.zeros(1, np.uint8))
        lib.arrowtpu_cdc_boundaries(
            data, ro.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(nrows),
            lv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(1 if levels is not None else 0),
            tables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_uint64(mask),
            ctypes.c_int64(options.min_chunk_size),
            ctypes.c_int64(options.max_chunk_size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)
    # pure-Python fallback (same state machine)
    tables = gear_tables()
    rolling = 0
    has_matched = False
    nth_run = 0
    chunk_size = 0
    M64 = 0xFFFFFFFFFFFFFFFF
    for r in range(nrows):
        segs = []
        if levels is not None:
            segs.append(bytes([int(levels[r]), 0]))
        segs.append(data[row_off[r]:row_off[r + 1]])
        for seg in segs:
            chunk_size += len(seg)
            if chunk_size < options.min_chunk_size:
                continue
            t = tables[nth_run]
            for b in seg:
                rolling = ((rolling << 1) + int(t[b])) & M64
                has_matched = has_matched or (rolling & mask) == 0
        if has_matched:
            has_matched = False
            nth_run += 1
            if nth_run >= NUM_TABLES:
                nth_run = 0
                chunk_size = 0
                out[r] = 1
                continue
        if chunk_size >= options.max_chunk_size:
            chunk_size = 0
            out[r] = 1
    return out.astype(bool)


def page_slices(vals, valid: np.ndarray, phys: int, nullable: bool,
                options: CdcOptions, n: int) -> List[Tuple[int, int]]:
    """Content-defined (r0, r1) page slices for one column chunk.
    `vals` is the writer's dense value representation: an ndarray for
    fixed-width physicals, or (starts, lens, data) for BYTE_ARRAY."""
    if n == 0:
        return [(0, 0)]
    valid = np.asarray(valid[:n], bool)
    if isinstance(vals, tuple):  # byte-array: (starts, lens, data) DENSE
        starts, lens, data = vals
        lens = np.asarray(lens, np.int64)
        starts = np.asarray(starts, np.int64)
        row_lens = np.zeros(n, np.int64)
        row_lens[valid] = lens  # null rows contribute zero value bytes
        row_off = np.zeros(n + 1, np.int64)
        np.cumsum(row_lens, out=row_off[1:])
        total = int(row_off[-1])
        if total:
            data = np.asarray(data, np.uint8)
            dense_off = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(lens, out=dense_off[1:])
            idx = (np.arange(total, dtype=np.int64)
                   - np.repeat(dense_off[:-1], lens)
                   + np.repeat(starts, lens))
            buf = data[idx].tobytes()
        else:
            buf = b""
    else:
        # fixed-width DENSE values: null rows contribute zero bytes
        arr = np.ascontiguousarray(vals)
        width = arr.dtype.itemsize if arr.ndim == 1 else (
            arr.dtype.itemsize * arr.shape[1])
        row_lens = np.where(valid, np.int64(width), np.int64(0))
        row_off = np.zeros(n + 1, np.int64)
        np.cumsum(row_lens, out=row_off[1:])
        buf = arr.tobytes()
    levels = valid[:n].astype(np.uint8) if nullable else None
    marks = row_boundaries(buf, row_off, levels, options)
    cuts = np.flatnonzero(marks) + 1
    edges = [0] + [int(c) for c in cuts if c < n] + [n]
    return list(zip(edges[:-1], edges[1:]))
