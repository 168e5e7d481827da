"""Global configuration for the arrowtpu engine.

The reference exposes configuration via cargo features + builder-pattern
option structs (see /root/reference/parquet/src/file/properties.rs:241,
arrow-select/src/take.rs:392).  Here a single module holds the engine-wide
constants (tile sizes, padding) plus small option dataclasses used by the
kernels.

64-bit integers: Arrow's type system requires real Int64/UInt64/Float64
columns (reference arrow-schema/src/datatype.rs:96).  JAX defaults to 32-bit
unless x64 is enabled, so the package enables it at import.
"""

from __future__ import annotations

import dataclasses

import jax

jax.config.update("jax_enable_x64", True)

# Capacity granule: every column's physical capacity is padded to a multiple
# of this.  128 matches the TPU lane width; x4 keeps (capacity/32) bitmap
# words themselves a multiple of 32 bits x 4 words.  The reference instead
# allows arbitrary lengths with bit-offset slicing
# (arrow-buffer/src/buffer/boolean.rs:97); on TPU we trade that for static,
# tile-aligned capacities with an explicit row_count.
CAPACITY_GRANULE = 128

# Dense-range GROUP BY fast path (ops/groupby.py): bucket count for the
# perfect-hash aggregate.  256 compiles in seconds on the TPU backend; the
# CPU test mesh overrides via env (XLA:CPU compiles the per-bucket
# reduction loop ~25x slower).
import os as _os

DENSE_GROUPBY_BUCKETS = int(
    _os.environ.get("ARROWTPU_DENSE_GROUPBY_BUCKETS", "256"))

# The Pallas selection kernel (pallas/compact.py) walks planes in tiles of
# this many words; columns at least this long get their capacity padded to a
# tile multiple so the kernel applies without re-padding (pallas/compact.py
# `supported`).  Shorter columns keep the 128-row granule and use the XLA
# path — selection on tiny columns is not bandwidth-bound anyway.
PALLAS_TILE = 16384

# Bits per packed-bitmap word.  The reference iterates validity 64 bits at a
# time (arrow-buffer/src/util/bit_chunk_iterator.rs); the TPU VPU prefers
# 32-bit lanes.
BITMAP_WORD_BITS = 32

# List sort keys compare element-by-element up to this many leading
# elements (then a length tiebreaker) — the list analogue of the string
# len_bound: static plane counts for the TPU sort (rowformat/encode.py;
# reference arrow-row/src/list.rs encodes unbounded blocks, which has no
# fixed-width equivalent).
LIST_SORT_BOUND = 8


def round_up(n: int, m: int | None = None) -> int:
    if m is None:
        if n >= 4 * PALLAS_TILE:      # biggest kernel tile (tile_r=512)
            m = 4 * PALLAS_TILE
        elif n >= PALLAS_TILE:
            m = PALLAS_TILE
        else:
            m = CAPACITY_GRANULE
    return -(-n // m) * m


@dataclasses.dataclass(frozen=True)
class SortOptions:
    """Ordering options, mirroring the reference's SortOptions
    (arrow-schema; used by arrow-ord/src/sort.rs:277).  Defaults: ascending,
    nulls first."""

    descending: bool = False
    nulls_first: bool = True


@dataclasses.dataclass(frozen=True)
class TakeOptions:
    """reference: arrow-select/src/take.rs:392."""

    check_bounds: bool = False


@dataclasses.dataclass(frozen=True)
class CastOptions:
    """reference: arrow-cast/src/cast/mod.rs:96.  safe=True yields null on
    cast failure; safe=False raises."""

    safe: bool = True
