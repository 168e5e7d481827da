"""Memory accounting + opt-in execution metrics.

Capability mirrors:
  * get_buffer_memory_size (reference arrow-array/src/array/mod.rs:351) ->
    `buffer_memory_size`, summing every jax buffer a column/batch holds;
  * MemoryPool / TrackingMemoryPool (arrow-buffer/src/pool.rs:73,93) ->
    `TrackingMemoryPool` with claim/release accounting;
  * ArrowReaderMetrics (parquet/src/arrow/arrow_reader/metrics.rs:119) ->
    `Metrics` opt-in counters readers/kernels can bump.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Dict

import jax

from ..core import batch as bt
from ..core import column as col


def buffer_memory_size(x) -> int:
    """Total bytes of device buffers reachable from a column/batch pytree."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total


class TrackingMemoryPool:
    """reference pool.rs:93: accounts bytes claimed per tag."""

    def __init__(self):
        self._lock = threading.Lock()
        self._used: Dict[str, int] = {}

    def claim(self, tag: str, x) -> int:
        n = buffer_memory_size(x) if not isinstance(x, int) else x
        with self._lock:
            self._used[tag] = self._used.get(tag, 0) + n
        return n

    def release(self, tag: str, nbytes: int):
        with self._lock:
            self._used[tag] = max(0, self._used.get(tag, 0) - nbytes)

    def used(self, tag: str = None) -> int:
        with self._lock:
            if tag is not None:
                return self._used.get(tag, 0)
            return sum(self._used.values())


@dataclasses.dataclass
class Metrics:
    """Opt-in counters (reference ArrowReaderMetrics)."""

    records_read: int = 0
    bytes_read: int = 0
    batches_decoded: int = 0
    predicate_rows_pruned: int = 0

    def record_batch(self, batch: bt.RecordBatch):
        self.records_read += int(batch.length)
        self.bytes_read += buffer_memory_size(batch)
        self.batches_decoded += 1
