"""Pallas TPU kernels for the engine's hot data-movement ops.

XLA fuses the elementwise plane well, but the selection plane's core
primitive — masked compaction with data-dependent output positions — lowers
to HLO scatter, which serializes on TPU (measured ~0.6 GB/s on v5e vs a
~670 GB/s HBM roofline).  These kernels re-express compaction as MXU
matmuls against one-hot permutation matrices plus sequential ragged DMA
appends, the TPU-native formulation (SURVEY §7 "selection as masks +
prefix sums").
"""

from .compact import TILE, compact_bytes, compact_words, supported  # noqa: F401
