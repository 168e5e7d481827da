"""Packed 1-bit-per-row bitmaps as uint32 word arrays in HBM.

Capability mirror of the reference's bitmap layer
(/root/reference/arrow-buffer/src/buffer/boolean.rs:97 BooleanBuffer,
buffer/null.rs:34 NullBuffer, util/bit_chunk_iterator.rs, util/bit_util.rs),
re-designed for the TPU VPU:

  * words are uint32 (VPU-native lane width) instead of the reference's
    64-bit chunk iteration;
  * there is no bit-offset — columns are capacity-padded to a multiple of
    128 rows (config.CAPACITY_GRANULE), so a bitmap is always a whole number
    of words and word-wise ops never need edge masking (the reference's
    remainder handling, bit_chunk_iterator.rs, disappears by construction);
  * bitwise binary ops on bitmaps are plain jnp ops on the word arrays and
    fuse in XLA (reference BooleanBuffer::from_bitwise_binary_op,
    buffer/boolean.rs:332);
  * validity union (AND-merge) mirrors NullBuffer::union (null.rs:79).

All functions are jit-safe and shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BITMAP_WORD_BITS as W
from ..config import round_up

_U32 = jnp.uint32


def num_words(capacity: int) -> int:
    if capacity % W != 0:
        raise ValueError(f"capacity {capacity} not a multiple of {W}")
    return capacity // W


def capacity_of(words: jax.Array) -> int:
    return words.shape[0] * W


def pack(bools: jax.Array) -> jax.Array:
    """bool (capacity,) -> packed uint32 (capacity/32,).

    XLA fuses the shift/sum into the producing elementwise op, so 'pack' on
    the output of a comparison costs one pass over the data.
    """
    n = bools.shape[0]
    nw = num_words(n)
    b = bools.astype(_U32).reshape(nw, W)
    weights = (jnp.uint32(1) << jnp.arange(W, dtype=_U32)).reshape(1, W)
    return jnp.sum(b * weights, axis=1, dtype=_U32)


def unpack(words: jax.Array, capacity: int | None = None) -> jax.Array:
    """packed uint32 -> bool (capacity,)."""
    nw = words.shape[0]
    cap = nw * W if capacity is None else capacity
    assert cap == nw * W, (cap, nw)
    shifts = jnp.arange(W, dtype=_U32).reshape(1, W)
    bits = (words.reshape(nw, 1) >> shifts) & jnp.uint32(1)
    return bits.astype(jnp.bool_).reshape(cap)


def count_set_bits(words: jax.Array) -> jax.Array:
    """Total popcount (reference BooleanBuffer::count_set_bits,
    boolean.rs:438). Returns int32 scalar."""
    return jnp.sum(jax.lax.population_count(words).astype(jnp.int32))


def bit_and(a, b):
    return a & b


def bit_or(a, b):
    return a | b


def bit_xor(a, b):
    return a ^ b


def bit_not(a):
    return ~a


def all_valid(capacity: int) -> jax.Array:
    return jnp.full((num_words(capacity),), jnp.uint32(0xFFFFFFFF), dtype=_U32)


def all_invalid(capacity: int) -> jax.Array:
    return jnp.zeros((num_words(capacity),), dtype=_U32)


def row_mask_words(capacity: int, length) -> jax.Array:
    """Packed mask with bits [0, length) set — the 'row is real data, not
    padding' mask.  `length` may be traced."""
    nw = num_words(capacity)
    word_idx = jnp.arange(nw, dtype=jnp.int32)
    full = jnp.int32(length) // W  # words fully set
    rem = jnp.int32(length) - full * W
    full_word = jnp.uint32(0xFFFFFFFF)
    partial = jnp.where(
        rem > 0, (jnp.uint32(1) << rem.astype(_U32)) - jnp.uint32(1), jnp.uint32(0)
    )
    return jnp.where(
        word_idx < full, full_word, jnp.where(word_idx == full, partial, jnp.uint32(0))
    )


def row_mask_bool(capacity: int, length) -> jax.Array:
    """Boolean (capacity,) mask of real (non-padding) rows."""
    return jnp.arange(capacity, dtype=jnp.int32) < jnp.int32(length)


def union(a, b):
    """AND-merge of two optional validity bitmaps (reference
    NullBuffer::union, null.rs:79-86): None means all-valid."""
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def union_many(*bitmaps):
    """reference NullBuffer::union_many (null.rs:92)."""
    out = None
    for b in bitmaps:
        out = union(out, b)
    return out


def from_numpy_bools(bools: np.ndarray) -> jax.Array:
    """Host-side pack (used by interop / builders)."""
    cap = round_up(len(bools))
    padded = np.zeros(cap, dtype=np.uint8)
    padded[: len(bools)] = bools.astype(np.uint8)
    words = padded.reshape(-1, W) << np.arange(W, dtype=np.uint32)
    return jnp.asarray(words.sum(axis=1, dtype=np.uint32))


def to_numpy_bools(words, length: int) -> np.ndarray:
    w = np.asarray(words)
    bits = (w[:, None] >> np.arange(W, dtype=np.uint32)) & 1
    return bits.reshape(-1)[:length].astype(bool)
