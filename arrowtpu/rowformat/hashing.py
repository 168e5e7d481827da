"""Vectorized key hashing over row-format planes.

The reference has no hash kernels (hash join/aggregate live downstream in
DataFusion; BASELINE names them first-class new components).  Keys are the
order-preserving uint32 planes from rowformat.encode, so logically-equal
keys hash equal across columns/types — including the null sentinel, which
makes null keys hashable for group-by while joins exclude them explicitly.

Mixing: murmur3-style combine + fmix32 finalizer — multiply/xor/shift ops
that vectorize on the VPU.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _fmix32(h: jax.Array) -> jax.Array:
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def hash_planes(planes: Sequence[jax.Array], seed: int = 0) -> jax.Array:
    """(capacity,) uint32 hash of each row's key planes."""
    h = jnp.full(planes[0].shape, jnp.uint32(seed ^ 0x9E3779B9), dtype=_U32)
    for p in planes:
        k = p.astype(_U32) * jnp.uint32(0xCC9E2D51)
        k = _rotl(k, 15) * jnp.uint32(0x1B873593)
        h = h ^ k
        h = _rotl(h, 13) * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    return _fmix32(h)
