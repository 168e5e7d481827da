"""Tensor: n-dimensional dense value container.

Capability mirror of /root/reference/arrow/src/tensor.rs (Tensor over a
Buffer with shape/strides/dim names, row/column-major predicates).  Here
the buffer IS a jax.Array living in HBM; strides are element strides
derived from (or validated against) the shape, and the 64-bit logical
types use the same u32 limb-pair physical layout as columns."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import schema as st


def _row_major_strides(shape) -> Tuple[int, ...]:
    out, acc = [], 1
    for s in reversed(shape):
        out.append(acc)
        acc *= s
    return tuple(reversed(out))


def _col_major_strides(shape) -> Tuple[int, ...]:
    out, acc = [], 1
    for s in shape:
        out.append(acc)
        acc *= s
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class Tensor:
    """reference tensor.rs Tensor<T>: data + shape + strides + names."""

    data: jnp.ndarray  # flat (n,) or (n, 2) limb values
    dtype: st.DataType
    shape: Tuple[int, ...]
    strides: Tuple[int, ...]
    names: Optional[Tuple[str, ...]] = None

    def __post_init__(self):
        n = 1
        for s in self.shape:
            n *= s
        if self.data.shape[0] < n:
            raise st.InvalidArgumentError(
                f"tensor data has {self.data.shape[0]} elements, shape needs {n}"
            )
        if len(self.strides) != len(self.shape):
            raise st.InvalidArgumentError("strides rank != shape rank")
        if self.names is not None and len(self.names) != len(self.shape):
            raise st.InvalidArgumentError("names rank != shape rank")

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n

    def is_contiguous(self) -> bool:
        return self.is_row_major() or self.is_column_major()

    def is_row_major(self) -> bool:
        return self.strides == _row_major_strides(self.shape)

    def is_column_major(self) -> bool:
        return self.strides == _col_major_strides(self.shape)

    def dim_name(self, i: int) -> Optional[str]:
        return self.names[i] if self.names else None

    def value(self, index) -> jnp.ndarray:
        flat = sum(i * s for i, s in zip(index, self.strides))
        return self.data[flat]

    def to_numpy(self) -> np.ndarray:
        from .core import wide as wd

        kind = st.wide_kind(self.dtype)
        if kind is not None:
            npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
            flat = wd.join_numpy(np.asarray(self.data)[: self.size], npdt)
        else:
            flat = np.asarray(self.data)[: self.size]
        if self.is_row_major():
            return flat.reshape(self.shape)
        return np.lib.stride_tricks.as_strided(
            flat, self.shape, tuple(s * flat.itemsize for s in self.strides)
        ).copy()


def tensor(values, dtype: st.DataType = None, names=None,
           column_major: bool = False) -> Tensor:
    """Build a Tensor from a host/device ndarray (reference
    Tensor::try_new tensor.rs; new_row_major/new_column_major)."""
    arr = np.asarray(values)
    if dtype is None:
        dtype = st.from_jnp(arr.dtype) if arr.dtype.itemsize < 8 else {
            np.dtype(np.int64): st.int64,
            np.dtype(np.uint64): st.uint64,
            np.dtype(np.float64): st.float64,
        }.get(arr.dtype, st.from_jnp(arr.dtype))
    shape = arr.shape
    if column_major:
        flat = arr.flatten(order="F")
        strides = _col_major_strides(shape)
    else:
        flat = arr.ravel()
        strides = _row_major_strides(shape)
    kind = st.wide_kind(dtype)
    if kind is not None:
        from .core import wide as wd

        data = jnp.asarray(wd.split_numpy(flat))
    else:
        data = jnp.asarray(flat.astype(dtype.to_jnp()))
    return Tensor(data, dtype, tuple(shape), strides,
                  tuple(names) if names else None)
