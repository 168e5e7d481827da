"""Seeded random data generators for benches and fuzz tests.

Capability mirror of /root/reference/arrow/src/util/bench_util.rs:45
(create_primitive_array(size, null_density) etc. with seedable_rng,
test_util.rs) and data_gen.rs:912 random nested batches."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import schema as st
from ..core import batch as bt
from ..core import column as col
from ..interop.pyarrow_bridge import from_pyarrow


def seedable_rng(seed: int = 42) -> np.random.Generator:
    """reference test_util.rs seedable_rng (fixed default seed)."""
    return np.random.default_rng(seed)


def _validity(rng, n: int, null_density: float):
    if null_density <= 0:
        return None
    return rng.random(n) >= null_density


def create_primitive_column(
    size: int, null_density: float = 0.0, dtype: st.DataType = st.int64,
    rng: Optional[np.random.Generator] = None,
) -> col.Column:
    """reference bench_util.rs create_primitive_array."""
    rng = rng or seedable_rng()
    valid = _validity(rng, size, null_density)
    if isinstance(dtype, st.Float):
        vals = rng.standard_normal(size).astype(dtype.to_jnp().name)
    elif isinstance(dtype, st.Boolean):
        vals = rng.random(size) < 0.5
        return col.boolean(vals, validity=valid)
    else:
        info = np.iinfo(dtype.to_jnp().name)
        lo = max(info.min, -(2**53))
        hi = min(info.max, 2**53)
        vals = rng.integers(lo, hi, size)
        vals = vals.astype(dtype.to_jnp().name)
    if valid is not None:
        vals = np.where(valid, vals, np.zeros(1, vals.dtype))
    return col.primitive(vals, dtype, validity=valid)


def create_string_column(
    size: int, null_density: float = 0.0, max_len: int = 20,
    rng: Optional[np.random.Generator] = None,
) -> col.StringViewColumn:
    """reference bench_util.rs create_string_array."""
    rng = rng or seedable_rng()
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for i in range(size):
        if null_density and rng.random() < null_density:
            out.append(None)
        else:
            ln = int(rng.integers(0, max_len + 1))
            out.append("".join(rng.choice(letters, ln)))
    return col.string_view(out)


def create_dict_column(
    size: int, cardinality: int = 16, null_density: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> col.DictionaryColumn:
    rng = rng or seedable_rng()
    values = [f"value-{i:04d}" for i in range(cardinality)]
    data = [
        None if (null_density and rng.random() < null_density)
        else values[int(rng.integers(0, cardinality))]
        for _ in range(size)
    ]
    return col.dictionary_encode_host(data, st.Dictionary(st.int32, st.utf8))


def create_random_batch(
    size: int, null_density: float = 0.1, rng: Optional[np.random.Generator] = None,
) -> bt.RecordBatch:
    """reference data_gen.rs create_random_batch (flat subset)."""
    rng = rng or seedable_rng()
    return bt.RecordBatch(
        st.Schema(
            (
                st.Field("i64", st.int64),
                st.Field("i32", st.int32),
                st.Field("f64", st.float64),
                st.Field("b", st.boolean),
                st.Field("s", st.utf8),
                st.Field("d", st.Dictionary(st.int32, st.utf8)),
            )
        ),
        (
            create_primitive_column(size, null_density, st.int64, rng),
            create_primitive_column(size, null_density, st.int32, rng),
            create_primitive_column(size, null_density, st.float64, rng),
            create_primitive_column(size, null_density, st.boolean, rng),
            create_string_column(size, null_density, rng=rng),
            create_dict_column(size, null_density=null_density, rng=rng),
        ),
    )
