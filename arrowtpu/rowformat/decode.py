"""Row-format decode: planes -> columns (the convert_rows round-trip).

Capability mirror of /root/reference/arrow-row/src/lib.rs:1113
convert_rows / decode_column :2198: the reference's row encoding is
reversible; ours is too — every transform in rowformat/encode.py has an
exact inverse:

  * sentinel plane -> validity (per nulls_first);
  * descending     -> bitwise NOT of value planes (self-inverse on the
    valid rows; null rows decode to 0 + validity false);
  * narrow ints    -> subtract-min map inverted by adding the type min;
  * floats         -> IEEE754 total-order flip inverted by sign-bit test
    (top bit set => originally non-negative);
  * 64-bit limbs   -> the hi-word sign flip / total-order flip inverted
    limb-wise (core/wide.py);
  * strings        -> big-endian byte planes + length plane reassemble the
    byte matrix (ops/strings.from_byte_matrix);
  * dictionaries   -> rank plane inverted through the rank->value-index
    permutation; decodes to keys over the SAME dictionary values.

`RowConverter` pairs the two directions and owns the static metadata the
inverse needs (dtype, options, dictionary values, string length bound) —
the analogue of the reference's RowConverter field state (lib.rs:568).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import schema as st
from ..config import SortOptions
from ..core import bitmap as bm
from ..core import column as col
from . import encode as rf

_U32 = jnp.uint32


@dataclasses.dataclass
class _Codec:
    kind: str               # null|bool|int|float32|i64|u64|f64|dict|string
    dtype: st.DataType
    n_planes: int           # value planes (sentinel excluded)
    opts: SortOptions
    int_min: int = 0
    np_dtype: Optional[object] = None
    len_bound: int = 0
    dict_values: Optional[col.Column] = None
    dict_ranks: Optional[jax.Array] = None
    dict_key_dtype: Optional[st.DataType] = None


def _codec_for(c: col.Column, opts: SortOptions) -> _Codec:
    if isinstance(c, col.NullColumn):
        return _Codec("null", c.dtype, 1, opts)
    if isinstance(c, col.DictionaryColumn):
        return _Codec("dict", c.dtype, 1, opts,
                      dict_values=c.values, dict_ranks=c.value_ranks,
                      dict_key_dtype=c.keys.dtype)
    if isinstance(c, col.BooleanColumn):
        return _Codec("bool", c.dtype, 1, opts)
    if isinstance(c, col.StringViewColumn):
        from ..ops.strings import max_byte_length

        L = max_byte_length(c)
        return _Codec("string", c.dtype, L // 4 + 1, opts, len_bound=L)
    if isinstance(c, col.PrimitiveColumn):
        if c.wide is not None:
            return _Codec(c.wide, c.dtype, 2, opts)
        dt = c.values.dtype
        if jnp.issubdtype(dt, jnp.floating):
            return _Codec("float32", c.dtype, 1, opts, np_dtype=dt)
        mn = jnp.iinfo(dt).min if jnp.issubdtype(dt, jnp.signedinteger) else 0
        return _Codec("int", c.dtype, 1, opts, int_min=int(mn), np_dtype=dt)
    raise st.ComputeError(f"row decode: unsupported column {type(c).__name__}")


def _total_planes(codec: _Codec) -> int:
    # NullColumn encodes as a single zero plane with no sentinel
    # (encode.py early-return); everything else is sentinel + value planes
    return 1 if codec.kind == "null" else 1 + codec.n_planes


def _decode_one(codec: _Codec, planes: List[jax.Array], length) -> col.Column:
    opts = codec.opts
    cap = planes[0].shape[0]
    if codec.kind == "null":
        return col.NullColumn(length, cap)
    sentinel = planes[0]
    if opts.nulls_first:
        valid = sentinel == 1
    else:
        valid = sentinel == 0
    vp = list(planes[1:])
    if opts.descending:
        valid_u = valid.astype(_U32)
        vp = [(~p) * valid_u for p in vp]
    live = bm.row_mask_bool(cap, length)
    validity = bm.pack(valid & live)

    if codec.kind == "null":
        return col.NullColumn(length, cap)
    if codec.kind == "bool":
        return col.BooleanColumn(bm.pack(vp[0] == 1), validity, length)
    if codec.kind == "int":
        vals = (vp[0].astype(jnp.int64) + codec.int_min).astype(codec.np_dtype)
        return col.PrimitiveColumn(vals, validity, length, codec.dtype)
    if codec.kind == "float32":
        e = vp[0]
        b = jnp.where(
            (e >> 31) != 0, e ^ _U32(0x80000000), ~e
        ).astype(_U32)
        f = jax.lax.bitcast_convert_type(b.astype(jnp.uint32), jnp.float32)
        # null rows decode from a zero plane: ~0 pattern is NaN-ish; zero it
        f = jnp.where(valid, f, jnp.float32(0)).astype(codec.np_dtype)
        return col.PrimitiveColumn(f, validity, length, codec.dtype)
    if codec.kind in ("i64", "u64", "f64"):
        from ..core import wide as wd

        hi_p, lo_p = vp[0], vp[1]
        if codec.kind == "i64":
            hi_p = hi_p ^ _U32(0x80000000)
        elif codec.kind == "f64":
            negative = (hi_p >> 31) == 0  # encoded negatives have top bit 0
            hi_p = jnp.where(negative, ~hi_p, hi_p ^ _U32(0x80000000))
            lo_p = jnp.where(negative, ~lo_p, lo_p)
        limbs = wd.make(lo_p, hi_p)
        valid2 = valid.reshape(-1, 1)
        limbs = jnp.where(valid2, limbs, jnp.zeros_like(limbs))
        return col.PrimitiveColumn(limbs, validity, length, codec.dtype)
    if codec.kind == "dict":
        ranks = codec.dict_ranks
        if ranks is None:
            raise st.ComputeError("row decode: dictionary without ranks")
        nvals = ranks.shape[0]
        # padding entries of `ranks` are 0 and contest the true rank-0
        # value; scatter-min resolves it (padding indices sit at the end of
        # the values column, above every live index)
        inv = jnp.full(nvals, nvals - 1, jnp.int32).at[
            jnp.clip(ranks.astype(jnp.int32), 0, nvals - 1)
        ].min(jnp.arange(nvals, dtype=jnp.int32))
        keys_raw = inv[jnp.clip(vp[0].astype(jnp.int32), 0, nvals - 1)]
        keys = col.PrimitiveColumn(
            keys_raw.astype(jnp.int32), validity, length,
            codec.dict_key_dtype or st.int32,
        )
        return col.DictionaryColumn(keys, codec.dict_values, ranks, codec.dtype)
    if codec.kind == "string":
        from ..ops.strings import from_byte_matrix

        L = codec.len_bound
        words = jnp.stack(vp[:-1], axis=1)  # (cap, L/4) big-endian words
        lens = vp[-1].astype(jnp.int32)
        b0 = (words >> 24).astype(jnp.uint8)
        b1 = ((words >> 16) & 0xFF).astype(jnp.uint8)
        b2 = ((words >> 8) & 0xFF).astype(jnp.uint8)
        b3 = (words & 0xFF).astype(jnp.uint8)
        mat = jnp.stack([b0, b1, b2, b3], axis=2).reshape(cap, L)
        return from_byte_matrix(mat, lens, validity, length, codec.dtype)
    raise st.ComputeError(f"row decode: unknown codec {codec.kind}")


class RowConverter:
    """Two-way row-format conversion (reference RowConverter, lib.rs:568).

    convert_columns(columns) -> List[uint32 planes]; convert_rows(planes,
    length) -> columns.  The converter captures per-column static metadata
    on the first convert_columns call.
    """

    def __init__(self, options: Optional[Sequence[SortOptions]] = None):
        self.options = options
        self.codecs: Optional[List[_Codec]] = None

    def convert_columns(self, columns: Sequence[col.Column]) -> List[jax.Array]:
        opts = (list(self.options) if self.options is not None
                else [SortOptions()] * len(columns))
        self.codecs = [_codec_for(c, o) for c, o in zip(columns, opts)]
        return rf.encode_columns(columns, opts)

    def convert_rows(self, planes: Sequence[jax.Array], length) -> List[col.Column]:
        if self.codecs is None:
            raise st.ComputeError("convert_rows before convert_columns")
        out = []
        i = 0
        for codec in self.codecs:
            n = _total_planes(codec)
            out.append(_decode_one(codec, list(planes[i:i + n]), length))
            i += n
        if i != len(planes):
            raise st.ComputeError(
                f"convert_rows: {len(planes)} planes, expected {i}")
        return out
