"""Order-preserving key encoding: columns -> uint32 comparison planes.

Capability mirror of the reference's arrow-row crate
(/root/reference/arrow-row/src/lib.rs:568 RowConverter; fixed-width
encodings lib.rs:199-230 and fixed.rs:217; float total-order flip
fixed.rs:118-149; null sentinel + desc/nulls-first handling SortField
lib.rs:930), re-designed for the TPU:

The reference produces *byte strings* compared with memcmp.  A TPU wants
fixed-width vector lanes, so each sort column encodes to a short sequence
of uint32 "planes", most-significant first; comparing rows by the plane
sequence lexicographically reproduces exactly the reference's row-format
ordering:

  * sentinel plane: null/valid flag ordered per nulls_first (reference
    null sentinel byte, lib.rs:199);
  * signed ints: big-endian word split with sign-bit flip on the top word
    (reference fixed.rs encode: sentinel + BE + sign flip);
  * floats: IEEE754 total_order transform — flip all bits for negatives,
    flip sign for positives — matching Rust total_cmp (NaN > +Inf;
    reference fixed.rs:118-149), then BE word split;
  * dictionaries: keys map through precomputed value sort-ranks
    (the reference instead *hydrates* dictionaries into the row bytes,
    lib.rs:306-312; ranks give the same ordering with a fixed-width key,
    the dictionary-sort trick of arrow-ord/src/sort.rs sort_dictionary);
  * descending: bitwise NOT of the value planes (reference inverts the
    encoded bytes, lib.rs:1979 encode_column w/ opts.descending).

These planes feed jax.lax.sort (XLA's tuned TPU sort) and the hash layer
(hash of planes == hash of logical key).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from .. import schema as st
from ..config import SortOptions
from ..core import bitmap as bm
from ..core import column as col

_U32 = jnp.uint32


def _int_planes(values: jax.Array) -> List[jax.Array]:
    """Narrow (<= 32-bit) integer planes."""
    dt = values.dtype
    signed = jnp.issubdtype(dt, jnp.signedinteger)
    if signed:
        # order-preserving map to unsigned: subtract the type minimum
        u = (values.astype(jnp.int64) - jnp.iinfo(dt).min).astype(jnp.uint32)
        return [u]
    return [values.astype(_U32)]


def _wide_planes(limbs: jax.Array, kind: str) -> List[jax.Array]:
    """64-bit limb columns -> [hi_plane, lo_plane] uint32, MSB first —
    pure 32-bit ops (this TPU cannot bitcast 64-bit types; see
    core/wide.py)."""
    from ..core import wide as wd

    if kind == "f64":
        ph, pl = wd.f64_total_order_planes(limbs)
        return [ph, pl]
    hi = wd.hi(limbs)
    if kind == "i64":
        hi = hi ^ jnp.uint32(0x80000000)  # sign flip on the top word
    return [hi, wd.lo(limbs)]


def _float_planes(values: jax.Array) -> List[jax.Array]:
    dt = values.dtype
    if dt == jnp.float16:
        values = values.astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(values.astype(jnp.float32), jnp.int32)
    mask = jnp.where(b < 0, jnp.int32(-1), jnp.int32(-0x80000000))
    return [(b ^ mask).astype(_U32)]


def encode_column(c: col.Column, opts: SortOptions = SortOptions()) -> List[jax.Array]:
    """Returns uint32 planes, most-significant first, such that
    lexicographic ascending comparison == SortOptions ordering."""
    cap = c.capacity
    if isinstance(c, col.NullColumn):
        return [jnp.zeros((cap,), _U32)]

    if isinstance(c, col.DictionaryColumn):
        if c.value_ranks is None:
            raise st.ComputeError(
                "dictionary sort requires value_ranks (call ensure_ranks "
                "or build via dictionary_encode_host)"
            )
        keys = jnp.clip(c.keys.values.astype(jnp.int32), 0, c.values.capacity - 1)
        rank_vals = c.value_ranks[keys]
        value_planes = [rank_vals.astype(_U32)]
        valid = c.keys.valid_bool()
    elif isinstance(c, col.BooleanColumn):
        value_planes = [c.values_bool().astype(_U32)]
        valid = c.valid_bool()
    elif isinstance(c, col.StringViewColumn):
        # exact varlen ordering: the full byte matrix as big-endian u32
        # planes (zero-padded; memcmp order), with a final length plane to
        # break ties among strings that differ only in trailing \0 bytes.
        # This is the reference's varlen row encoding
        # (arrow-row/src/variable.rs:94 block encoding) flattened into
        # fixed-width vector lanes; plane count is static via len_bound.
        from ..ops.strings import byte_matrix, max_byte_length

        L = max_byte_length(c)
        mat, lens = byte_matrix(c, L)
        quads = mat.reshape(c.capacity, L // 4, 4).astype(_U32)
        words = (
            (quads[:, :, 0] << 24)
            | (quads[:, :, 1] << 16)
            | (quads[:, :, 2] << 8)
            | quads[:, :, 3]
        )
        value_planes = [words[:, k] for k in range(L // 4)]
        value_planes.append(lens.astype(_U32))
        valid = c.valid_bool()
    elif isinstance(c, col.PrimitiveColumn) and isinstance(
            c.dtype, st.FixedSizeBinary):
        # memcmp byte order: byteswap each little-endian word, planes
        # MSB-word first (reference fixed.rs FixedSizeBinary encoding)
        v = c.values
        sw = (((v & _U32(0xFF)) << 24) | ((v & _U32(0xFF00)) << 8)
              | ((v >> 8) & _U32(0xFF00)) | (v >> 24))
        value_planes = [sw[:, j] for j in range(v.shape[1])]
        valid = c.valid_bool()
    elif isinstance(c, col.PrimitiveColumn):
        if st.decimal_limbs(c.dtype) is not None:
            # signed N-limb order: sign-flipped top limb, then high->low
            from ..core import limbs as lb

            value_planes = lb.sort_planes(c.values)
        elif c.wide is not None:
            value_planes = _wide_planes(c.values, c.wide)
        elif jnp.issubdtype(c.values.dtype, jnp.floating):
            value_planes = _float_planes(c.values)
        else:
            value_planes = _int_planes(c.values)
        valid = c.valid_bool()
    elif isinstance(c, col.StructColumn):
        # depth-first: each child's FULL encoding (its own sentinel +
        # value planes) in field order (reference arrow-row/src/lib.rs:
        # 318-330 — structs encode a null indicator then the fields'
        # encodings back to back)
        value_planes = []
        for ch in c.children:
            value_planes.extend(encode_column(ch, SortOptions()))
        valid = c.valid_bool()
    elif isinstance(c, col.ListViewColumn):
        # block encoding, flattened to planes (reference arrow-row/src/
        # list.rs): element j contributes [present_j, element_j planes]
        # for j < LIST_SORT_BOUND, then a final length plane breaks ties
        # among lists equal on the bounded prefix.  Like len_bound for
        # strings, the bound is a static engine parameter: lists that
        # differ only beyond it compare equal before the length plane.
        from ..config import LIST_SORT_BOUND

        child = c.child
        if not isinstance(child, col.PrimitiveColumn):
            raise st.ComputeError(
                "encode: list sort keys support primitive elements")
        K = LIST_SORT_BOUND
        starts = c.starts.astype(jnp.int32)
        sizes = jnp.where(c.valid_bool(), c.sizes.astype(jnp.int32), 0)
        value_planes = []
        ccap = child.capacity
        for j in range(K):
            present = (sizes > j).astype(_U32)
            idx = jnp.clip(starts + j, 0, ccap - 1)
            if st.decimal_limbs(child.dtype) is not None:
                from ..core import limbs as lb

                elem_planes = lb.sort_planes(child.values[idx])
            elif child.wide is not None:
                elem_planes = _wide_planes(child.values[idx], child.wide)
            elif jnp.issubdtype(child.values.dtype, jnp.floating):
                elem_planes = _float_planes(child.values[idx])
            else:
                elem_planes = _int_planes(child.values[idx])
            elem_ok = (present * child.valid_bool()[idx].astype(_U32))
            value_planes.append(present)
            # absent/null elements zero their planes; a null element
            # sorts before any value at the same position
            value_planes.append(elem_ok)
            value_planes.extend([p * elem_ok for p in elem_planes])
        value_planes.append(sizes.astype(_U32))
        valid = c.valid_bool()
    else:
        raise st.ComputeError(f"encode: unsupported column {type(c).__name__}")

    # null rows: zero the value planes so ties among nulls are stable
    valid_u = valid.astype(_U32)
    value_planes = [p * valid_u for p in value_planes]
    if opts.descending:
        value_planes = [(~p) * valid_u for p in value_planes]

    if opts.nulls_first:
        sentinel = valid_u  # null=0 sorts first ascending
    else:
        sentinel = jnp.uint32(1) - valid_u  # null=1 sorts last
    return [sentinel] + value_planes


def encode_columns(
    columns: Sequence[col.Column], options: Sequence[SortOptions] | None = None
) -> List[jax.Array]:
    """Multi-column key material (reference RowConverter::convert_columns,
    lib.rs:1004): planes of column 0 are most significant."""
    if options is None:
        options = [SortOptions()] * len(columns)
    planes: List[jax.Array] = []
    for c, o in zip(columns, options):
        planes.extend(encode_column(c, o))
    return planes


STRING_CHUNK_WORDS = 4


def encode_columns_grouped(
    columns: Sequence[col.Column],
    options: Sequence[SortOptions] | None = None,
    chunk_words: int = STRING_CHUNK_WORDS,
) -> List[List[jax.Array]]:
    """Multi-column key material as plane GROUPS for the chained packed
    sort (rowformat/pack.py sort_by_plane_groups).  Long varlen columns
    split into prefix + refinement chunks of `chunk_words` planes each
    (first 16 bytes sort first; ties refine 16 bytes at a time),
    replacing the len_bound/4+1 plane explosion (reference block
    encoding arrow-row/src/variable.rs:94; round-5 ask #4).  Short
    strings and every other type stay whole."""
    if options is None:
        options = [SortOptions()] * len(columns)
    groups: List[List[jax.Array]] = [[]]
    for c, o in zip(columns, options):
        if isinstance(c, col.StringViewColumn):
            from ..ops.strings import byte_matrix, max_byte_length

            L = max_byte_length(c)
            nw = L // 4
            if nw > chunk_words:
                mat, lens = byte_matrix(c, L)
                quads = mat.reshape(c.capacity, nw, 4).astype(_U32)
                words = ((quads[:, :, 0] << 24) | (quads[:, :, 1] << 16)
                         | (quads[:, :, 2] << 8) | quads[:, :, 3])
                valid_u = c.valid_bool().astype(_U32)
                planes = [words[:, k] * valid_u for k in range(nw)]
                planes.append(lens.astype(_U32) * valid_u)
                if o.descending:
                    planes = [(~p) * valid_u for p in planes]
                sentinel = (valid_u if o.nulls_first
                            else jnp.uint32(1) - valid_u)
                groups[-1].append(sentinel)
                groups[-1].extend(planes[:chunk_words])
                for i in range(chunk_words, nw + 1, chunk_words):
                    groups.append(planes[i:i + chunk_words])
                continue
        groups[-1].extend(encode_column(c, o))
    return [g for g in groups if g] or [[]]


def padding_plane(capacity: int, length) -> jax.Array:
    """Most-significant plane forcing padding rows to sort last."""
    return (~bm.row_mask_bool(capacity, length)).astype(_U32)
