"""Typed columnar arrays as JAX pytrees resident in HBM.

Capability mirror of the reference's array stack
(/root/reference/arrow-array/src/array/mod.rs:123 Array trait,
arrow-data/src/data.rs:208 ArrayData), re-designed TPU-first:

  * A column is a frozen dataclass pytree of dense `jax.Array` leaves —
    values (capacity-padded), a packed uint32 validity bitmap (or None for
    all-valid, like the reference's `nulls: Option<NullBuffer>`), and a
    traced scalar `length`.  The Arc'd Buffer graph + trait-object dispatch
    of the reference (arrow-array/src/cast.rs:361 downcast macros) becomes
    dtype-static metadata + JIT specialization.
  * Capacities are static and padded to config.CAPACITY_GRANULE (128) so
    every kernel sees tile-aligned shapes; `length` carries the dynamic row
    count (XLA needs static shapes — reference slicing with arbitrary
    offsets, arrow-buffer/src/buffer/immutable.rs:83, becomes
    capacity+length).
  * Padding contract: rows in [length, capacity) have value 0 / validity
    bit 0 (when a validity bitmap exists).  Kernels may freely compute on
    padding; they must never let it influence rows < length.
  * Strings/bytes use arrow *view* representation — a (capacity, 4) uint32
    view array {length, prefix, buffer_index, offset} + one shared uint8
    arena (reference arrow-data/src/byte_view.rs:70-76,
    arrow-array/src/array/byte_view_array.rs:165): filter/take gather only
    the fixed-width views and share the arena, which is exactly the dense
    gather TPUs are good at.
  * Dictionary columns hold integer keys + a value column
    (reference arrow-array DictionaryArray); kernels operate on keys where
    possible (reference take.rs:935, filter.rs:588).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..config import CAPACITY_GRANULE, round_up
from . import bitmap as bm

Array = jax.Array


def _as_length(length, capacity: int) -> Array:
    if length is None:
        length = capacity
    return jnp.asarray(length, dtype=jnp.int32)


class Column:
    """Abstract base; concrete columns are the dataclasses below.

    Mirrors the reference's `Array` trait surface
    (arrow-array/src/array/mod.rs:123): len/capacity, dtype, validity,
    null_count, is_valid — in shape-static, jit-friendly form."""

    dtype: st.DataType
    validity: Optional[Array]
    length: Array

    @property
    def capacity(self) -> int:
        raise NotImplementedError

    def null_count(self) -> Array:
        """Traced scalar count of null rows in [0, length)."""
        if self.validity is None:
            return jnp.int32(0)
        live = self.validity & bm.row_mask_words(self.capacity, self.length)
        return jnp.int32(self.length) - bm.count_set_bits(live)

    def valid_bool(self) -> Array:
        """(capacity,) bool: row is valid AND not padding."""
        mask = bm.row_mask_bool(self.capacity, self.length)
        if self.validity is None:
            return mask
        return bm.unpack(self.validity) & mask

    def validity_or_full(self) -> Array:
        if self.validity is None:
            return bm.all_valid(self.capacity) & bm.row_mask_words(
                self.capacity, self.length
            )
        return self.validity

    def with_validity(self, validity: Optional[Array]) -> "Column":
        return dataclasses.replace(self, validity=validity)

    def with_length(self, length) -> "Column":
        return dataclasses.replace(self, length=_as_length(length, self.capacity))

    # -- host-side helpers (not jit-safe) ------------------------------------
    def concrete_length(self) -> int:
        return int(self.length)

    def to_pylist(self):
        raise NotImplementedError


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@partial(_register, data_fields=["values", "validity", "length"], meta_fields=["dtype"])
@dataclasses.dataclass(frozen=True)
class PrimitiveColumn(Column):
    """Fixed-width values (reference PrimitiveArray<T>,
    arrow-array/src/array/primitive_array.rs).

    Physical layout: narrow types are a (capacity,) array of the native
    dtype; 64-bit logical types (Int64/UInt64/Float64/Timestamp/...) are a
    (capacity, 2) uint32 limb array [lo, hi] — see core/wide.py."""

    values: Array  # (capacity,) native or (capacity, 2) uint32 limbs
    validity: Optional[Array]  # packed uint32 (capacity/32,) or None
    length: Array  # traced int32 scalar
    dtype: st.DataType

    @property
    def capacity(self) -> int:
        return self.values.shape[0]

    @property
    def wide(self):
        """None, or "i64"/"u64"/"f64" for limb-pair storage."""
        return st.wide_kind(self.dtype)

    def to_pylist(self):
        from . import wide as wd

        n = self.concrete_length()
        nlimb = st.decimal_limbs(self.dtype)
        if nlimb is not None:
            import decimal as _dec

            from . import limbs as lb

            ints = lb.join_ints(np.asarray(self.values)[:n])
            scale = self.dtype.scale
            with _dec.localcontext(_dec.Context(prec=80)):
                # default context (prec=28) silently rounds 38/76-digit
                # decimals; Decimal128/256 need up to 76 digits exact
                vals = [_dec.Decimal(v).scaleb(-scale) for v in ints]
            if self.validity is None:
                return vals
            valid = bm.to_numpy_bools(self.validity, n)
            return [v if ok else None for v, ok in zip(vals, valid)]
        if isinstance(self.dtype, st.FixedSizeBinary):
            w = self.dtype.byte_width
            raw = np.asarray(self.values)[:n].astype("<u4").tobytes()
            nw = self.values.shape[1]
            vals = [raw[i * nw * 4 : i * nw * 4 + w] for i in range(n)]
            if self.validity is None:
                return vals
            valid = bm.to_numpy_bools(self.validity, n)
            return [v if ok else None for v, ok in zip(vals, valid)]
        if isinstance(self.dtype, st.Interval):
            words = np.asarray(self.values)[:n]
            unit = self.dtype.unit
            if unit == "year_month":
                vals = [int(np.int32(w0)) for w0 in words[:, 0]]
            elif unit == "day_time":
                vals = [(int(np.int32(a)), int(np.int32(b)))
                        for a, b in words[:, :2]]
            else:
                nanos = words[:, 2].astype(np.uint64) | (
                    words[:, 3].astype(np.uint64) << np.uint64(32))
                vals = [(int(np.int32(m)), int(np.int32(d)),
                         int(np.int64(nv)))
                        for m, d, nv in zip(words[:, 0], words[:, 1],
                                            nanos.view(np.int64))]
            if self.validity is None:
                return vals
            valid = bm.to_numpy_bools(self.validity, n)
            return [v if ok else None for v, ok in zip(vals, valid)]
        kind = self.wide
        if kind is not None:
            npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
            vals = wd.join_numpy(np.asarray(self.values)[:n], npdt)
        else:
            vals = np.asarray(self.values)[:n]
        if self.validity is None:
            return vals.tolist()
        valid = bm.to_numpy_bools(self.validity, n)
        return [v.item() if ok else None for v, ok in zip(vals, valid)]


@partial(_register, data_fields=["values", "validity", "length"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class BooleanColumn(Column):
    """Packed boolean values (reference BooleanArray over BooleanBuffer,
    arrow-array/src/array/boolean_array.rs)."""

    values: Array  # packed uint32 (capacity/32,)
    validity: Optional[Array]
    length: Array

    dtype = st.boolean

    @property
    def capacity(self) -> int:
        return bm.capacity_of(self.values)

    def values_bool(self) -> Array:
        return bm.unpack(self.values)

    def to_pylist(self):
        n = self.concrete_length()
        vals = bm.to_numpy_bools(self.values, n)
        if self.validity is None:
            return vals.tolist()
        valid = bm.to_numpy_bools(self.validity, n)
        return [bool(v) if ok else None for v, ok in zip(vals, valid)]


@partial(
    _register,
    data_fields=["views", "arena", "validity", "length"],
    meta_fields=["dtype", "len_bound"],
)
@dataclasses.dataclass(frozen=True)
class StringViewColumn(Column):
    """Utf8/Binary with arrow-view physical layout
    (reference GenericByteViewArray, arrow-array/src/array/byte_view_array.rs;
    view word layout arrow-data/src/byte_view.rs:70-76).

    views[i] = [length, prefix (first <=4 bytes, little-endian-packed),
    buffer_index (always 0 here: single arena), offset].  Strings <= 12
    bytes are fully inline: bytes 4..12 live in the buffer_index/offset
    words, exactly as the reference's inline form.

    len_bound: static upper bound on byte length, carried as pytree
    metadata so matrix kernels (ops/strings.py) have a compile-time shape
    even under jit tracing (builders set it; movement kernels preserve
    it)."""

    views: Array  # (capacity, 4) uint32
    arena: Array  # (arena_capacity,) uint8 shared data buffer
    validity: Optional[Array]
    length: Array
    dtype: st.DataType  # Utf8 or Binary
    len_bound: Optional[int] = None

    @property
    def capacity(self) -> int:
        return self.views.shape[0]

    def str_lengths(self) -> Array:
        return self.views[:, 0].astype(jnp.int32)

    def to_pylist(self):
        n = self.concrete_length()
        views = np.asarray(self.views)[:n]
        arena = np.asarray(self.arena)
        valid = (
            bm.to_numpy_bools(self.validity, n)
            if self.validity is not None
            else np.ones(n, bool)
        )
        out = []
        is_utf8 = isinstance(self.dtype, st.Utf8)
        for i in range(n):
            if not valid[i]:
                out.append(None)
                continue
            ln = int(views[i, 0])
            if ln <= 12:
                raw = views[i, 1:].astype("<u4").tobytes()[:ln]
            else:
                off = int(views[i, 3])
                raw = arena[off : off + ln].tobytes()
            out.append(raw.decode("utf-8") if is_utf8 else raw)
        return out


@partial(
    _register,
    data_fields=["keys", "values", "value_ranks"],
    meta_fields=["dtype"],
)
@dataclasses.dataclass(frozen=True)
class DictionaryColumn(Column):
    """Dictionary-encoded column (reference DictionaryArray<K>,
    arrow-array/src/array/dictionary_array.rs).  Validity/length live on the
    keys column (like the reference, where the keys PrimitiveArray carries
    the nulls).

    value_ranks: optional (values.capacity,) int32 sort-rank of each
    dictionary value, the precomputed analogue of the reference's
    dictionary-sort `child_rank` (arrow-ord/src/sort.rs sort_dictionary,
    rank kernel arrow-ord/src/rank.rs:57).  Sorting a dict column sorts keys
    by value_ranks."""

    keys: PrimitiveColumn
    values: Column
    value_ranks: Optional[Array]
    dtype: st.Dictionary

    @property
    def capacity(self) -> int:
        return self.keys.capacity

    @property
    def validity(self):  # type: ignore[override]
        return self.keys.validity

    @property
    def length(self):  # type: ignore[override]
        return self.keys.length

    def with_validity(self, validity):
        return dataclasses.replace(self, keys=self.keys.with_validity(validity))

    def with_length(self, length):
        return dataclasses.replace(self, keys=self.keys.with_length(length))

    def to_pylist(self):
        vals = self.values.to_pylist()
        out = []
        for k in self.keys.to_pylist():
            out.append(None if k is None else vals[k])
        return out


@partial(
    _register,
    data_fields=["starts", "sizes", "child", "validity", "length"],
    meta_fields=["dtype"],
)
@dataclasses.dataclass(frozen=True)
class ListViewColumn(Column):
    """List with arrow ListView physical semantics: per-row (start, size)
    into a shared child column (reference ListViewArray,
    arrow-array/src/array/list_view_array.rs; classic offset-encoded
    List/LargeList are the reference's other list forms,
    arrow-array/src/array/list_array.rs, converted at interop).

    TPU-first rationale: exactly like string views, selection kernels
    gather only the fixed-width (start, size) pairs and share the child —
    the dense gather the VPU wants; no re-compaction of child data on
    every filter.  dtype may be st.List or st.Map (whose child is the
    2-field entry struct, reference map_array.rs:32)."""

    starts: Array  # (capacity,) int32 into child rows
    sizes: Array  # (capacity,) int32
    child: "Column"
    validity: Optional[Array]
    length: Array
    dtype: st.DataType  # st.List | st.Map

    @property
    def capacity(self) -> int:
        return self.starts.shape[0]

    def to_pylist(self):
        n = self.concrete_length()
        starts = np.asarray(self.starts)[:n]
        sizes = np.asarray(self.sizes)[:n]
        valid = (
            bm.to_numpy_bools(self.validity, n)
            if self.validity is not None
            else np.ones(n, bool)
        )
        child_vals = self.child.to_pylist()
        out = []
        is_map = isinstance(self.dtype, st.Map)
        for i in range(n):
            if not valid[i]:
                out.append(None)
                continue
            items = child_vals[starts[i] : starts[i] + sizes[i]]
            if is_map:
                out.append([(d["key"], d["value"]) for d in items])
            else:
                out.append(items)
        return out


@partial(
    _register,
    data_fields=["children", "validity", "length"],
    meta_fields=["dtype"],
)
@dataclasses.dataclass(frozen=True)
class StructColumn(Column):
    """reference StructArray (arrow-array/src/array/struct_array.rs):
    parallel children + own validity."""

    children: Tuple["Column", ...]
    validity: Optional[Array]
    length: Array
    dtype: st.Struct

    @property
    def capacity(self) -> int:
        return self.children[0].capacity if self.children else 0

    def field(self, name: str) -> "Column":
        for f, c in zip(self.dtype.fields, self.children):
            if f.name == name:
                return c
        raise st.SchemaError(f"struct has no field {name!r}")

    def to_pylist(self):
        n = self.concrete_length()
        valid = (
            bm.to_numpy_bools(self.validity, n)
            if self.validity is not None
            else np.ones(n, bool)
        )
        cols = [c.to_pylist() for c in self.children]
        names = [f.name for f in self.dtype.fields]
        return [
            dict(zip(names, vals)) if ok else None
            for ok, vals in zip(valid, zip(*cols) if cols else [()] * n)
        ]


@partial(
    _register,
    data_fields=["child", "validity", "length"],
    meta_fields=["dtype"],
)
@dataclasses.dataclass(frozen=True)
class FixedSizeListColumn(Column):
    """reference FixedSizeListArray: child holds capacity*size rows; row i's
    items are child rows [i*size, (i+1)*size)."""

    child: "Column"
    validity: Optional[Array]
    length: Array
    dtype: st.FixedSizeList

    @property
    def capacity(self) -> int:
        return self.child.capacity // self.dtype.size

    def to_pylist(self):
        n = self.concrete_length()
        size = self.dtype.size
        valid = (
            bm.to_numpy_bools(self.validity, n)
            if self.validity is not None
            else np.ones(n, bool)
        )
        child_vals = self.child.to_pylist()
        return [
            child_vals[i * size : (i + 1) * size] if valid[i] else None
            for i in range(n)
        ]


@partial(_register, data_fields=["length"], meta_fields=["_capacity"])
@dataclasses.dataclass(frozen=True)
class NullColumn(Column):
    """All-null column (reference NullArray)."""

    length: Array
    _capacity: int

    dtype = st.null
    validity = None

    @property
    def capacity(self) -> int:
        return self._capacity

    def null_count(self):
        return jnp.int32(self.length)

    def valid_bool(self):
        return jnp.zeros((self._capacity,), dtype=jnp.bool_)

    def to_pylist(self):
        return [None] * self.concrete_length()


@partial(
    _register,
    data_fields=["run_ends", "values", "length"],
    meta_fields=["dtype"],
)
@dataclasses.dataclass(frozen=True)
class RunEndColumn(Column):
    """Run-end encoded column (reference RunArray<R>,
    arrow-array/src/array/run_array.rs; RunEndBuffer semantics
    arrow-buffer/src/buffer/run.rs:97: run_ends[j] is the cumulative
    *logical* end index of physical run j; logical row i lives in the
    first run with run_ends > i — a searchsorted, the TPU-native form of
    the reference's binary-searched get_physical_index run.rs:232).

    Like the reference there is no top-level validity; nulls live on the
    values column.  Physical runs occupy rows [0, n_runs) of the padded
    run_ends/values arrays; padding run_ends are set to length so
    searchsorted never selects them."""

    run_ends: Array  # (run_capacity,) int32 cumulative logical ends
    values: "Column"  # per-run values, length = n_runs
    length: Array  # logical row count
    dtype: st.RunEndEncoded

    validity = None

    @property
    def capacity(self) -> int:
        # Logical capacity is dynamic; report run capacity for memory use.
        return self.run_ends.shape[0]

    @property
    def n_runs(self) -> Array:
        return self.values.length

    def physical_index(self, logical_idx: Array) -> Array:
        """Map logical row index -> physical run index (run.rs:232)."""
        return jnp.searchsorted(self.run_ends, logical_idx, side="right").astype(
            jnp.int32
        )

    def to_pylist(self):
        n = self.concrete_length()
        ends = np.asarray(self.run_ends)
        vals = self.values.to_pylist()
        out, run = [], 0
        for i in range(n):
            while run < len(ends) and i >= ends[run]:
                run += 1
            out.append(vals[run] if run < len(vals) else None)
        return out


@partial(
    _register,
    data_fields=["type_id_arr", "offsets", "children", "length"],
    meta_fields=["dtype"],
)
@dataclasses.dataclass(frozen=True)
class UnionColumn(Column):
    """Sparse/dense union (reference UnionArray,
    arrow-array/src/array/union_array.rs:123-126).  type_id_arr is int8
    widened to int32 for VPU-native lanes; offsets present iff dense;
    no top-level validity (like the reference — nullness lives in
    children)."""

    type_id_arr: Array  # (capacity,) int32 type codes per row
    offsets: Optional[Array]  # (capacity,) int32 iff dense, else None
    children: Tuple["Column", ...]
    length: Array
    dtype: st.Union

    validity = None

    @property
    def capacity(self) -> int:
        return self.type_id_arr.shape[0]

    @property
    def is_dense(self) -> bool:
        return self.dtype.mode == "dense"

    def child_by_type_id(self, type_id: int) -> "Column":
        return self.children[self.dtype.child_index(type_id)]

    def to_pylist(self):
        n = self.concrete_length()
        tids = np.asarray(self.type_id_arr)[:n]
        offs = (
            np.asarray(self.offsets)[:n]
            if self.offsets is not None
            else np.arange(n)
        )
        kids = [c.to_pylist() for c in self.children]
        codes = self.dtype.type_ids or tuple(range(len(self.children)))
        code_to_child = {t: i for i, t in enumerate(codes)}
        return [kids[code_to_child[int(t)]][int(o)] for t, o in zip(tids, offs)]


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------


def primitive(values, dtype: st.DataType = None, validity=None, length=None,
              capacity: int = None) -> PrimitiveColumn:
    """Build a PrimitiveColumn from a device/host array, padding to the
    capacity granule. `validity` may be packed words, a bool array, or None.

    64-bit logical types accept: a host numpy int64/uint64/float64 array
    (split exactly into limbs), or an already-split (n, 2) uint32 array."""
    from . import wide as wd

    if dtype is None:
        probe = np.asarray(values) if not isinstance(values, jax.Array) else values
        dtype = st.from_jnp(probe.dtype)

    if isinstance(dtype, st.FixedSizeBinary):
        nw = -(-dtype.byte_width // 4)
        if isinstance(values, jax.Array) or (
                isinstance(values, np.ndarray) and values.ndim == 2):
            vals = jnp.asarray(values).astype(jnp.uint32)
        else:
            n0 = len(values)
            buf = np.zeros((n0, nw * 4), np.uint8)
            for i, v in enumerate(values):
                if v is None:
                    continue
                b = bytes(v)
                if len(b) != dtype.byte_width:
                    raise st.InvalidArgumentError(
                        f"fixed_size_binary[{dtype.byte_width}]: "
                        f"value {i} has {len(b)} bytes")
                buf[i, : len(b)] = np.frombuffer(b, np.uint8)
            vals = jnp.asarray(buf.view("<u4").reshape(n0, nw))
        n = vals.shape[0]
        cap = round_up(max(n, 1) if capacity is None else capacity)
        if cap != n:
            vals = jnp.pad(vals, ((0, cap - n), (0, 0)))
        if validity is not None:
            validity = jnp.asarray(validity)
            if validity.dtype == jnp.bool_:
                if validity.shape[0] != cap:
                    validity = jnp.pad(validity, (0, cap - validity.shape[0]))
                validity = bm.pack(validity)
        return PrimitiveColumn(
            vals, validity, _as_length(n if length is None else length, cap),
            dtype)

    if isinstance(dtype, st.Interval):
        nw = dtype.n_words
        if isinstance(values, jax.Array) or (
                isinstance(values, np.ndarray) and values.ndim == 2):
            vals = jnp.asarray(values).astype(jnp.uint32)
        else:
            n0 = len(values)
            buf = np.zeros((n0, nw), np.uint32)
            for i, v in enumerate(values):
                if v is None:
                    continue
                if dtype.unit == "year_month":
                    buf[i, 0] = np.int32(v).view(np.uint32) if not isinstance(
                        v, tuple) else np.int32(v[0]).view(np.uint32)
                elif dtype.unit == "day_time":
                    d_, ms = v
                    buf[i, 0] = np.int32(d_).view(np.uint32)
                    buf[i, 1] = np.int32(ms).view(np.uint32)
                else:
                    m, d_, nanos = v
                    buf[i, 0] = np.int32(m).view(np.uint32)
                    buf[i, 1] = np.int32(d_).view(np.uint32)
                    nv = np.int64(nanos).view(np.uint64)
                    buf[i, 2] = np.uint32(nv & np.uint64(0xFFFFFFFF))
                    buf[i, 3] = np.uint32(nv >> np.uint64(32))
            vals = jnp.asarray(buf)
        n = vals.shape[0]
        cap = round_up(max(n, 1) if capacity is None else capacity)
        if cap != n:
            vals = jnp.pad(vals, ((0, cap - n), (0, 0)))
        if validity is not None:
            validity = jnp.asarray(validity)
            if validity.dtype == jnp.bool_:
                if validity.shape[0] != cap:
                    validity = jnp.pad(validity, (0, cap - validity.shape[0]))
                validity = bm.pack(validity)
        return PrimitiveColumn(
            vals, validity, _as_length(n if length is None else length, cap),
            dtype)

    nlimb = st.decimal_limbs(dtype)
    if nlimb is not None:
        from . import limbs as lb

        if isinstance(values, jax.Array):
            if values.ndim != 2 or values.shape[-1] != nlimb:
                raise st.InvalidArgumentError(
                    f"decimal column from device array must be (n, {nlimb}) "
                    "uint32 limbs")
            values = values.astype(jnp.uint32)
        else:
            arr = np.asarray(values, dtype=object) if not isinstance(
                values, np.ndarray) else values
            if arr.dtype == np.uint32 and arr.ndim == 2:
                pass  # already limbs
            else:
                # python ints / decimal.Decimal / None -> unscaled ints
                import decimal as _dec

                def unscaled(v):
                    if v is None:
                        return 0
                    if isinstance(v, _dec.Decimal):
                        # explicit 80-digit context: the default (28)
                        # silently rounds Decimal128/256 magnitudes
                        with _dec.localcontext(_dec.Context(prec=80)):
                            q = v.scaleb(dtype.scale)
                            return int(q.to_integral_value(
                                rounding=_dec.ROUND_HALF_UP))
                    return int(v)

                arr = lb.split_ints([unscaled(v) for v in np.ravel(arr)], nlimb)
            values = jnp.asarray(arr, jnp.uint32)
        n = values.shape[0]
        cap = round_up(max(n, 1) if capacity is None else capacity)
        if cap < n:
            raise st.InvalidArgumentError(f"capacity {cap} < data length {n}")
        if cap != n:
            values = jnp.pad(values, ((0, cap - n), (0, 0)))
        if validity is not None:
            validity = jnp.asarray(validity)
            if validity.dtype == jnp.bool_:
                if validity.shape[0] != cap:
                    validity = jnp.pad(validity, (0, cap - validity.shape[0]))
                validity = bm.pack(validity)
            assert validity.shape[0] == bm.num_words(cap)
        return PrimitiveColumn(
            values, validity, _as_length(n if length is None else length, cap),
            dtype)

    kind = st.wide_kind(dtype)
    if kind is not None:
        if isinstance(values, jax.Array):
            if values.ndim == 2 and values.shape[-1] == 2:
                values = values.astype(jnp.uint32)
            else:
                raise st.InvalidArgumentError(
                    "wide column from device array must be (n, 2) uint32 "
                    "limbs; split 64-bit host data with numpy first"
                )
        else:
            npdt = {"i64": np.int64, "u64": np.uint64, "f64": np.float64}[kind]
            values = jnp.asarray(wd.split_numpy(np.asarray(values).astype(npdt)))
        n = values.shape[0]
        cap = round_up(max(n, 1) if capacity is None else capacity)
        if cap < n:
            raise st.InvalidArgumentError(f"capacity {cap} < data length {n}")
        if cap != n:
            values = jnp.pad(values, ((0, cap - n), (0, 0)))
        if validity is not None:
            validity = jnp.asarray(validity)
            if validity.dtype == jnp.bool_:
                if validity.shape[0] != cap:
                    validity = jnp.pad(validity, (0, cap - validity.shape[0]))
                validity = bm.pack(validity)
            assert validity.shape[0] == bm.num_words(cap)
        return PrimitiveColumn(
            values, validity, _as_length(n if length is None else length, cap), dtype
        )

    values = jnp.asarray(values)
    jdt = dtype.to_jnp()
    values = values.astype(jdt)
    n = values.shape[0]
    cap = round_up(max(n, 1) if capacity is None else capacity)
    if cap < n:
        raise st.InvalidArgumentError(f"capacity {cap} < data length {n}")
    if cap != n:
        values = jnp.pad(values, (0, cap - n))
    if validity is not None:
        validity = jnp.asarray(validity)
        if validity.dtype == jnp.bool_:
            if validity.shape[0] != cap:
                validity = jnp.pad(validity, (0, cap - validity.shape[0]))
            validity = bm.pack(validity)
        assert validity.shape[0] == bm.num_words(cap)
    return PrimitiveColumn(values, validity, _as_length(n if length is None else length, cap), dtype)


def boolean(values, validity=None, length=None, capacity: int = None) -> BooleanColumn:
    values = jnp.asarray(values)
    if values.dtype == jnp.bool_:
        n = values.shape[0]
        cap = round_up(max(n, 1) if capacity is None else capacity)
        if cap != n:
            values = jnp.pad(values, (0, cap - n))
        words = bm.pack(values)
    else:  # already packed words
        words = values.astype(jnp.uint32)
        cap = bm.capacity_of(words)
        n = cap if length is None else length
    if validity is not None:
        validity = jnp.asarray(validity)
        if validity.dtype == jnp.bool_:
            if validity.shape[0] != cap:
                validity = jnp.pad(validity, (0, cap - validity.shape[0]))
            validity = bm.pack(validity)
    return BooleanColumn(words, validity, _as_length(n if length is None else length, cap))


def from_pylist(data, dtype: st.DataType = None) -> Column:
    """Build a column from a python list with None for nulls (host-side;
    the analogue of the reference's builders, arrow-array/src/builder/)."""
    n = len(data)
    valid = np.array([x is not None for x in data], dtype=bool)
    has_nulls = not valid.all()

    if dtype is None:
        probe = next((x for x in data if x is not None), None)
        if probe is None:
            return NullColumn(_as_length(n, round_up(max(n, 1))), round_up(max(n, 1)))
        dtype = _infer_dtype(probe)

    if isinstance(dtype, (st.List, st.Map)):
        return list_view(data, dtype)
    if isinstance(dtype, st.Struct):
        return struct_column(data, dtype)
    if isinstance(dtype, st.FixedSizeList):
        return fixed_size_list(data, dtype)
    if isinstance(dtype, st.Boolean):
        vals = np.array([bool(x) if x is not None else False for x in data], bool)
        return boolean(vals, validity=bm.from_numpy_bools(valid) if has_nulls else None)
    if isinstance(dtype, (st.Utf8, st.Binary)):
        return string_view(data, dtype=dtype)
    if isinstance(dtype, st.Dictionary):
        return dictionary_encode_host(data, dtype)
    if (st.decimal_limbs(dtype) is not None
            or isinstance(dtype, (st.FixedSizeBinary, st.Interval))):
        return primitive(
            data, dtype,
            validity=bm.from_numpy_bools(valid) if has_nulls else None,
            length=n,
        )
    jdt = dtype.to_jnp()
    vals = np.array([x if x is not None else 0 for x in data], dtype=jdt)
    return primitive(
        vals, dtype, validity=bm.from_numpy_bools(valid) if has_nulls else None
    )


def string_view(data, dtype: st.DataType = st.utf8) -> StringViewColumn:
    """Host-side view builder (reference StringViewBuilder,
    arrow-array/src/builder/generic_byte_view_builder.rs)."""
    n = len(data)
    cap = round_up(max(n, 1))
    views = np.zeros((cap, 4), dtype=np.uint32)
    valid = np.zeros(cap, dtype=bool)
    arena = bytearray()
    for i, s in enumerate(data):
        if s is None:
            continue
        valid[i] = True
        raw = s.encode("utf-8") if isinstance(s, str) else bytes(s)
        ln = len(raw)
        views[i, 0] = ln
        pref = raw[:4] + b"\0" * (4 - min(ln, 4))
        views[i, 1] = np.frombuffer(pref, dtype="<u4")[0]
        if ln <= 12:
            tail = raw[4:12] + b"\0" * (8 - max(0, ln - 4))
            views[i, 2:4] = np.frombuffer(tail[:8], dtype="<u4")
        else:
            views[i, 3] = len(arena)
            arena.extend(raw)
    arena_cap = round_up(max(len(arena), 1))
    arena_np = np.zeros(arena_cap, dtype=np.uint8)
    if arena:
        arena_np[: len(arena)] = np.frombuffer(bytes(arena), dtype=np.uint8)
    has_nulls = not valid[:n].all()
    return StringViewColumn(
        jnp.asarray(views),
        jnp.asarray(arena_np),
        bm.from_numpy_bools(valid[:n]) if has_nulls else None,
        _as_length(n, cap),
        dtype,
        len_bound=int(views[:, 0].max()) if n else 0,
    )


def dictionary_encode_host(data, dtype: st.Dictionary = None) -> DictionaryColumn:
    """Host-side dictionary interning builder (reference
    arrow-array/src/builder/generic_bytes_dictionary_builder.rs).  Also
    precomputes value sort-ranks while the values are on host (see
    DictionaryColumn.value_ranks)."""
    if dtype is None:
        dtype = st.Dictionary(st.int32, st.utf8)
    interned: dict = {}
    keys = []
    for x in data:
        if x is None:
            keys.append(0)
            continue
        if x not in interned:
            interned[x] = len(interned)
        keys.append(interned[x])
    values_list = list(interned.keys())
    valid = np.array([x is not None for x in data], dtype=bool)
    has_nulls = not valid.all()
    keys_col = primitive(
        np.asarray(keys, dtype=dtype.key.to_jnp()),
        dtype.key,
        validity=bm.from_numpy_bools(valid) if has_nulls else None,
    )
    values_col = from_pylist(values_list, dtype.value)
    # rank of each dictionary value under ascending order
    order = np.argsort(np.asarray(values_list, dtype=object), kind="stable")
    ranks = np.zeros(values_col.capacity, dtype=np.int32)
    ranks[: len(values_list)][order] = np.arange(len(values_list), dtype=np.int32)
    return DictionaryColumn(keys_col, values_col, jnp.asarray(ranks), dtype)


def null_column(n: int) -> NullColumn:
    cap = round_up(max(n, 1))
    return NullColumn(_as_length(n, cap), cap)


def list_view(data, dtype: st.DataType = None) -> ListViewColumn:
    """Host-side list builder: python lists-of-lists (None = null row).
    Map data is a list of [(k, v), ...] pairs (or dicts)."""
    n = len(data)
    cap = round_up(max(n, 1))
    starts = np.zeros(cap, dtype=np.int32)
    sizes = np.zeros(cap, dtype=np.int32)
    valid = np.zeros(cap, dtype=bool)
    flat = []
    is_map = isinstance(dtype, st.Map)
    for i, row in enumerate(data):
        if row is None:
            continue
        valid[i] = True
        starts[i] = len(flat)
        if is_map:
            items = row.items() if isinstance(row, dict) else row
            items = [{"key": k, "value": v} for k, v in items]
        else:
            items = list(row)
        sizes[i] = len(items)
        flat.extend(items)
    if dtype is None:
        probe = next((x for x in flat if x is not None), None)
        inner = _infer_dtype(probe) if probe is not None else st.int64
        dtype = st.List(inner)
    if is_map:
        child = from_pylist(flat, dtype.entry_struct)
    else:
        child = from_pylist(flat, dtype.value)
    has_nulls = not valid[:n].all()
    return ListViewColumn(
        jnp.asarray(starts),
        jnp.asarray(sizes),
        child,
        bm.from_numpy_bools(valid[:n]) if has_nulls else None,
        _as_length(n, cap),
        dtype,
    )


def struct_column(data, dtype: st.Struct = None) -> StructColumn:
    """Host-side struct builder: list of dicts (None = null row; null rows
    contribute default values to children, like the reference's builders)."""
    n = len(data)
    cap = round_up(max(n, 1))
    valid = np.array([x is not None for x in data] + [False] * (cap - n), bool)
    if dtype is None:
        probe = next((x for x in data if x is not None), {})
        dtype = st.Struct(
            tuple(
                st.Field(k, _infer_dtype(v) if v is not None else st.int64)
                for k, v in probe.items()
            )
        )
    children = []
    for f in dtype.fields:
        vals = [None if row is None else row.get(f.name) for row in data]
        children.append(from_pylist(vals, f.dtype))
    has_nulls = not valid[:n].all()
    return StructColumn(
        tuple(children),
        bm.from_numpy_bools(valid[:n]) if has_nulls else None,
        _as_length(n, cap),
        dtype,
    )


def fixed_size_list(data, dtype: st.FixedSizeList = None) -> FixedSizeListColumn:
    n = len(data)
    cap = round_up(max(n, 1))
    if dtype is None:
        probe = next((x for x in data if x is not None), None)
        inner = _infer_dtype(probe[0]) if probe else st.int64
        dtype = st.FixedSizeList(inner, len(probe) if probe else 1)
    size = dtype.size
    valid = np.array([x is not None for x in data] + [False] * (cap - n), bool)
    flat = []
    for row in data:
        if row is None:
            flat.extend([None] * size)
        else:
            if len(row) != size:
                raise st.InvalidArgumentError(
                    f"fixed_size_list: row has {len(row)} items, expected {size}"
                )
            flat.extend(row)
    flat.extend([None] * ((cap - n) * size))
    child = from_pylist(flat, dtype.value)
    has_nulls = not valid[:n].all()
    return FixedSizeListColumn(
        child,
        bm.from_numpy_bools(valid[:n]) if has_nulls else None,
        _as_length(n, cap),
        dtype,
    )


def _infer_dtype(probe) -> st.DataType:
    if isinstance(probe, bool):
        return st.boolean
    if isinstance(probe, int):
        return st.int64
    if isinstance(probe, float):
        return st.float64
    if isinstance(probe, str):
        return st.utf8
    if isinstance(probe, bytes):
        return st.binary
    if isinstance(probe, dict):
        return st.Struct(
            tuple(st.Field(k, _infer_dtype(v)) for k, v in probe.items())
        )
    if isinstance(probe, (list, tuple)):
        inner = next((x for x in probe if x is not None), None)
        return st.List(_infer_dtype(inner) if inner is not None else st.int64)
    raise st.InvalidArgumentError(f"cannot infer dtype from {type(probe)}")


def run_end_encoded(run_ends, values: Column, length=None,
                    dtype: st.RunEndEncoded = None) -> RunEndColumn:
    """Build a RunEndColumn from cumulative run ends + per-run values
    (reference RunArray::try_new, arrow-array/src/array/run_array.rs).
    run_ends must be strictly increasing and positive; the last end is the
    logical length."""
    ends = np.asarray(run_ends, dtype=np.int32)
    n_runs = ends.shape[0]
    if n_runs and (np.any(np.diff(ends) <= 0) or ends[0] <= 0):
        raise st.InvalidArgumentError(
            "run_ends must be positive and strictly increasing (run.rs:97)"
        )
    logical_n = int(ends[-1]) if n_runs else 0
    if length is None:
        length = logical_n
    cap = round_up(max(n_runs, 1))
    # pad with the logical length so searchsorted never lands on padding
    padded = np.full(cap, max(logical_n, 1), dtype=np.int32)
    padded[:n_runs] = ends
    if dtype is None:
        dtype = st.RunEndEncoded(st.int32, values.dtype)
    return RunEndColumn(jnp.asarray(padded), values, _as_length(length, cap), dtype)


def run_end_from_pylist(data, value_dtype: st.DataType = None) -> RunEndColumn:
    """Run-length compress a python list (reference RunArray::from_iter)."""
    ends, vals = [], []
    for i, x in enumerate(data):
        if vals and x == vals[-1] and not (x is None) != (vals[-1] is None):
            ends[-1] = i + 1
        else:
            vals.append(x)
            ends.append(i + 1)
    return run_end_encoded(
        np.asarray(ends, np.int32), from_pylist(vals, value_dtype)
    )


def union_column(type_id_arr, children, dtype: st.Union, offsets=None,
                 length=None) -> UnionColumn:
    """Build a UnionColumn (reference UnionArray::try_new,
    arrow-array/src/array/union_array.rs)."""
    tids = np.asarray(type_id_arr, dtype=np.int32)
    n = tids.shape[0]
    cap = round_up(max(n, 1))
    tids = np.pad(tids, (0, cap - n))
    offs = None
    if dtype.mode == "dense":
        if offsets is None:
            raise st.InvalidArgumentError("dense union requires offsets")
        offs = np.asarray(offsets, dtype=np.int32)
        offs = jnp.asarray(np.pad(offs, (0, cap - offs.shape[0])))
    elif offsets is not None:
        raise st.InvalidArgumentError("sparse union must not have offsets")
    return UnionColumn(
        jnp.asarray(tids), offs, tuple(children),
        _as_length(n if length is None else length, cap), dtype,
    )
