"""Logical type system: DataType, Field, Schema, errors.

Capability mirror of the reference's arrow-schema crate
(/root/reference/arrow-schema/src/datatype.rs:96-430, field.rs, schema.rs,
error.rs:26) re-designed for a JAX engine: types are small frozen dataclasses
used as *static* (non-traced) metadata on pytree columns, so `jit` specializes
one compiled program per concrete schema — JIT specialization replaces the
reference's monomorphized generic kernels (arrow-array/src/cast.rs:361).

Physical representation notes (TPU-first, not a port):
  * fixed-width types map 1:1 onto a dense `jax.Array` of the native dtype;
  * Boolean is a packed 32-bit-word bitmap (reference packs into bytes,
    arrow-buffer/src/buffer/boolean.rs:97);
  * Utf8/Binary use arrow *view* semantics (16-byte views + shared byte
    arena, reference arrow-data/src/byte_view.rs:70) because views make
    take/filter a dense fixed-width gather — the variant TPUs want;
  * Dictionary is first-class and preferred for strings (the reference's own
    kernels take dict fast paths, e.g. arrow-select/src/take.rs:935).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


class ArrowTpuError(Exception):
    """Engine error (reference: arrow-schema/src/error.rs:26 ArrowError)."""


class InvalidArgumentError(ArrowTpuError):
    pass


class ComputeError(ArrowTpuError):
    pass


class CastError(ArrowTpuError):
    pass


class SchemaError(ArrowTpuError):
    pass


class ValidationError(ArrowTpuError):
    """Untrusted input failed value validation (reference:
    ArrayData::validate_full, arrow-data/src/data.rs:1388)."""


# ---------------------------------------------------------------------------
# DataType
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataType:
    """Base logical type.  Concrete types are the subclasses below."""

    @property
    def is_numeric(self) -> bool:
        return False

    @property
    def is_primitive(self) -> bool:
        """Fixed-width value per row (maps to one jax dtype)."""
        return False

    def to_jnp(self):
        raise SchemaError(f"{self} has no single jax dtype")


@dataclasses.dataclass(frozen=True)
class Null(DataType):
    def __str__(self):
        return "null"


@dataclasses.dataclass(frozen=True)
class Boolean(DataType):
    def __str__(self):
        return "bool"


@dataclasses.dataclass(frozen=True)
class _Primitive(DataType):
    @property
    def is_primitive(self) -> bool:
        return True


_INT_WIDTHS = (8, 16, 32, 64)


@dataclasses.dataclass(frozen=True)
class Int(_Primitive):
    bits: int = 64
    signed: bool = True

    def __post_init__(self):
        if self.bits not in _INT_WIDTHS:
            raise SchemaError(f"bad int width {self.bits}")

    @property
    def is_numeric(self):
        return True

    def to_jnp(self):
        return jnp.dtype(f"{'' if self.signed else 'u'}int{self.bits}")

    def __str__(self):
        return f"{'' if self.signed else 'u'}int{self.bits}"


@dataclasses.dataclass(frozen=True)
class Float(_Primitive):
    bits: int = 64

    def __post_init__(self):
        if self.bits not in (16, 32, 64):
            raise SchemaError(f"bad float width {self.bits}")

    @property
    def is_numeric(self):
        return True

    def to_jnp(self):
        return jnp.dtype(f"float{self.bits}")

    def __str__(self):
        return f"float{self.bits}"


# Temporal types: stored as Int64/Int32 with logical unit metadata
# (reference arrow-schema/src/datatype.rs Timestamp/Date/Time/Duration).
@dataclasses.dataclass(frozen=True)
class Timestamp(_Primitive):
    unit: str = "us"  # s | ms | us | ns
    tz: Optional[str] = None

    def to_jnp(self):
        return jnp.dtype("int64")

    def __str__(self):
        return f"timestamp[{self.unit}{',' + self.tz if self.tz else ''}]"


@dataclasses.dataclass(frozen=True)
class Date32(_Primitive):
    def to_jnp(self):
        return jnp.dtype("int32")

    def __str__(self):
        return "date32"


@dataclasses.dataclass(frozen=True)
class Date64(_Primitive):
    def to_jnp(self):
        return jnp.dtype("int64")

    def __str__(self):
        return "date64"


@dataclasses.dataclass(frozen=True)
class Time32(_Primitive):
    unit: str = "ms"

    def to_jnp(self):
        return jnp.dtype("int32")

    def __str__(self):
        return f"time32[{self.unit}]"


@dataclasses.dataclass(frozen=True)
class Time64(_Primitive):
    unit: str = "us"

    def to_jnp(self):
        return jnp.dtype("int64")

    def __str__(self):
        return f"time64[{self.unit}]"


@dataclasses.dataclass(frozen=True)
class Duration(_Primitive):
    unit: str = "us"

    def to_jnp(self):
        return jnp.dtype("int64")

    def __str__(self):
        return f"duration[{self.unit}]"


@dataclasses.dataclass(frozen=True)
class Decimal32(DataType):
    """32-bit decimal (reference Decimal32Type, arrow-schema datatype.rs).
    Physically one uint32 limb (capacity, 1)."""

    precision: int = 9
    scale: int = 2

    @property
    def is_numeric(self):
        return True

    def __str__(self):
        return f"decimal32({self.precision},{self.scale})"


@dataclasses.dataclass(frozen=True)
class Decimal64(DataType):
    """64-bit decimal (reference Decimal64Type). Two uint32 limbs."""

    precision: int = 18
    scale: int = 4

    @property
    def is_numeric(self):
        return True

    def __str__(self):
        return f"decimal64({self.precision},{self.scale})"


@dataclasses.dataclass(frozen=True)
class Decimal128(DataType):
    """128-bit decimal, physically two int64 limbs (TPUs have no i128;
    reference uses native i128, arrow-buffer/src/bigint)."""

    precision: int = 38
    scale: int = 10

    @property
    def is_numeric(self):
        return True

    def __str__(self):
        return f"decimal128({self.precision},{self.scale})"


@dataclasses.dataclass(frozen=True)
class Decimal256(DataType):
    """256-bit decimal (reference i256, arrow-buffer/src/bigint/mod.rs:63).
    Physically eight uint32 limbs little-endian (capacity, 8) — the TPU has
    no wide ints, so arithmetic is explicit carry math on u32 lanes
    (core/wide.py i256 helpers)."""

    precision: int = 76
    scale: int = 10

    @property
    def is_numeric(self):
        return True

    def __str__(self):
        return f"decimal256({self.precision},{self.scale})"


@dataclasses.dataclass(frozen=True)
class Interval(DataType):
    """Calendar interval (reference arrow-buffer/src/interval.rs;
    DataType::Interval datatype.rs).  unit: "year_month" (1×i32),
    "day_time" (2×i32 [days, ms]), "month_day_nano" (i32 months, i32 days,
    i64 nanos — stored as 4×u32 [months, days, nano_lo, nano_hi])."""

    unit: str = "month_day_nano"

    def __post_init__(self):
        if self.unit not in ("year_month", "day_time", "month_day_nano"):
            raise SchemaError(f"bad interval unit {self.unit!r}")

    @property
    def n_words(self) -> int:
        return {"year_month": 1, "day_time": 2, "month_day_nano": 4}[self.unit]

    def __str__(self):
        return f"interval[{self.unit}]"


@dataclasses.dataclass(frozen=True)
class Utf8(DataType):
    """String with view representation (reference Utf8View,
    arrow-schema/src/datatype.rs + arrow-data/src/byte_view.rs:70)."""

    def __str__(self):
        return "utf8"


@dataclasses.dataclass(frozen=True)
class Binary(DataType):
    def __str__(self):
        return "binary"


@dataclasses.dataclass(frozen=True)
class FixedSizeBinary(DataType):
    byte_width: int = 16

    def __str__(self):
        return f"fixed_size_binary[{self.byte_width}]"


@dataclasses.dataclass(frozen=True)
class Dictionary(DataType):
    """Dictionary-encoded column: integer keys into a value column
    (reference arrow-array DictionaryArray)."""

    key: DataType = dataclasses.field(default_factory=lambda: Int(32))
    value: DataType = dataclasses.field(default_factory=Utf8)

    def __str__(self):
        return f"dictionary<{self.key},{self.value}>"


@dataclasses.dataclass(frozen=True)
class List(DataType):
    """Variable-length list.  Physical representation is arrow *ListView*
    semantics ((start, size) pairs into a shared child — reference
    arrow-array/src/array/list_view_array.rs) because that keeps take/filter
    a fixed-width gather; offset-encoded List/LargeList convert at the
    interop boundary."""

    value: DataType = dataclasses.field(default_factory=lambda: Int(64))

    def __str__(self):
        return f"list<{self.value}>"


@dataclasses.dataclass(frozen=True)
class FixedSizeList(DataType):
    """reference arrow-array/src/array/fixed_size_list_array.rs."""

    value: DataType = dataclasses.field(default_factory=lambda: Int(64))
    size: int = 1

    def __str__(self):
        return f"fixed_size_list<{self.value}>[{self.size}]"


@dataclasses.dataclass(frozen=True)
class Map(DataType):
    """reference arrow-array/src/array/map_array.rs:32-63: a List whose
    items are a 2-column struct (key non-null)."""

    key: DataType = dataclasses.field(default_factory=Utf8)
    item: DataType = dataclasses.field(default_factory=lambda: Int(64))

    @property
    def entry_struct(self) -> "Struct":
        return Struct((Field("key", self.key, False), Field("value", self.item)))

    def __str__(self):
        return f"map<{self.key},{self.item}>"


@dataclasses.dataclass(frozen=True)
class Struct(DataType):
    fields: Tuple["Field", ...] = ()

    def __str__(self):
        return "struct<" + ", ".join(f"{f.name}:{f.dtype}" for f in self.fields) + ">"


@dataclasses.dataclass(frozen=True)
class Union(DataType):
    """Sparse or dense union (reference UnionArray,
    arrow-array/src/array/union_array.rs:123-126: type_ids ScalarBuffer<i8>,
    offsets iff dense, children; no top-level validity)."""

    fields: Tuple["Field", ...] = ()
    type_ids: Tuple[int, ...] = ()  # type code per child, parallel to fields
    mode: str = "sparse"  # "sparse" | "dense"

    def __post_init__(self):
        if self.mode not in ("sparse", "dense"):
            raise SchemaError(f"bad union mode {self.mode!r}")
        if self.type_ids and len(self.type_ids) != len(self.fields):
            raise SchemaError("union: type_ids must parallel fields")

    def child_index(self, type_id: int) -> int:
        ids = self.type_ids or tuple(range(len(self.fields)))
        for i, t in enumerate(ids):
            if t == type_id:
                return i
        raise SchemaError(f"union has no child with type_id {type_id}")

    def __str__(self):
        inner = ", ".join(f"{f.name}:{f.dtype}" for f in self.fields)
        return f"union[{self.mode}]<{inner}>"


@dataclasses.dataclass(frozen=True)
class RunEndEncoded(DataType):
    """Run-end encoded column (reference RunArray<R>,
    arrow-array/src/array/run_array.rs; RunEndBuffer
    arrow-buffer/src/buffer/run.rs:97: run_ends are cumulative logical end
    indices)."""

    run_end: DataType = dataclasses.field(default_factory=lambda: Int(32))
    value: DataType = dataclasses.field(default_factory=lambda: Int(64))

    def __str__(self):
        return f"run_end_encoded<{self.run_end},{self.value}>"


# Convenience constructors (mirror arrow's DataType::Int8..)
null = Null()
boolean = Boolean()
int8 = Int(8)
int16 = Int(16)
int32 = Int(32)
int64 = Int(64)
uint8 = Int(8, signed=False)
uint16 = Int(16, signed=False)
uint32 = Int(32, signed=False)
uint64 = Int(64, signed=False)
float16 = Float(16)
float32 = Float(32)
float64 = Float(64)
utf8 = Utf8()
binary = Binary()


def wide_kind(dtype: DataType):
    """Physical-width classifier: 64-bit logical types store as
    (capacity, 2) uint32 limb pairs (see core/wide.py for why — this TPU
    moves u32 at ~4.7x the bandwidth of emulated s64 and cannot bitcast
    64-bit types).  Returns "i64" | "u64" | "f64" | None (native)."""
    if isinstance(dtype, Int) and dtype.bits == 64:
        return "i64" if dtype.signed else "u64"
    if isinstance(dtype, Float) and dtype.bits == 64:
        return "f64"
    if isinstance(dtype, (Timestamp, Date64, Time64, Duration)):
        return "i64"
    return None


def decimal_limbs(dtype: DataType):
    """Number of u32 limbs for a decimal dtype, else None.  Decimal columns
    store (capacity, n_limbs) little-endian uint32 two's-complement limbs
    (core/limbs.py; reference native i128 / software i256,
    arrow-buffer/src/bigint/mod.rs:63)."""
    if isinstance(dtype, Decimal32):
        return 1
    if isinstance(dtype, Decimal64):
        return 2
    if isinstance(dtype, Decimal128):
        return 4
    if isinstance(dtype, Decimal256):
        return 8
    return None


def decimal_for_limbs(n: int, precision: int, scale: int) -> DataType:
    return {1: Decimal32, 2: Decimal64, 4: Decimal128, 8: Decimal256}[n](
        precision, scale)


# max decimal digits representable per width (reference
# arrow-schema DECIMAL128_MAX_PRECISION etc.)
MAX_DECIMAL_PRECISION = {1: 9, 2: 18, 4: 38, 8: 76}


def from_jnp(dt) -> DataType:
    dt = jnp.dtype(dt)
    if dt.kind == "b":
        return boolean
    if dt.kind == "i":
        return Int(dt.itemsize * 8)
    if dt.kind == "u":
        return Int(dt.itemsize * 8, signed=False)
    if dt.kind == "f":
        return Float(dt.itemsize * 8)
    raise SchemaError(f"no arrow type for jax dtype {dt}")


# ---------------------------------------------------------------------------
# Field / Schema
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Field:
    """reference: arrow-schema/src/field.rs."""

    name: str
    dtype: DataType
    nullable: bool = True
    metadata: Tuple[Tuple[str, str], ...] = ()

    def with_name(self, name: str) -> "Field":
        return dataclasses.replace(self, name=name)


@dataclasses.dataclass(frozen=True)
class Schema:
    """reference: arrow-schema/src/schema.rs."""

    fields: Tuple[Field, ...]
    metadata: Tuple[Tuple[str, str], ...] = ()

    def __post_init__(self):
        names = [f.name for f in self.fields]
        if len(set(names)) != len(names):
            raise SchemaError(f"duplicate field names in schema: {names}")

    @property
    def names(self):
        return [f.name for f in self.fields]

    def field(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise SchemaError(f"no field named {name!r}")

    def index_of(self, name: str) -> int:
        for i, f in enumerate(self.fields):
            if f.name == name:
                return i
        raise SchemaError(f"no field named {name!r}")

    def project(self, names) -> "Schema":
        return Schema(tuple(self.field(n) for n in names), self.metadata)

    def __len__(self):
        return len(self.fields)


def schema(pairs, metadata=()) -> Schema:
    """schema([("a", int64), ("b", float32)])"""
    return Schema(
        tuple(p if isinstance(p, Field) else Field(p[0], p[1]) for p in pairs),
        tuple(metadata),
    )
