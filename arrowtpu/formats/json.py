"""JSON reader/writer (newline-delimited and array formats).

Capability mirror of the reference's arrow-json crate
(/root/reference/arrow-json/src/reader/mod.rs: two-phase tape decode
reader/tape.rs:298 + per-type decoders, schema inference reader/schema.rs,
push `Decoder` :446; writer/mod.rs with LineDelimited/JsonArray formats and
per-type Encoder writer/encoder.rs, StructMode).

Host-side: JSON tokenization is scalar CPU work in the reference too; the
columnar product ships straight to device columns."""

from __future__ import annotations

import dataclasses
import io
import json as _json
import math
from typing import Any, List, Optional, Sequence

from .. import schema as st
from ..core import batch as bt
from ..core import column as col


# ---------------------------------------------------------------------------
# schema inference (reference reader/schema.rs infer_json_schema)
# ---------------------------------------------------------------------------


def _unify(a: Optional[st.DataType], b: Optional[st.DataType]) -> st.DataType:
    if a is None:
        return b
    if b is None or a == b:
        return a
    ints = (st.Int,)
    if isinstance(a, st.Int) and isinstance(b, st.Float):
        return b
    if isinstance(a, st.Float) and isinstance(b, st.Int):
        return a
    if isinstance(a, st.List) and isinstance(b, st.List):
        return st.List(_unify(a.value, b.value))
    if isinstance(a, st.Struct) and isinstance(b, st.Struct):
        names = {}
        for f in a.fields + b.fields:
            if f.name in names:
                names[f.name] = st.Field(f.name, _unify(names[f.name].dtype, f.dtype))
            else:
                names[f.name] = f
        return st.Struct(tuple(names.values()))
    return st.utf8  # incompatible -> string (reference falls back similarly)


def _infer_value(v: Any) -> Optional[st.DataType]:
    if v is None:
        return None
    if isinstance(v, bool):
        return st.boolean
    if isinstance(v, int):
        return st.int64
    if isinstance(v, float):
        return st.float64
    if isinstance(v, str):
        return st.utf8
    if isinstance(v, list):
        inner = None
        for x in v:
            inner = _unify(inner, _infer_value(x))
        return st.List(inner if inner is not None else st.int64)
    if isinstance(v, dict):
        return st.Struct(
            tuple(
                st.Field(k, _infer_value(x) or st.int64) for k, x in v.items()
            )
        )
    raise st.SchemaError(f"cannot infer JSON type of {type(v)}")


def infer_json_schema(records: Sequence[dict]) -> st.Schema:
    fields: dict = {}
    order: list = []
    for rec in records:
        for k, v in rec.items():
            t = _infer_value(v)
            if k not in fields:
                fields[k] = t
                order.append(k)
            else:
                fields[k] = _unify(fields[k], t)
    return st.Schema(
        tuple(st.Field(k, fields[k] if fields[k] is not None else st.int64) for k in order)
    )


def _coerce(v, dtype: st.DataType):
    """Value-level coercion so inferred/declared schema parse agrees
    (reference per-type tape decoders)."""
    if v is None:
        return None
    if isinstance(dtype, st.Float) and isinstance(v, int):
        return float(v)
    if isinstance(dtype, st.Utf8) and not isinstance(v, str):
        return _json.dumps(v)
    if isinstance(dtype, st.List):
        return [_coerce(x, dtype.value) for x in v]
    if isinstance(dtype, st.Struct):
        return {
            f.name: _coerce(v.get(f.name), f.dtype) for f in dtype.fields
        }
    return v


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReaderBuilder:
    """reference arrow-json ReaderBuilder: schema/batch-size options."""

    schema: Optional[st.Schema] = None
    batch_size: int = 65536
    coerce_primitive: bool = True

    def build(self, source) -> "Reader":
        return Reader(self, source)


class Reader:
    def __init__(self, opts: ReaderBuilder, source):
        import os

        if isinstance(source, bytes):
            source = source.decode("utf-8")
        if isinstance(source, str) and os.path.exists(source):
            source = open(source, "r", encoding="utf-8").read()
        elif hasattr(source, "read"):
            source = source.read()
            if isinstance(source, bytes):
                source = source.decode("utf-8")
        text = source.strip()
        if text.startswith("["):  # JSON-array format
            self._records = _json.loads(text)
        else:  # newline-delimited
            self._records = [
                _json.loads(line) for line in text.splitlines() if line.strip()
            ]
        self.opts = opts
        self._schema = opts.schema or infer_json_schema(self._records)
        self._pos = 0

    @property
    def schema(self) -> st.Schema:
        return self._schema

    def __iter__(self):
        return self

    def __next__(self) -> bt.RecordBatch:
        if self._pos >= len(self._records) and self._pos > 0:
            raise StopIteration
        chunk = self._records[self._pos : self._pos + self.opts.batch_size]
        if not chunk and self._pos > 0:
            raise StopIteration
        self._pos += max(len(chunk), 1)
        cols = []
        for f in self._schema.fields:
            vals = [_coerce(rec.get(f.name), f.dtype) for rec in chunk]
            cols.append(col.from_pylist(vals, f.dtype))
        return bt.RecordBatch(self._schema, tuple(cols))


def read_json(source, **kwargs) -> bt.RecordBatch:
    from ..ops.concat import concat_batches

    reader = ReaderBuilder(**kwargs).build(source)
    batches = list(reader)
    if len(batches) == 1:
        return batches[0]
    return concat_batches(batches)


# ---------------------------------------------------------------------------
# writer (reference arrow-json/src/writer/mod.rs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class WriterBuilder:
    """LineDelimited vs JsonArray format; explicit-null control (reference
    writer/mod.rs WriterBuilder: with_explicit_nulls)."""

    format: str = "ld"  # "ld" (line-delimited) | "array"
    explicit_nulls: bool = False

    def build(self, sink) -> "Writer":
        return Writer(self, sink)


class Writer:
    def __init__(self, opts: WriterBuilder, sink):
        self.opts = opts
        self.sink = sink
        self._count = 0
        if opts.format == "array":
            self.sink.write("[")

    def write(self, batch: bt.RecordBatch):
        names = batch.schema.names
        cols = [c.to_pylist() for c in batch.columns]
        for row in zip(*cols):
            rec = {}
            for k, v in zip(names, row):
                if v is None and not self.opts.explicit_nulls:
                    continue
                rec[k] = _clean(v)
            text = _json.dumps(rec, separators=(",", ":"), ensure_ascii=False)
            if self.opts.format == "array":
                if self._count:
                    self.sink.write(",")
                self.sink.write(text)
            else:
                self.sink.write(text + "\n")
            self._count += 1

    def finish(self):
        if self.opts.format == "array":
            self.sink.write("]")


def _clean(v):
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None  # JSON has no NaN/Inf (reference encoder errors or nulls)
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, dict):
        return {k: _clean(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_clean(x) for x in v]
    return v


def write_json(batch: bt.RecordBatch, sink=None, **kwargs) -> Optional[str]:
    own = sink is None
    if own:
        sink = io.StringIO()
    w = WriterBuilder(**kwargs).build(sink)
    w.write(batch)
    w.finish()
    return sink.getvalue() if own else None
