"""CSV reader/writer.

Capability mirror of the reference's arrow-csv crate
(/root/reference/arrow-csv/src/reader/mod.rs: schema inference :360 with
regex-based type detection :461, push-based `Decoder` :611, `ReaderBuilder`
:1152; writer.rs:1-1433 with format options).

Host-side by design: CSV framing/parse has no vector structure for the TPU
(the reference's hot loop is a byte scanner on CPU too); the columnar
conversion lands directly in device-resident columns, so a scan pipeline
parses on host and ships batches to HBM — the reference's bulk
read-records-then-columnarize shape (reader/mod.rs bulk decode)."""

from __future__ import annotations

import csv as _csv
import dataclasses
import io
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import schema as st
from ..core import batch as bt
from ..core import column as col

# Inference regexes (reference reader/mod.rs:461 REGEX_SET: boolean, integer,
# decimal/float, date, timestamp — first match in specificity order wins)
_BOOL_RE = re.compile(r"^(true|false)$", re.IGNORECASE)
_INT_RE = re.compile(r"^-?(\d+)$")
_FLOAT_RE = re.compile(r"^-?(\d+)(\.\d+)?([eE][-+]?\d+)?$|^-?\.\d+([eE][-+]?\d+)?$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$")


def infer_field_type(values: Sequence[str]) -> st.DataType:
    """Widest type that parses every non-empty sample (reference
    infer_field_schema, reader/mod.rs:461)."""
    seen = set()
    for v in values:
        if v == "":
            continue
        if _BOOL_RE.match(v):
            seen.add("bool")
        elif _INT_RE.match(v):
            seen.add("int")
        elif _FLOAT_RE.match(v):
            seen.add("float")
        elif _TS_RE.match(v):
            seen.add("timestamp")
        elif _DATE_RE.match(v):
            seen.add("date")
        else:
            seen.add("utf8")
    if not seen or "utf8" in seen:
        return st.utf8 if seen else st.utf8
    if seen == {"bool"}:
        return st.boolean
    if seen <= {"int"}:
        return st.int64
    if seen <= {"int", "float"}:
        return st.float64
    if seen <= {"date"}:
        return st.Date32()
    if seen <= {"date", "timestamp"}:
        return st.Timestamp("us")
    return st.utf8


def infer_schema(rows: List[List[str]], headers: List[str]) -> st.Schema:
    cols = list(zip(*rows)) if rows else [[] for _ in headers]
    return st.Schema(
        tuple(
            st.Field(h, infer_field_type(list(vals)))
            for h, vals in zip(headers, cols)
        )
    )


def _parse_column(values: List[str], dtype: st.DataType) -> col.Column:
    """Typed per-column parser (reference reader/mod.rs per-type build_
    primitive_array via lexical/chrono)."""
    null = [v == "" for v in values]
    if isinstance(dtype, st.Boolean):
        data = [None if n else v.lower() in ("true", "t", "1") for v, n in zip(values, null)]
        return col.from_pylist(data, dtype)
    if isinstance(dtype, (st.Utf8, st.Binary)):
        data = [None if n else v for v, n in zip(values, null)]
        return col.from_pylist(data, dtype)
    if isinstance(dtype, st.Dictionary):
        data = [None if n else v for v, n in zip(values, null)]
        return col.dictionary_encode_host(data, dtype)
    from ..ops.cast import _parse_one

    data = [None if n else _parse_one(v, dtype) for v, n in zip(values, null)]
    return col.from_pylist(data, dtype)


@dataclasses.dataclass
class ReaderBuilder:
    """reference ReaderBuilder (reader/mod.rs:1152): builder-pattern options."""

    schema: Optional[st.Schema] = None
    has_header: bool = True
    delimiter: str = ","
    quote: str = '"'
    escape: Optional[str] = None
    batch_size: int = 65536
    max_records_for_inference: int = 1000
    projection: Optional[Sequence[str]] = None

    def build(self, source) -> "Reader":
        return Reader(self, source)


class Reader:
    """Iterator of RecordBatch (reference BufReader, reader/mod.rs)."""

    def __init__(self, opts: ReaderBuilder, source):
        import os

        if isinstance(source, bytes):
            source = io.StringIO(source.decode("utf-8"))
        elif isinstance(source, str):
            # a path if it exists on disk, else inline CSV text
            source = (
                open(source, "r", encoding="utf-8")
                if os.path.exists(source)
                else io.StringIO(source)
            )
        elif isinstance(source, io.BufferedIOBase) or (
            hasattr(source, "mode") and "b" in getattr(source, "mode", "")
        ):
            source = io.TextIOWrapper(source, encoding="utf-8")
        self._rows = _csv.reader(
            source,
            delimiter=opts.delimiter,
            quotechar=opts.quote,
            escapechar=opts.escape,
        )
        self.opts = opts
        self._headers = None
        self._pending: List[List[str]] = []
        self._schema = opts.schema
        self._init()

    def _init(self):
        rows = self._rows
        if self.opts.has_header:
            try:
                self._headers = next(rows)
            except StopIteration:
                self._headers = []
        if self._schema is None:
            sample = []
            for row in rows:
                sample.append(row)
                if len(sample) >= self.opts.max_records_for_inference:
                    break
            if self._headers is None:
                width = len(sample[0]) if sample else 0
                self._headers = [f"column_{i + 1}" for i in range(width)]
            self._schema = infer_schema(sample, self._headers)
            self._pending = sample
        elif self._headers is None:
            self._headers = self._schema.names

    @property
    def schema(self) -> st.Schema:
        return self._schema

    def __iter__(self):
        return self

    def __next__(self) -> bt.RecordBatch:
        rows = self._pending[: self.opts.batch_size]
        self._pending = self._pending[self.opts.batch_size :]
        while len(rows) < self.opts.batch_size:
            try:
                rows.append(next(self._rows))
            except StopIteration:
                break
        if not rows:
            raise StopIteration
        names = self._schema.names
        columns = {}
        for i, f in enumerate(self._schema.fields):
            vals = [r[i] if i < len(r) else "" for r in rows]
            columns[f.name] = _parse_column(vals, f.dtype)
        batch = bt.RecordBatch(self._schema, tuple(columns[n] for n in names))
        if self.opts.projection:
            batch = batch.project(list(self.opts.projection))
        return batch


def read_csv(source, **kwargs) -> bt.RecordBatch:
    """One-shot read into a single batch (concat of reader batches)."""
    from ..ops.concat import concat_batches

    reader = ReaderBuilder(**kwargs).build(source)
    batches = list(reader)
    if not batches:
        return bt.RecordBatch(reader.schema, tuple())
    if len(batches) == 1:
        return batches[0]
    return concat_batches(batches)


# ---------------------------------------------------------------------------
# writer (reference arrow-csv/src/writer.rs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class WriterBuilder:
    """reference WriterBuilder (writer.rs): delimiter/header/null options."""

    delimiter: str = ","
    has_header: bool = True
    null_value: str = ""
    timestamp_format: Optional[str] = None

    def build(self, sink) -> "Writer":
        return Writer(self, sink)


class Writer:
    def __init__(self, opts: WriterBuilder, sink):
        self.opts = opts
        self.sink = sink
        self._wrote_header = False

    def write(self, batch: bt.RecordBatch):
        w = _csv.writer(self.sink, delimiter=self.opts.delimiter, lineterminator="\n")
        if self.opts.has_header and not self._wrote_header:
            w.writerow(batch.schema.names)
            self._wrote_header = True
        cols = [self._format_column(c) for c in batch.columns]
        for row in zip(*cols):
            w.writerow(row)

    def _format_column(self, c: col.Column) -> List[str]:
        vals = c.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(self.opts.null_value)
            elif isinstance(v, bool):
                out.append("true" if v else "false")
            elif isinstance(v, float):
                out.append(repr(v))
            else:
                out.append(str(v))
        return out


def write_csv(batch: bt.RecordBatch, sink=None, **kwargs) -> Optional[str]:
    """One-shot write; returns the CSV text if sink is None."""
    own = sink is None
    if own:
        sink = io.StringIO()
    WriterBuilder(**kwargs).build(sink).write(batch)
    return sink.getvalue() if own else None
