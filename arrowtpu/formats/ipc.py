"""Arrow IPC stream + file format, implemented from the spec.

Capability mirror of the reference's arrow-ipc crate:
  * framing: encapsulated message = 0xFFFFFFFF continuation + i32 metadata
    length + flatbuffer + 8-aligned body (arrow-ipc/src/lib.rs:73,
    writer.rs:151-152); stream ends with an explicit EOS marker
    (writer.rs:1733);
  * file format: ARROW1 magic + stream + Footer flatbuffer + i32 footer
    length + magic (writer.rs FileWriter :1593, reader.rs FileReader :1339);
  * dictionaries are sent as separate DictionaryBatch messages before the
    first RecordBatch (DictionaryTracker, writer.rs:1362);
  * metadata uses our own hand-rolled flatbuffers (formats/flatbuf.py)
    against the Arrow format/*.fbs schema — type-union ordinals match the
    reference's generated code (gen/Schema.rs:796-823).

Byte-for-byte interchange with other Arrow implementations is validated in
tests by round-tripping against pyarrow in both directions."""

from __future__ import annotations

import io
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import schema as st
from ..core import batch as bt
from ..core import column as col
from . import flatbuf as fb
from .layout import Node, column_to_layout, layout_to_column

CONTINUATION = 0xFFFFFFFF
MAGIC = b"ARROW1"

# Type union ordinals (reference gen/Schema.rs:796)
T_NULL, T_INT, T_FLOAT, T_BINARY, T_UTF8, T_BOOL = 1, 2, 3, 4, 5, 6
T_DECIMAL, T_DATE, T_TIME, T_TIMESTAMP = 7, 8, 9, 10
T_LIST, T_STRUCT, T_UNION, T_FSB, T_FSL, T_MAP, T_DURATION = (
    12, 13, 14, 15, 16, 17, 18)
T_LARGEBIN, T_LARGEUTF8, T_LARGELIST = 19, 20, 21
# Message header union (gen/Message.rs): Schema=1, DictionaryBatch=2, RecordBatch=3
H_SCHEMA, H_DICT, H_BATCH = 1, 2, 3

_TIME_UNITS = ("s", "ms", "us", "ns")  # gen/Schema.rs TimeUnit


# ---------------------------------------------------------------------------
# schema flatbuffer
# ---------------------------------------------------------------------------


def _write_type(b: fb.Builder, dt: st.DataType) -> Tuple[int, int]:
    """Returns (type_type, type_offset)."""
    if isinstance(dt, st.Null):
        b.start_table()
        return T_NULL, b.end_table()
    if isinstance(dt, st.Boolean):
        b.start_table()
        return T_BOOL, b.end_table()
    if isinstance(dt, st.Int):
        b.start_table()
        b.slot_scalar(0, "i", dt.bits, 0)
        b.slot_scalar(1, "?", dt.signed, False)
        return T_INT, b.end_table()
    if isinstance(dt, st.Float):
        b.start_table()
        b.slot_scalar(0, "h", {16: 0, 32: 1, 64: 2}[dt.bits], 0)
        return T_FLOAT, b.end_table()
    if isinstance(dt, st.Utf8):
        b.start_table()
        return T_UTF8, b.end_table()
    if isinstance(dt, st.Binary):
        b.start_table()
        return T_BINARY, b.end_table()
    if isinstance(dt, st.Timestamp):
        tz = b.string(dt.tz) if dt.tz else None
        b.start_table()
        b.slot_scalar(0, "h", _TIME_UNITS.index(dt.unit), 0)
        b.slot_offset(1, tz)
        return T_TIMESTAMP, b.end_table()
    if isinstance(dt, st.Date32):
        b.start_table()
        b.slot_scalar(0, "h", 0, -1)  # DAY
        return T_DATE, b.end_table()
    if isinstance(dt, st.Date64):
        b.start_table()
        b.slot_scalar(0, "h", 1, -1)  # MILLISECOND
        return T_DATE, b.end_table()
    if isinstance(dt, (st.Time32, st.Time64)):
        bits = 32 if isinstance(dt, st.Time32) else 64
        b.start_table()
        b.slot_scalar(0, "h", _TIME_UNITS.index(dt.unit), 0)
        b.slot_scalar(1, "i", bits, 32)
        return T_TIME, b.end_table()
    if isinstance(dt, st.Duration):
        b.start_table()
        b.slot_scalar(0, "h", _TIME_UNITS.index(dt.unit), 0)
        return T_DURATION, b.end_table()
    if isinstance(dt, st.List):
        b.start_table()
        return T_LIST, b.end_table()
    if isinstance(dt, st.Struct):
        b.start_table()
        return T_STRUCT, b.end_table()
    if isinstance(dt, st.FixedSizeList):
        b.start_table()
        b.slot_scalar(0, "i", dt.size, 0)
        return T_FSL, b.end_table()
    if isinstance(dt, st.Map):
        b.start_table()
        return T_MAP, b.end_table()
    if isinstance(dt, st.Union):
        import struct as _s

        ids = dt.type_ids or tuple(range(len(dt.fields)))
        packed = b"".join(_s.pack("<i", t) for t in ids)
        idvec = b.vector_of_structs(packed, len(ids), align=4)
        b.start_table()
        b.slot_scalar(0, "h", 0 if dt.mode == "sparse" else 1, 0)
        b.slot_offset(1, idvec)
        return T_UNION, b.end_table()
    if isinstance(dt, st.Dictionary):
        return _write_type(b, dt.value)  # field type is the VALUE type
    nl = st.decimal_limbs(dt)
    if nl is not None:
        b.start_table()
        b.slot_scalar(0, "i", dt.precision, 0)
        b.slot_scalar(1, "i", dt.scale, 0)
        b.slot_scalar(2, "i", nl * 32, 128)  # bitWidth
        return T_DECIMAL, b.end_table()
    raise st.SchemaError(f"IPC: unsupported type {dt}")


def _write_field(b: fb.Builder, field: st.Field, dict_ids: Dict[str, int], path: str) -> int:
    dt = field.dtype
    children: List[int] = []
    if isinstance(dt, st.List):
        children = [_write_field(b, st.Field("item", dt.value), dict_ids, path + ".item")]
    elif isinstance(dt, st.FixedSizeList):
        children = [_write_field(b, st.Field("item", dt.value), dict_ids, path + ".item")]
    elif isinstance(dt, st.Map):
        entries = st.Field("entries", dt.entry_struct, False)
        children = [_write_field(b, entries, dict_ids, path + ".entries")]
    elif isinstance(dt, st.Struct):
        children = [
            _write_field(b, f, dict_ids, path + "." + f.name) for f in dt.fields
        ]
    elif isinstance(dt, st.Union):
        children = [
            _write_field(b, f, dict_ids, path + "." + f.name) for f in dt.fields
        ]
    dictionary = None
    if isinstance(dt, st.Dictionary):
        did = dict_ids.setdefault(path, len(dict_ids))
        b.start_table()
        b.slot_scalar(0, "i", dt.key.bits, 0)
        b.slot_scalar(1, "?", dt.key.signed, False)
        index_type = b.end_table()
        b.start_table()
        b.slot_scalar(0, "q", did, 0)
        b.slot_offset(1, index_type)
        dictionary = b.end_table()
        if isinstance(dt.value, st.List):  # children follow the value type
            children = [_write_field(b, st.Field("item", dt.value.value), dict_ids, path + ".item")]
    name_off = b.string(field.name)
    type_type, type_off = _write_type(b, dt)
    child_vec = b.vector_of_offsets(children) if children else None
    b.start_table()
    b.slot_offset(0, name_off)
    b.slot_scalar(1, "?", field.nullable, False)
    b.slot_scalar(2, "B", type_type, 0)
    b.slot_offset(3, type_off)
    b.slot_offset(4, dictionary)
    b.slot_offset(5, child_vec)
    return b.end_table()


def _write_schema_fb(b: fb.Builder, schema: st.Schema, dict_ids: Dict[str, int]) -> int:
    fields = [
        _write_field(b, f, dict_ids, f.name) for f in schema.fields
    ]
    fvec = b.vector_of_offsets(fields)
    b.start_table()
    b.slot_scalar(0, "h", 0, 0)  # endianness: little
    b.slot_offset(1, fvec)
    return b.end_table()


def _read_type(f: fb.Table) -> st.DataType:
    tt = f.scalar(2, "B", 0)
    t = f.table(3)
    if tt == T_NULL:
        return st.null
    if tt == T_BOOL:
        return st.boolean
    if tt == T_INT:
        return st.Int(t.scalar(0, "i", 0), bool(t.scalar(1, "B", 0)))
    if tt == T_FLOAT:
        return {0: st.float16, 1: st.float32, 2: st.float64}[t.scalar(0, "h", 0)]
    if tt == T_UTF8 or tt == T_LARGEUTF8:
        return st.utf8
    if tt == T_BINARY or tt == T_LARGEBIN:
        return st.binary
    if tt == T_TIMESTAMP:
        return st.Timestamp(_TIME_UNITS[t.scalar(0, "h", 0)], t.string(1))
    if tt == T_DATE:
        return st.Date32() if t.scalar(0, "h", 0) == 0 else st.Date64()
    if tt == T_TIME:
        unit = _TIME_UNITS[t.scalar(0, "h", 0)]
        return st.Time32(unit) if t.scalar(1, "i", 32) == 32 else st.Time64(unit)
    if tt == T_DURATION:
        return st.Duration(_TIME_UNITS[t.scalar(0, "h", 0)])
    if tt in (T_LIST, T_LARGELIST):
        child = _read_field(f.vector_tables(5)[0])
        return st.List(child.dtype)
    if tt == T_STRUCT:
        return st.Struct(tuple(_read_field(cf) for cf in f.vector_tables(5)))
    if tt == T_UNION:
        fields = tuple(_read_field(cf) for cf in f.vector_tables(5))
        ids = tuple(t.vector_scalars(1, "i")) or tuple(range(len(fields)))
        mode = "sparse" if t.scalar(0, "h", 0) == 0 else "dense"
        return st.Union(fields, ids, mode)
    if tt == T_FSL:
        child = _read_field(f.vector_tables(5)[0])
        return st.FixedSizeList(child.dtype, t.scalar(0, "i", 0))
    if tt == T_MAP:
        entries = _read_field(f.vector_tables(5)[0])
        kd = entries.dtype.fields[0].dtype
        vd = entries.dtype.fields[1].dtype
        return st.Map(kd, vd)
    if tt == T_DECIMAL:
        bits = t.scalar(2, "i", 128)
        return st.decimal_for_limbs(
            bits // 32, t.scalar(0, "i", 38), t.scalar(1, "i", 0))
    raise st.SchemaError(f"IPC: unsupported type id {tt}")


def _read_field(f: fb.Table) -> st.Field:
    name = f.string(0) or ""
    nullable = bool(f.scalar(1, "B", 0))
    dt = _read_type(f)
    d = f.table(4)  # DictionaryEncoding
    if d is not None:
        idx = d.table(1)
        key = st.Int(idx.scalar(0, "i", 32), bool(idx.scalar(1, "B", 1))) if idx else st.int32
        dt = st.Dictionary(key, dt)
    return st.Field(name, dt, nullable)


def _read_schema_fb(t: fb.Table) -> st.Schema:
    return st.Schema(tuple(_read_field(f) for f in t.vector_tables(1)))


# ---------------------------------------------------------------------------
# message framing
# ---------------------------------------------------------------------------


def build_message_meta(header_type: int, build_header, body_len: int) -> bytes:
    """The Message flatbuffer alone (8-padded, unframed) — the form Flight
    ships in FlightData.data_header (reference arrow-flight encode.rs)."""
    b = fb.Builder()
    header = build_header(b)
    b.start_table()
    b.slot_scalar(0, "h", 4, 0)  # MetadataVersion V5
    b.slot_scalar(1, "B", header_type, 0)
    b.slot_offset(2, header)
    b.slot_scalar(3, "q", body_len, 0)
    msg = b.finish(b.end_table())
    return msg + b"\0" * ((-len(msg)) % 8)


def _message_bytes(header_type: int, build_header, body: bytes) -> bytes:
    meta = build_message_meta(header_type, build_header, len(body))
    return struct.pack("<Ii", CONTINUATION, len(meta)) + meta + body


def _batch_body_and_header(node_list: List[Node], compression: str = None):
    """Flatten nodes preorder -> (nodes, buffers, body bytes).

    compression="zstd": each buffer is framed as an 8-byte LE uncompressed
    length + zstd bytes; -1 length means the raw bytes follow verbatim
    (reference arrow-ipc/src/compression.rs:142 CompressionCodec)."""
    field_nodes: List[Tuple[int, int]] = []
    buffers: List[Tuple[int, int]] = []
    chunks: List[bytes] = []
    pos = 0

    def frame(raw: bytes) -> bytes:
        if compression is None or len(raw) == 0:
            return raw
        if compression == "lz4":
            from . import lz4

            comp = lz4.compress(raw)
        else:
            import zstandard

            comp = zstandard.ZstdCompressor().compress(raw)
        if len(comp) >= len(raw):
            return struct.pack("<q", -1) + raw
        return struct.pack("<q", len(raw)) + comp

    def walk(n: Node):
        nonlocal pos
        field_nodes.append((n.length, n.null_count))
        for buf in n.buffers:
            raw = frame(buf.tobytes())
            buffers.append((pos, len(raw)))
            pad = (-len(raw)) % 8
            chunks.append(raw + b"\0" * pad)
            pos += len(raw) + pad
        for ch in n.children:
            walk(ch)

    for n in node_list:
        walk(n)
    return field_nodes, buffers, b"".join(chunks)


_COMPRESSION_CODECS = {"lz4": 0, "zstd": 1}  # Schema.fbs CompressionType


def _record_batch_header(b: fb.Builder, length: int, field_nodes, buffers,
                         compression: str = None) -> int:
    nodes_packed = b"".join(struct.pack("<qq", l, nc) for l, nc in field_nodes)
    nodes_vec = b.vector_of_structs(nodes_packed, len(field_nodes), align=8)
    bufs_packed = b"".join(struct.pack("<qq", o, ln) for o, ln in buffers)
    bufs_vec = b.vector_of_structs(bufs_packed, len(buffers), align=8)
    bc = None
    if compression is not None:
        b.start_table()
        b.slot_scalar(0, "b", _COMPRESSION_CODECS[compression], 0)
        b.slot_scalar(1, "b", 0, 0)  # method BUFFER
        bc = b.end_table()
    b.start_table()
    b.slot_scalar(0, "q", length, 0)
    b.slot_offset(1, nodes_vec)
    b.slot_offset(2, bufs_vec)
    if bc is not None:
        b.slot_offset(3, bc)
    return b.end_table()


class StreamWriter:
    """reference StreamWriter (arrow-ipc/src/writer.rs)."""

    def __init__(self, sink, schema: st.Schema, compression: str = None):
        if compression not in (None, "zstd", "lz4"):
            raise st.ArrowTpuError(f"IPC: unsupported compression {compression!r}")
        self.sink = sink
        self.schema = schema
        self.compression = compression
        self.dict_ids: Dict[str, int] = {}
        self._wrote_schema = False
        self._sent_dicts = set()
        self._sent_values: Dict[int, list] = {}  # id -> pylist already sent

    def _ensure_schema(self):
        if self._wrote_schema:
            return
        msg = _message_bytes(
            H_SCHEMA, lambda bb: _write_schema_fb(bb, self.schema, self.dict_ids), b""
        )
        self.sink.write(msg)
        self._wrote_schema = True

    def _write_dictionaries(self, batch: bt.RecordBatch):
        for f, c in zip(batch.schema.fields, batch.columns):
            self._walk_dicts(f.name, c)

    def _walk_dicts(self, path: str, c: col.Column):
        if isinstance(c, col.DictionaryColumn):
            did = self.dict_ids.get(path)
            if did is None:
                return
            values = c.values
            is_delta = False
            if did in self._sent_dicts:
                # delta dictionaries (reference DictionaryTracker,
                # writer.rs:1330-1362): an append-only growth ships only
                # the new values with isDelta; any other change ships a
                # full replacement message
                prev = self._sent_values.get(did, [])
                cur = values.with_length(values.length).to_pylist()
                if cur == prev:
                    return
                if len(cur) > len(prev) and cur[: len(prev)] == prev:
                    values = col.from_pylist(cur[len(prev):],
                                             self.schema_value_dtype(path))
                    is_delta = True
                self._sent_values[did] = cur
            else:
                self._sent_values[did] = (
                    values.with_length(values.length).to_pylist()
                )
            node = column_to_layout(values.with_length(values.length))
            field_nodes, buffers, body = _batch_body_and_header(
                [node], self.compression)

            def build(bb: fb.Builder) -> int:
                rb = _record_batch_header(
                    bb, values.concrete_length(), field_nodes, buffers,
                    self.compression,
                )
                bb.start_table()
                bb.slot_scalar(0, "q", did, 0)
                bb.slot_offset(1, rb)
                if is_delta:
                    bb.slot_scalar(2, "b", 1, 0)
                return bb.end_table()

            self.sink.write(_message_bytes(H_DICT, build, body))
            self._sent_dicts.add(did)
        elif isinstance(c, col.StructColumn):
            for f, ch in zip(c.dtype.fields, c.children):
                self._walk_dicts(path + "." + f.name, ch)
        elif isinstance(c, col.ListViewColumn):
            self._walk_dicts(path + ".item", c.child)
        elif isinstance(c, col.FixedSizeListColumn):
            self._walk_dicts(path + ".item", c.child)

    def schema_value_dtype(self, path: str) -> st.DataType:
        for did, (p, vdt) in _dict_paths(self.schema).items():
            if p == path:
                return vdt
        raise st.ArrowTpuError(f"IPC: unknown dictionary path {path}")

    def write(self, batch: bt.RecordBatch):
        self._ensure_schema()
        self._write_dictionaries(batch)
        nodes = [column_to_layout(c) for c in batch.columns]
        field_nodes, buffers, body = _batch_body_and_header(
            nodes, self.compression)
        n = int(batch.length)

        def build(bb: fb.Builder) -> int:
            return _record_batch_header(bb, n, field_nodes, buffers,
                                        self.compression)

        self.sink.write(_message_bytes(H_BATCH, build, body))

    def finish(self):
        self._ensure_schema()
        self.sink.write(struct.pack("<Ii", CONTINUATION, 0))  # EOS


class FileWriter(StreamWriter):
    """reference FileWriter (writer.rs:1593): magic + stream + footer."""

    def __init__(self, sink, schema: st.Schema, compression: str = None):
        super().__init__(sink, schema, compression)
        self._blocks: List[Tuple[int, int, int]] = []
        self._dict_blocks: List[Tuple[int, int, int]] = []
        sink.write(MAGIC + b"\0\0")
        self._base = 8

    def write(self, batch: bt.RecordBatch):
        self._ensure_schema()
        self._write_dictionaries_tracked(batch)
        nodes = [column_to_layout(c) for c in batch.columns]
        field_nodes, buffers, body = _batch_body_and_header(
            nodes, self.compression)
        n = int(batch.length)

        def build(bb):
            return _record_batch_header(bb, n, field_nodes, buffers,
                                        self.compression)

        msg = _message_bytes(H_BATCH, build, body)
        offset = self._tell()
        meta_len = len(msg) - len(body)
        self.sink.write(msg)
        self._blocks.append((offset, meta_len, len(body)))

    def _write_dictionaries_tracked(self, batch):
        start = self._tell()
        sink, self.sink = self.sink, _TrackingSink(self.sink)
        try:
            self._write_dictionaries(batch)
            for off, meta_len, body_len in self.sink.messages:
                self._dict_blocks.append((start + off, meta_len, body_len))
        finally:
            self.sink = sink

    def _tell(self):
        return self.sink.tell() if hasattr(self.sink, "tell") else 0

    def finish(self):
        self._ensure_schema()
        self.sink.write(struct.pack("<Ii", CONTINUATION, 0))
        b = fb.Builder()
        schema_off = _write_schema_fb(b, self.schema, dict(self.dict_ids))
        def blocks_vec(blocks):
            packed = b"".join(
                struct.pack("<qi4xq", off, ml, bl) for off, ml, bl in blocks
            )
            return b.vector_of_structs(packed, len(blocks), align=8)
        dict_vec = blocks_vec(self._dict_blocks)
        batch_vec = blocks_vec(self._blocks)
        b.start_table()
        b.slot_scalar(0, "h", 4, 0)  # version V5
        b.slot_offset(1, schema_off)
        b.slot_offset(2, dict_vec)
        b.slot_offset(3, batch_vec)
        footer = b.finish(b.end_table())
        self.sink.write(footer)
        self.sink.write(struct.pack("<i", len(footer)))
        self.sink.write(MAGIC)


class _TrackingSink:
    """Wraps a sink to record (offset, meta_len, body_len) per message."""

    def __init__(self, inner):
        self.inner = inner
        self.base = inner.tell() if hasattr(inner, "tell") else 0
        self.messages: List[Tuple[int, int, int]] = []
        self._pos = 0

    def write(self, data: bytes):
        if data[:4] == struct.pack("<I", CONTINUATION):
            (meta_len,) = struct.unpack_from("<i", data, 4)
            body_len = len(data) - 8 - meta_len
            self.messages.append((self._pos, meta_len + 8, body_len))
        self.inner.write(data)
        self._pos += len(data)

    def tell(self):
        return self.base + self._pos


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------


def _parse_message(buf: bytes, pos: int):
    """Returns (header_type, Table, body_offset, body_len, next_pos) or None at EOS."""
    if pos + 8 > len(buf):
        return None
    (cont,) = struct.unpack_from("<I", buf, pos)
    if cont != CONTINUATION:
        # legacy format without continuation
        (meta_len,) = struct.unpack_from("<i", buf, pos)
        meta_start = pos + 4
    else:
        (meta_len,) = struct.unpack_from("<i", buf, pos + 4)
        meta_start = pos + 8
    if meta_len == 0:
        return None
    msg = fb.Table.root(buf[meta_start : meta_start + meta_len])
    header_type = msg.scalar(1, "B", 0)
    body_len = msg.scalar(3, "q", 0)
    header_off = msg.offset(2)
    header = fb.Table(msg.buf, header_off) if header_off is not None else None
    body_start = meta_start + meta_len
    return header_type, header, body_start, body_len, body_start + body_len


def _read_batch_columns(header: fb.Table, body: bytes, schema: st.Schema, dictionaries):
    field_nodes = [
        struct.unpack("<qq", s) for s in header.vector_structs(1, 16)
    ]
    buffers = [struct.unpack("<qq", s) for s in header.vector_structs(2, 16)]
    bc = header.table(3)
    codec = bc.scalar(0, "b", 0) if bc is not None else None
    state = {"node": 0, "buf": 0}

    def take_node():
        n = field_nodes[state["node"]]
        state["node"] += 1
        return n

    def take_buf():
        off, ln = buffers[state["buf"]]
        state["buf"] += 1
        if codec is None or ln == 0:
            return np.frombuffer(body, np.uint8, count=ln, offset=off)
        # framed: 8-byte LE uncompressed length (-1 = raw) + payload
        (ulen,) = struct.unpack_from("<q", body, off)
        payload = body[off + 8 : off + ln]
        if ulen == -1:
            return np.frombuffer(payload, np.uint8)
        if codec == 1:  # ZSTD
            import zstandard

            raw = zstandard.ZstdDecompressor().decompress(
                payload, max_output_size=ulen)
        elif codec == 0:  # LZ4_FRAME
            from . import lz4

            raw = lz4.decompress(bytes(payload), expected_size=ulen)
        else:
            raise st.ArrowTpuError(f"IPC: unknown compression codec {codec}")
        return np.frombuffer(raw, np.uint8)

    def read_node(dt: st.DataType, path: str) -> Node:
        length, null_count = take_node()
        if isinstance(dt, st.Null):
            return Node(length, null_count, [], [])
        if isinstance(dt, st.Union):
            # unions carry no validity buffer: [type_ids] (+ [offsets]
            # iff dense), then each child in field order
            bufs = [take_buf()]
            if dt.mode == "dense":
                bufs.append(take_buf())
            children = [read_node(f.dtype, path + "." + f.name)
                        for f in dt.fields]
            return Node(length, null_count, bufs, children)
        bufs = [take_buf()]  # validity
        if isinstance(dt, st.Boolean):
            bufs.append(take_buf())
            return Node(length, null_count, bufs, [])
        if isinstance(dt, st.Dictionary):
            bufs.append(take_buf())
            return Node(length, null_count, bufs, [], dictionary=dictionaries[path])
        if isinstance(dt, (st.Utf8, st.Binary)):
            bufs.append(take_buf())
            bufs.append(take_buf())
            return Node(length, null_count, bufs, [])
        if isinstance(dt, (st.List, st.Map)):
            bufs.append(take_buf())
            child_dt = dt.entry_struct if isinstance(dt, st.Map) else dt.value
            return Node(length, null_count, bufs, [read_node(child_dt, path + (".entries" if isinstance(dt, st.Map) else ".item"))])
        if isinstance(dt, st.Struct):
            children = [read_node(f.dtype, path + "." + f.name) for f in dt.fields]
            return Node(length, null_count, bufs, children)
        if isinstance(dt, st.FixedSizeList):
            return Node(length, null_count, bufs, [read_node(dt.value, path + ".item")])
        bufs.append(take_buf())  # primitives
        return Node(length, null_count, bufs, [])

    cols = []
    for f in schema.fields:
        node = read_node(f.dtype, f.name)
        cols.append(layout_to_column(node, f.dtype))
    from ..interop.pyarrow_bridge import _equalize

    return bt.RecordBatch(schema, _equalize(tuple(cols)))


def _dict_paths(schema: st.Schema) -> Dict[int, Tuple[str, st.DataType]]:
    """dictionary id -> (path, value dtype), ids assigned in field order
    exactly like the writer."""
    ids: Dict[int, Tuple[str, st.DataType]] = {}
    counter = {"next": 0}

    def walk(f: st.Field, path: str):
        dt = f.dtype
        if isinstance(dt, st.Dictionary):
            ids[counter["next"]] = (path, dt.value)
            counter["next"] += 1
        elif isinstance(dt, st.Struct):
            for sf in dt.fields:
                walk(sf, path + "." + sf.name)
        elif isinstance(dt, (st.List, st.FixedSizeList)):
            walk(st.Field("item", dt.value), path + ".item")

    for f in schema.fields:
        walk(f, f.name)
    return ids


class StreamReader:
    """reference StreamReader (reader.rs:1516)."""

    def __init__(self, source):
        buf = source.read() if hasattr(source, "read") else source
        if isinstance(buf, bytearray):
            buf = bytes(buf)
        self.buf = buf
        self.pos = 0
        m = _parse_message(self.buf, self.pos)
        if m is None or m[0] != H_SCHEMA:
            raise st.ArrowTpuError("IPC stream: expected schema message")
        self.schema = _read_schema_fb(m[1])
        self.pos = m[4]
        self._dict_info = _dict_paths(self.schema)
        self.dictionaries: Dict[str, col.Column] = {}

    def __iter__(self):
        return self

    def __next__(self) -> bt.RecordBatch:
        while True:
            m = _parse_message(self.buf, self.pos)
            if m is None:
                raise StopIteration
            header_type, header, body_start, body_len, self.pos = m
            body = self.buf[body_start : body_start + body_len]
            if header_type == H_DICT:
                did = header.scalar(0, "q", 0)
                rb = header.table(1)
                is_delta = bool(header.scalar(2, "b", 0))
                path, vdt = self._dict_info[did]
                vschema = st.Schema((st.Field("values", vdt),))
                vb = _read_batch_columns(rb, body, vschema, {})
                if is_delta and path in self.dictionaries:
                    from ..ops.concat import concat

                    self.dictionaries[path] = concat(
                        [self.dictionaries[path], vb.columns[0]])
                else:
                    self.dictionaries[path] = vb.columns[0]
                continue
            if header_type == H_BATCH:
                return _read_batch_columns(header, body, self.schema, self.dictionaries)
            raise st.ArrowTpuError(f"IPC: unexpected message type {header_type}")


class FileReader:
    """reference FileReader (reader.rs:1339): reads via the footer."""

    def __init__(self, source):
        buf = source.read() if hasattr(source, "read") else source
        if isinstance(buf, bytearray):
            buf = bytes(buf)
        if buf[:6] != MAGIC or buf[-6:] != MAGIC:
            raise st.ArrowTpuError("not an Arrow IPC file (bad magic)")
        (footer_len,) = struct.unpack_from("<i", buf, len(buf) - 10)
        footer = fb.Table.root(buf[len(buf) - 10 - footer_len : len(buf) - 10])
        self.schema = _read_schema_fb(footer.table(1))
        self._dict_info = _dict_paths(self.schema)
        self.buf = buf
        self._dict_blocks = [
            struct.unpack("<qi4xq", s) for s in footer.vector_structs(2, 24)
        ]
        self._blocks = [
            struct.unpack("<qi4xq", s) for s in footer.vector_structs(3, 24)
        ]
        self.dictionaries: Dict[str, col.Column] = {}
        for off, meta_len, body_len in self._dict_blocks:
            m = _parse_message(self.buf, off)
            header_type, header, body_start, blen, _ = m
            body = self.buf[body_start : body_start + blen]
            did = header.scalar(0, "q", 0)
            rb = header.table(1)
            is_delta = bool(header.scalar(2, "b", 0))
            path, vdt = self._dict_info[did]
            vschema = st.Schema((st.Field("values", vdt),))
            vb = _read_batch_columns(rb, body, vschema, {})
            if is_delta and path in self.dictionaries:
                from ..ops.concat import concat

                self.dictionaries[path] = concat(
                    [self.dictionaries[path], vb.columns[0]])
            else:
                self.dictionaries[path] = vb.columns[0]

    @property
    def num_batches(self) -> int:
        return len(self._blocks)

    def get_batch(self, i: int) -> bt.RecordBatch:
        off, meta_len, body_len = self._blocks[i]
        m = _parse_message(self.buf, off)
        header_type, header, body_start, blen, _ = m
        body = self.buf[body_start : body_start + blen]
        return _read_batch_columns(header, body, self.schema, self.dictionaries)

    def __iter__(self):
        return (self.get_batch(i) for i in range(self.num_batches))


# ---------------------------------------------------------------------------
# convenience
# ---------------------------------------------------------------------------


def write_stream(batches, schema: st.Schema = None, sink=None, *,
                 compression: str = None) -> Optional[bytes]:
    if isinstance(batches, bt.RecordBatch):
        batches = [batches]
    if schema is None:
        schema = batches[0].schema
    own = sink is None
    if own:
        sink = io.BytesIO()
    w = StreamWriter(sink, schema, compression)
    for b in batches:
        w.write(b)
    w.finish()
    return sink.getvalue() if own else None


def write_file(batches, schema: st.Schema = None, sink=None, *,
               compression: str = None) -> Optional[bytes]:
    if isinstance(batches, bt.RecordBatch):
        batches = [batches]
    if schema is None:
        schema = batches[0].schema
    own = sink is None
    if own:
        sink = io.BytesIO()
    w = FileWriter(sink, schema, compression)
    for b in batches:
        w.write(b)
    w.finish()
    return sink.getvalue() if own else None


def read_stream(source, *, validate: bool = False) -> List[bt.RecordBatch]:
    """validate=True runs the device-side untrusted-input checks
    (core/validate.py; reference ArrayData::validate_full via the IPC
    reader's skip_validation default, arrow-ipc/src/reader.rs)."""
    out = list(StreamReader(source))
    if validate:
        from ..core.validate import check_batch

        for b in out:
            check_batch(b)
    return out


# ---------------------------------------------------------------------------
# unframed message API (the Flight data plane: header/body travel in
# separate protobuf fields — reference arrow-flight/src/encode.rs:269)
# ---------------------------------------------------------------------------


def encode_schema_message(schema: st.Schema, dict_ids: Dict[str, int]) -> bytes:
    return build_message_meta(
        H_SCHEMA, lambda b: _write_schema_fb(b, schema, dict_ids), 0
    )


def encode_batch_messages(batch: bt.RecordBatch, dict_ids: Dict[str, int],
                          sent_dicts: set) -> List[Tuple[bytes, bytes]]:
    """[(meta, body)] for any pending dictionary batches + the record batch."""
    out: List[Tuple[bytes, bytes]] = []

    def walk(path: str, c: col.Column):
        if isinstance(c, col.DictionaryColumn):
            did = dict_ids.get(path)
            if did is None or did in sent_dicts:
                return
            values = c.values
            node = column_to_layout(values)
            field_nodes, buffers, body = _batch_body_and_header([node])

            def build(bb: fb.Builder) -> int:
                rb = _record_batch_header(
                    bb, values.concrete_length(), field_nodes, buffers
                )
                bb.start_table()
                bb.slot_scalar(0, "q", did, 0)
                bb.slot_offset(1, rb)
                return bb.end_table()

            out.append((build_message_meta(H_DICT, build, len(body)), body))
            sent_dicts.add(did)
        elif isinstance(c, col.StructColumn):
            for f, ch in zip(c.dtype.fields, c.children):
                walk(path + "." + f.name, ch)
        elif isinstance(c, (col.ListViewColumn, col.FixedSizeListColumn)):
            walk(path + ".item", c.child)

    for f, c in zip(batch.schema.fields, batch.columns):
        walk(f.name, c)
    nodes = [column_to_layout(c) for c in batch.columns]
    field_nodes, buffers, body = _batch_body_and_header(nodes)
    n = int(batch.length)
    meta = build_message_meta(
        H_BATCH, lambda bb: _record_batch_header(bb, n, field_nodes, buffers), len(body)
    )
    out.append((meta, body))
    return out


class MessageDecoder:
    """Streaming decoder over unframed (meta, body) pairs (reference
    arrow-flight decode.rs FlightDataDecoder)."""

    def __init__(self):
        self.schema: Optional[st.Schema] = None
        self._dict_info = None
        self.dictionaries: Dict[str, col.Column] = {}

    def decode(self, meta: bytes, body: bytes) -> Optional[bt.RecordBatch]:
        msg = fb.Table.root(meta)
        header_type = msg.scalar(1, "B", 0)
        header_off = msg.offset(2)
        header = fb.Table(msg.buf, header_off) if header_off is not None else None
        if header_type == H_SCHEMA:
            self.schema = _read_schema_fb(header)
            self._dict_info = _dict_paths(self.schema)
            return None
        if header_type == H_DICT:
            did = header.scalar(0, "q", 0)
            rb = header.table(1)
            is_delta = bool(header.scalar(2, "b", 0))
            path, vdt = self._dict_info[did]
            vschema = st.Schema((st.Field("values", vdt),))
            vb = _read_batch_columns(rb, body, vschema, {})
            if is_delta and path in self.dictionaries:
                from ..ops.concat import concat

                self.dictionaries[path] = concat(
                    [self.dictionaries[path], vb.columns[0]])
            else:
                self.dictionaries[path] = vb.columns[0]
            return None
        if header_type == H_BATCH:
            return _read_batch_columns(header, body, self.schema, self.dictionaries)
        raise st.ArrowTpuError(f"IPC: unexpected message type {header_type}")


def read_file(source, *, validate: bool = False) -> List[bt.RecordBatch]:
    out = list(FileReader(source))
    if validate:
        from ..core.validate import check_batch

        for b in out:
            check_batch(b)
    return out
