"""Arrow C Data Interface: zero-copy host handoff via ArrowSchema/ArrowArray.

Capability mirror of the reference's FFI layer
(/root/reference/arrow-schema/src/ffi.rs:77 FFI_ArrowSchema,
arrow-data/src/ffi.rs:39 FFI_ArrowArray, arrow-array/src/ffi.rs:237
to_ffi/from_ffi): the C ABI structs of the Arrow specification, built
with ctypes (no pybind11 in this environment — the CPython-level ABI is
identical).

Export: a host-materialized column's Arrow-physical buffers (the same
formats/layout.py Node the IPC writer flattens) are pinned in a keepalive
registry and exposed through an ArrowArray whose release callback drops
the pin — consumers (pyarrow & friends) read the buffers in place, no
copy.  Import wraps the producer's buffers with numpy views, rebuilds a
device column, then calls the producer's release.

Limitations (documented like ffi.rs's): import requires offset == 0
(re-slice before exporting); dictionary/NestedDictionary import follows
the child schema.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import schema as st
from ..core import column as col
from ..formats.layout import Node, column_to_layout, layout_to_column


class ArrowSchema(ctypes.Structure):
    pass


class ArrowArray(ctypes.Structure):
    pass


_SCHEMA_RELEASE = ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowSchema))
_ARRAY_RELEASE = ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowArray))

ArrowSchema._fields_ = [
    ("format", ctypes.c_char_p),
    ("name", ctypes.c_char_p),
    ("metadata", ctypes.c_char_p),
    ("flags", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowSchema))),
    ("dictionary", ctypes.POINTER(ArrowSchema)),
    ("release", _SCHEMA_RELEASE),
    ("private_data", ctypes.c_void_p),
]
ArrowArray._fields_ = [
    ("length", ctypes.c_int64),
    ("null_count", ctypes.c_int64),
    ("offset", ctypes.c_int64),
    ("n_buffers", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("buffers", ctypes.POINTER(ctypes.c_void_p)),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowArray))),
    ("dictionary", ctypes.POINTER(ArrowArray)),
    ("release", _ARRAY_RELEASE),
    ("private_data", ctypes.c_void_p),
]

ARROW_FLAG_NULLABLE = 2

# format strings (Arrow CDataInterface.md; reference ffi.rs get_format_string)
_FMT = {
    st.Null: "n", st.Boolean: "b",
}


def _format_for(dt: st.DataType) -> str:
    if isinstance(dt, st.Null):
        return "n"
    if isinstance(dt, st.Boolean):
        return "b"
    if isinstance(dt, st.Int):
        return {(True, 8): "c", (True, 16): "s", (True, 32): "i", (True, 64): "l",
                (False, 8): "C", (False, 16): "S", (False, 32): "I",
                (False, 64): "L"}[(dt.signed, dt.bits)]
    if isinstance(dt, st.Float):
        return {16: "e", 32: "f", 64: "g"}[dt.bits]
    if isinstance(dt, st.Utf8):
        return "u"
    if isinstance(dt, st.Binary):
        return "z"
    if isinstance(dt, st.Date32):
        return "tdD"
    if isinstance(dt, st.Timestamp):
        return {"s": "tss:", "ms": "tsm:", "us": "tsu:", "ns": "tsn:"}[dt.unit] + (dt.tz or "")
    if isinstance(dt, st.List):
        return "+l"
    if isinstance(dt, st.Struct):
        return "+s"
    if isinstance(dt, st.Map):
        return "+m"
    if isinstance(dt, st.FixedSizeList):
        return f"+w:{dt.size}"
    if isinstance(dt, st.Dictionary):
        return _format_for(dt.key)
    raise st.SchemaError(f"cdata: no format for {dt}")


def _parse_format(fmt: str) -> st.DataType:
    simple = {"n": st.Null(), "b": st.boolean, "c": st.int8, "s": st.int16,
              "i": st.int32, "l": st.int64, "C": st.uint8, "S": st.uint16,
              "I": st.uint32, "L": st.uint64, "e": st.float16, "f": st.float32,
              "g": st.float64, "u": st.utf8, "z": st.binary,
              "U": st.utf8, "Z": st.binary, "tdD": st.Date32()}
    if fmt in simple:
        return simple[fmt]
    if fmt.startswith("ts"):
        unit = {"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]]
        tz = fmt[4:] or None
        return st.Timestamp(unit, tz)
    raise st.SchemaError(f"cdata: unsupported format {fmt!r}")


# keepalive registry: private_data (as int key) -> python refs
_EXPORTS: Dict[int, object] = {}
_NEXT = [1]


@_SCHEMA_RELEASE
def _release_schema(ptr):
    s = ptr.contents
    _EXPORTS.pop(int(s.private_data or 0), None)
    s.release = _SCHEMA_RELEASE()


@_ARRAY_RELEASE
def _release_array(ptr):
    a = ptr.contents
    _EXPORTS.pop(int(a.private_data or 0), None)
    a.release = _ARRAY_RELEASE()


def _pin(obj) -> int:
    key = _NEXT[0]
    _NEXT[0] += 1
    _EXPORTS[key] = obj
    return key


def _schema_struct(name: str, dt: st.DataType, nullable: bool, keep: list) -> ArrowSchema:
    s = ArrowSchema()
    fmt = _format_for(dt).encode()
    nm = name.encode()
    keep += [fmt, nm]
    s.format = fmt
    s.name = nm
    s.metadata = None
    s.flags = ARROW_FLAG_NULLABLE if nullable else 0
    children: List[Tuple[str, st.DataType, bool]] = []
    if isinstance(dt, st.List):
        children = [("item", dt.value, True)]
    elif isinstance(dt, st.FixedSizeList):
        children = [("item", dt.value, True)]
    elif isinstance(dt, st.Map):
        children = [("entries", dt.entry_struct, False)]
    elif isinstance(dt, st.Struct):
        children = [(f.name, f.dtype, f.nullable) for f in dt.fields]
    s.n_children = len(children)
    if children:
        arr = (ctypes.POINTER(ArrowSchema) * len(children))()
        for i, (cn, cdt, cnull) in enumerate(children):
            ch = _schema_struct(cn, cdt, cnull, keep)
            keep.append(ch)
            arr[i] = ctypes.pointer(ch)
        keep.append(arr)
        s.children = arr
    if isinstance(dt, st.Dictionary):
        d = _schema_struct("", dt.value, True, keep)
        keep.append(d)
        s.dictionary = ctypes.pointer(d)
    s.release = _release_schema
    s.private_data = None
    return s


def _array_struct(node: Node, dt: st.DataType, keep: list) -> ArrowArray:
    a = ArrowArray()
    a.length = node.length
    a.null_count = node.null_count
    a.offset = 0
    bufs: List[Optional[np.ndarray]] = []
    for i, b in enumerate(node.buffers):
        if i == 0 and node.null_count == 0:
            bufs.append(None)  # all-valid: NULL validity pointer
        else:
            b = np.ascontiguousarray(b)
            keep.append(b)
            bufs.append(b)
    a.n_buffers = len(bufs)
    parr = (ctypes.c_void_p * max(len(bufs), 1))()
    for i, b in enumerate(bufs):
        parr[i] = None if b is None or b.size == 0 else b.ctypes.data
    keep.append(parr)
    a.buffers = parr
    a.n_children = len(node.children)
    if node.children:
        child_dts = _child_dtypes(dt)
        carr = (ctypes.POINTER(ArrowArray) * len(node.children))()
        for i, (chn, chdt) in enumerate(zip(node.children, child_dts)):
            ch = _array_struct(chn, chdt, keep)
            keep.append(ch)
            carr[i] = ctypes.pointer(ch)
        keep.append(carr)
        a.children = carr
    if node.dictionary is not None:
        dnode = column_to_layout(node.dictionary)
        d = _array_struct(dnode, _value_dtype(dt), keep)
        keep.append(d)
        a.dictionary = ctypes.pointer(d)
    a.release = _release_array
    a.private_data = None
    return a


def _child_dtypes(dt: st.DataType) -> List[st.DataType]:
    if isinstance(dt, (st.List, st.FixedSizeList)):
        return [dt.value]
    if isinstance(dt, st.Map):
        return [dt.entry_struct]
    if isinstance(dt, st.Struct):
        return [f.dtype for f in dt.fields]
    return []


def _value_dtype(dt: st.DataType) -> st.DataType:
    return dt.value if isinstance(dt, st.Dictionary) else dt


def export_column(c: col.Column, name: str = "",
                  nullable: bool = True) -> Tuple[ArrowSchema, ArrowArray]:
    """Column -> (ArrowSchema, ArrowArray) C structs.  The returned structs
    stay valid until the consumer calls their release callbacks (reference
    to_ffi, arrow-array/src/ffi.rs:237)."""
    keep: list = []
    schema = _schema_struct(name, c.dtype, nullable, keep)
    node = column_to_layout(c)
    array = _array_struct(node, c.dtype, keep)
    key = _pin((keep, schema, array))
    schema.private_data = key
    array.private_data = key
    return schema, array


def export_to_pyarrow(c: col.Column, name: str = ""):
    """Zero-copy handoff to pyarrow (pa.Array._import_from_c)."""
    import pyarrow as pa

    schema, array = export_column(c, name)
    return pa.Array._import_from_c(
        ctypes.addressof(array), ctypes.addressof(schema)
    )


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------


def _buf_view(ptr: int, nbytes: int) -> np.ndarray:
    if ptr in (None, 0) or nbytes == 0:
        return np.zeros(0, np.uint8)
    return np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)), shape=(nbytes,)
    ).copy()


def _schema_to_field(s: ArrowSchema) -> st.Field:
    fmt = s.format.decode() if s.format else ""
    name = s.name.decode() if s.name else ""
    nullable = bool(s.flags & ARROW_FLAG_NULLABLE)
    if fmt == "+l" or fmt == "+L":
        item = _schema_to_field(s.children[0].contents)
        return st.Field(name, st.List(item.dtype), nullable)
    if fmt.startswith("+w:"):
        item = _schema_to_field(s.children[0].contents)
        return st.Field(name, st.FixedSizeList(item.dtype, int(fmt[3:])), nullable)
    if fmt == "+s":
        fields = tuple(
            _schema_to_field(s.children[i].contents) for i in range(s.n_children)
        )
        return st.Field(name, st.Struct(fields), nullable)
    if fmt == "+m":
        entry = _schema_to_field(s.children[0].contents)
        kf, vf = entry.dtype.fields
        return st.Field(name, st.Map(kf.dtype, vf.dtype), nullable)
    dt = _parse_format(fmt)
    if s.dictionary:
        vdt = _schema_to_field(s.dictionary.contents).dtype
        dt = st.Dictionary(dt, vdt)
    return st.Field(name, dt, nullable)


def _array_to_node(a: ArrowArray, dt: st.DataType) -> Node:
    if a.offset != 0:
        raise st.ArrowTpuError(
            "cdata import: non-zero offset unsupported (re-slice first)")
    n = int(a.length)
    nulls = int(a.null_count)
    if nulls < 0:
        nulls = 0 if not a.buffers or not a.buffers[0] else -1
    vbytes = (n + 7) // 8
    bufs: List[np.ndarray] = []
    nb = int(a.n_buffers)
    raw_ptrs = [a.buffers[i] for i in range(nb)] if nb else []

    def vbuf():
        if not raw_ptrs or raw_ptrs[0] in (None, 0):
            return np.zeros(0, np.uint8)
        return _buf_view(raw_ptrs[0], vbytes)

    if nulls == -1:  # unknown: compute from bitmap
        vb = vbuf()
        if vb.size:
            bits = np.unpackbits(vb, bitorder="little")[:n]
            nulls = int(n - bits.sum())
        else:
            nulls = 0

    if isinstance(dt, st.Null):
        return Node(n, n, [], [])
    if isinstance(dt, st.Boolean):
        return Node(n, nulls, [vbuf(), _buf_view(raw_ptrs[1], vbytes)], [])
    if isinstance(dt, st.Dictionary):
        key_nbytes = n * _itemsize(dt.key)
        knode = Node(n, nulls, [vbuf(), _buf_view(raw_ptrs[1], key_nbytes)], [])
        vfield = st.Field("", dt.value, True)
        vnode = _array_to_node(a.dictionary.contents, dt.value)
        from ..formats.layout import layout_to_column as l2c

        knode.dictionary = l2c(vnode, dt.value)
        return knode
    if isinstance(dt, (st.Utf8, st.Binary)):
        offsets = _buf_view(raw_ptrs[1], (n + 1) * 4)
        data_len = int(np.frombuffer(offsets.tobytes(), np.int32)[-1]) if n else 0
        data = _buf_view(raw_ptrs[2], data_len)
        return Node(n, nulls, [vbuf(), offsets, data], [])
    if isinstance(dt, (st.List, st.Map)):
        offsets = _buf_view(raw_ptrs[1], (n + 1) * 4)
        child_dt = dt.entry_struct if isinstance(dt, st.Map) else dt.value
        child = _array_to_node(a.children[0].contents, child_dt)
        return Node(n, nulls, [vbuf(), offsets], [child])
    if isinstance(dt, st.Struct):
        children = [
            _array_to_node(a.children[i].contents, f.dtype)
            for i, f in enumerate(dt.fields)
        ]
        return Node(n, nulls, [vbuf()], children)
    if isinstance(dt, st.FixedSizeList):
        child = _array_to_node(a.children[0].contents, dt.value)
        return Node(n, nulls, [vbuf()], [child])
    nbytes = n * _itemsize(dt)
    return Node(n, nulls, [vbuf(), _buf_view(raw_ptrs[1], nbytes)], [])


def _itemsize(dt: st.DataType) -> int:
    if isinstance(dt, st.Int):
        return dt.bits // 8
    if isinstance(dt, st.Float):
        return dt.bits // 8
    if isinstance(dt, (st.Date32, st.Time32)):
        return 4
    if isinstance(dt, (st.Timestamp, st.Date64, st.Time64, st.Duration)):
        return 8
    raise st.SchemaError(f"cdata: no itemsize for {dt}")


def import_column(array_ptr: int, schema_ptr: int) -> Tuple[col.Column, st.Field]:
    """(ArrowArray*, ArrowSchema*) addresses -> (column, field).  Calls the
    producer's release callbacks when done (reference from_ffi)."""
    s = ctypes.cast(schema_ptr, ctypes.POINTER(ArrowSchema)).contents
    a = ctypes.cast(array_ptr, ctypes.POINTER(ArrowArray)).contents
    field = _schema_to_field(s)
    node = _array_to_node(a, field.dtype)
    out = layout_to_column(node, field.dtype)
    if a.release:
        a.release(ctypes.pointer(a))
    if s.release:
        s.release(ctypes.pointer(s))
    return out, field


def import_from_pyarrow(pa_array) -> col.Column:
    """pyarrow array -> column through the C interface (no object walk)."""
    schema = ArrowSchema()
    array = ArrowArray()
    pa_array._export_to_c(ctypes.addressof(array), ctypes.addressof(schema))
    out, _ = import_column(ctypes.addressof(array), ctypes.addressof(schema))
    return out
