"""arrowtpu native runtime: C++ host-side hot paths, compiled on demand.

The reference's host runtime is native Rust throughout; here the TPU
compute path is JAX/Pallas and the host-side hot loops (LZ4 block
compression, Avro varint block decode, ...) are C++ compiled with g++ at
first import and loaded via ctypes (no pybind11 in this image).

Build artifacts cache under ``native/_cache`` keyed by source hash, so
repeat imports are instant and source edits rebuild automatically.  All
users degrade gracefully (pure-Python fallbacks) when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src")
_CACHE = os.path.join(_DIR, "_cache")
_lock = threading.Lock()
_libs: dict = {}


def _build(name: str) -> str | None:
    src = os.path.join(_SRC, f"{name}.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_CACHE, f"{name}-{digest}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", tmp, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def load(name: str):
    """Load (building if needed) native library `name`; None on failure."""
    with _lock:
        if name in _libs:
            return _libs[name]
        path = _build(name)
        lib = None
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                lib = None
        _libs[name] = lib
        return lib


def avro_decode_block(body: bytes, nrows: int, fdesc, arena_cap: int):
    """Decode a flat-record Avro block natively.

    fdesc: int32 numpy array (nfields, 4) [type, nullable, null_branch,
    fixed_size].  Returns (vals i64 (nrows,nf), lens i64, valid u8,
    arena bytes, consumed) or None when the native build is unavailable;
    raises ValueError on malformed input."""
    import numpy as np

    lib = load("avroblock")
    if lib is None:
        return None
    fn = lib.arrowtpu_avro_decode_block
    fn.restype = ctypes.c_int64
    nf = fdesc.shape[0]
    vals = np.zeros((nrows, nf), np.int64)
    lens = np.zeros((nrows, nf), np.int64)
    valid = np.zeros((nrows, nf), np.uint8)
    views = np.zeros((nrows, nf, 4), np.uint32)
    arena = np.zeros(max(arena_cap, 1), np.uint8)
    used = ctypes.c_int64(0)
    fd = np.ascontiguousarray(fdesc, np.int32)
    rc = fn(body, ctypes.c_int64(len(body)), ctypes.c_int64(nrows),
            fd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(nf),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(arena.size), ctypes.byref(used),
            views.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc == -2:
        return avro_decode_block(body, nrows, fdesc, arena_cap * 2 + 1024)
    if rc < 0:
        raise ValueError("avro: malformed block (native decoder)")
    return vals, lens, valid, arena[: used.value], rc, views


def avro_decode_nested(body: bytes, nrows: int, desc, child_idx,
                       arena_cap: int, cap_mult: int = 2):
    """Decode a nested-record Avro block natively (avronest.cpp).

    desc: int32 (nnodes, 7) node table; child_idx: flat int32 child
    index table (see avronest.cpp header).  Returns (per_node dict with
    'vals','views','valid','lens','count', arena bytes, consumed) or
    None when no native build; raises ValueError on malformed input.
    Capacity overflows retry with doubled buffers."""
    import numpy as np

    lib = load("avronest")
    if lib is None:
        return None
    fn = lib.arrowtpu_avro_decode_nested
    fn.restype = ctypes.c_int64
    nn = desc.shape[0]
    d = np.ascontiguousarray(desc, np.int32)
    ci = np.ascontiguousarray(child_idx, np.int32)
    caps = np.full(nn, max(nrows, 1) * cap_mult // 2 + 16, np.int64)
    caps[0] = max(nrows, 1)
    arena_sz = max(arena_cap, 1) * cap_mult // 2 + 1024
    while True:
        vals = [np.zeros(int(caps[i]), np.int64) for i in range(nn)]
        views = [np.zeros((int(caps[i]), 4), np.uint32) for i in range(nn)]
        valid = [np.zeros(int(caps[i]), np.uint8) for i in range(nn)]
        lens = [np.zeros(int(caps[i]), np.int32) for i in range(nn)]
        counts = np.zeros(nn, np.int64)
        arena = np.zeros(arena_sz, np.uint8)
        used = ctypes.c_int64(0)

        def ptrarr(arrs, ctype):
            return (ctypes.c_void_p * nn)(
                *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs])

        rc = fn(body, ctypes.c_int64(len(body)), ctypes.c_int64(nrows),
                d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int32(nn),
                ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ptrarr(vals, ctypes.c_int64),
                ptrarr(views, ctypes.c_uint32),
                ptrarr(valid, ctypes.c_uint8),
                ptrarr(lens, ctypes.c_int32),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int64(arena.size), ctypes.byref(used))
        if rc == -2:
            caps = caps * 2
            arena_sz = arena_sz * 2
            continue
        if rc < 0:
            raise ValueError("avro: malformed block (native nested decoder)")
        out = []
        for i in range(nn):
            c = int(counts[i])
            out.append({"vals": vals[i][:c], "views": views[i][:c],
                        "valid": valid[i][:c].astype(bool),
                        "lens": lens[i][:c], "count": c})
        return out, arena[: used.value], rc


def lz4_compress_block(data: bytes) -> bytes | None:
    """Greedy LZ4 block compression (native); None if unavailable or
    incompressible within the worst-case bound."""
    lib = load("lz4block")
    if lib is None:
        return None
    fn = lib.arrowtpu_lz4_compress_block
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    n = len(data)
    cap = n + n // 255 + 16
    dst = (ctypes.c_uint8 * cap)()
    rc = fn(data, n, dst, cap)
    if rc < 0:
        return None
    return bytes(bytearray(dst[:rc]))
