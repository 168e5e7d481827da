"""64-bit values as uint32 limb pairs: the TPU-native wide-type layer.

Why: this TPU's XLA path emulates 64-bit element types (X64 rewriting).
Measured on-chip: s64 streams at ~137 GB/s vs ~640 GB/s for u32 — a 4.7x
movement penalty — s64 `bitcast_convert_type` doesn't compile at all, and
f64 storage/compute silently degrade to double-f32 (~48-bit mantissa).
The reference assumes native 64-bit throughout (arrow-rs on x86; e.g.
Int64 PrimitiveArray, arrow-buffer ScalarBuffer<i64>).  The TPU-native
answer: a logical 64-bit column stores values as a (capacity, 2) uint32
array [lo, hi].  Movement ops (filter/take/concat/exchange) touch native
u32 lanes at full bandwidth; comparisons/sort keys/hashes derive exactly
from the limbs; arithmetic is explicit carry math on the VPU.

Float64 columns store exact IEEE754 bit patterns in the limbs, so
ordering, equality, grouping, joining and movement are bit-exact.
Float64 add/sub/mul are ALSO bit-exact everywhere: they run a
round-to-nearest-even IEEE754 softfloat directly on the limbs
(f64_add_exact / f64_mul_exact below) instead of bridging through the
platform's emulated f64.  Only div (and transcendental casts) still
bridge through emulated float64 (exact on CPU; ~2^-48 relative error
on this TPU, amplified by cancellation), documented at those kernels.

All functions are elementwise on (..., 2) uint32 arrays and fuse in XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_MASK32 = np.uint64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# host <-> limb conversion (numpy, exact)
# ---------------------------------------------------------------------------


def split_numpy(arr: np.ndarray) -> np.ndarray:
    """numpy int64/uint64/float64 -> (..., 2) uint32 [lo, hi]."""
    if arr.dtype == np.float64:
        bits = arr.view(np.uint64)
    elif arr.dtype == np.int64:
        bits = arr.view(np.uint64)
    elif arr.dtype == np.uint64:
        bits = arr
    else:
        raise TypeError(f"split_numpy: bad dtype {arr.dtype}")
    lo = (bits & _MASK32).astype(np.uint32)
    hi = (bits >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=-1)


def join_numpy(limbs: np.ndarray, dtype) -> np.ndarray:
    """(..., 2) uint32 -> numpy int64/uint64/float64."""
    lo = limbs[..., 0].astype(np.uint64)
    hi = limbs[..., 1].astype(np.uint64)
    bits = lo | (hi << np.uint64(32))
    return bits.view(np.dtype(dtype).newbyteorder("="))  # reinterpret


# ---------------------------------------------------------------------------
# limb accessors
# ---------------------------------------------------------------------------


def lo(x):
    return x[..., 0]


def hi(x):
    return x[..., 1]


def make(lo_, hi_):
    return jnp.stack([lo_.astype(U32), hi_.astype(U32)], axis=-1)


def zeros(shape) -> jax.Array:
    return jnp.zeros(tuple(shape) + (2,), dtype=U32)


def from_scalar(v: int) -> np.ndarray:
    return split_numpy(np.array(v, dtype=np.int64).reshape(()))


# ---------------------------------------------------------------------------
# integer arithmetic (wrapping, two's complement in limbs)
# ---------------------------------------------------------------------------


def add(a, b):
    l = lo(a) + lo(b)
    carry = (l < lo(a)).astype(U32)
    h = hi(a) + hi(b) + carry
    return make(l, h)


def sub(a, b):
    l = lo(a) - lo(b)
    borrow = (lo(a) < lo(b)).astype(U32)
    h = hi(a) - hi(b) - borrow
    return make(l, h)


def neg(a):
    l = ~lo(a) + U32(1)
    carry = (lo(a) == 0).astype(U32)  # ~x+1 carries into hi iff lo == 0
    h = ~hi(a) + carry
    return make(l, h)


def _mul32x32(a32, b32) -> Tuple[jax.Array, jax.Array]:
    """Full 64-bit product of two uint32 vectors via 16-bit partials."""
    a0 = a32 & U32(0xFFFF)
    a1 = a32 >> 16
    b0 = b32 & U32(0xFFFF)
    b1 = b32 >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & U32(0xFFFF)) + (p10 & U32(0xFFFF))
    lo_ = (p00 & U32(0xFFFF)) | (mid << 16)
    hi_ = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return lo_, hi_


def mul(a, b):
    """Wrapping 64-bit multiply."""
    l, c = _mul32x32(lo(a), lo(b))
    h = c + hi(a) * lo(b) + lo(a) * hi(b)
    return make(l, h)


# ---------------------------------------------------------------------------
# tuple kernels: (lo, hi) pairs of (n,) u32 planes.
#
# Multi-step arithmetic must NOT round-trip through the (n, 2) stacked
# form between steps: measured on v5e (scripts/prof_wide.py), the
# constant-divisor divmod chain costs 5.47 ms at 8M rows when every
# intermediate is make()-stacked vs 1.10 ms for identical math on
# separate (n,) planes — XLA materializes the stacks and the minor-dim-2
# layout wastes lanes.  Public entry points split once, compute on
# tuples, and stack once at the end.
# ---------------------------------------------------------------------------


def _add_t(a, b):
    l = a[0] + b[0]
    return l, a[1] + b[1] + (l < a[0]).astype(U32)


def _sub_t(a, b):
    return a[0] - b[0], a[1] - b[1] - (a[0] < b[0]).astype(U32)


def _neg_t(a):
    l = ~a[0] + U32(1)
    return l, ~a[1] + (a[0] == 0).astype(U32)


def _lt_u_t(a, b):
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def _where_t(c, a, b):
    return jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1])


def _mul_t(a, b):
    l, c = _mul32x32(a[0], b[0])
    return l, c + a[1] * b[0] + a[0] * b[1]


def _mulhi64_t(a, b):
    """High 64 bits of the 128-bit product (tuple form of mulhi64)."""
    p0l, p0h = _mul32x32(a[0], b[0])
    del p0l
    p1l, p1h = _mul32x32(a[0], b[1])
    p2l, p2h = _mul32x32(a[1], b[0])
    p3l, p3h = _mul32x32(a[1], b[1])
    t1 = p0h + p1l
    c1 = (t1 < p0h).astype(U32)
    t1b = t1 + p2l
    c1 = c1 + (t1b < t1).astype(U32)
    t2 = p1h + p2h
    c2 = (t2 < p1h).astype(U32)
    t2b = t2 + p3l
    c2 = c2 + (t2b < t2).astype(U32)
    t2c = t2b + c1
    c2 = c2 + (t2c < t2b).astype(U32)
    return t2c, p3h + c2


def _const_t(v: int, shape):
    v &= (1 << 64) - 1
    return (jnp.broadcast_to(U32(v & 0xFFFFFFFF), shape),
            jnp.broadcast_to(U32(v >> 32), shape))


def and_(a, b):
    return make(lo(a) & lo(b), hi(a) & hi(b))


def or_(a, b):
    return make(lo(a) | lo(b), hi(a) | hi(b))


def xor(a, b):
    return make(lo(a) ^ lo(b), hi(a) ^ hi(b))


def not_(a):
    return make(~lo(a), ~hi(a))


def shl(a, k):
    """Shift left by per-element amount k (0..63)."""
    k = k.astype(U32) & U32(63)
    small = k < 32
    ks = jnp.where(small, k, k - 32)
    l1 = jnp.where(small & (ks > 0), lo(a) << ks, jnp.where(small, lo(a), U32(0)))
    spill = jnp.where(small & (ks > 0), lo(a) >> (U32(32) - ks), U32(0))
    h1 = jnp.where(
        small,
        jnp.where(ks > 0, (hi(a) << ks) | spill, hi(a)),
        lo(a) << ks,
    )
    return make(l1, h1)


def shr(a, k):
    """Logical shift right by per-element amount k (0..63)."""
    k = k.astype(U32) & U32(63)
    small = k < 32
    ks = jnp.where(small, k, k - 32)
    spill = jnp.where(small & (ks > 0), hi(a) << (U32(32) - ks), U32(0))
    l1 = jnp.where(
        small,
        jnp.where(ks > 0, (lo(a) >> ks) | spill, lo(a)),
        hi(a) >> ks,
    )
    h1 = jnp.where(small, jnp.where(ks > 0, hi(a) >> ks, hi(a)), U32(0))
    return make(l1, h1)


def sar(a, k):
    """Arithmetic shift right by per-element amount k (0..63)."""
    logical = shr(a, k)
    neg = is_negative(a)
    # fill vacated high bits with ones for negative values
    k = k.astype(U32) & U32(63)
    ones = not_(zeros(lo(a).shape))
    fill = jnp.where((k > 0)[..., None], not_(shr(ones, k)), zeros(lo(a).shape))
    return jnp.where(neg[..., None], or_(logical, fill), logical)


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------


def eq(a, b):
    return (lo(a) == lo(b)) & (hi(a) == hi(b))


def lt_unsigned(a, b):
    return (hi(a) < hi(b)) | ((hi(a) == hi(b)) & (lo(a) < lo(b)))


def lt_signed(a, b):
    fa = hi(a) ^ U32(0x80000000)
    fb = hi(b) ^ U32(0x80000000)
    return (fa < fb) | ((fa == fb) & (lo(a) < lo(b)))


def is_negative(a):
    return (hi(a) >> 31) != 0


# ---------------------------------------------------------------------------
# division (signed/unsigned truncating, exact; 64-round shift-subtract)
# ---------------------------------------------------------------------------


def _divmod_unsigned(a, b):
    """Unsigned 64/64 -> (quotient, remainder).  b == 0 yields q=0, r=a."""
    shape = lo(a).shape

    def body(i, state):
        q, r = state
        bit = U32(63) - jnp.asarray(i, U32)
        # r = (r << 1) | bit_of(a, 63 - i)
        abit = lo(shr(a, jnp.broadcast_to(bit, shape))) & U32(1)
        r = add(shl(r, jnp.broadcast_to(U32(1), shape)), make(abit, jnp.zeros_like(abit)))
        ge = ~lt_unsigned(r, b) & ~_is_zero(b)
        r = jnp.where(ge[..., None], sub(r, b), r)
        qbit = shl(make(ge.astype(U32), jnp.zeros_like(ge, U32)),
                   jnp.broadcast_to(bit, shape))
        q = or_(q, qbit)
        return q, r

    q0 = zeros(shape)
    r0 = zeros(shape)
    q, r = jax.lax.fori_loop(0, 64, body, (q0, r0))
    return q, r


def mulhi64(a, b):
    """High 64 bits of the full 128-bit product of two u64 limb pairs."""
    al, ah = lo(a), hi(a)
    bl, bh = lo(b), hi(b)
    p0l, p0h = _mul32x32(al, bl)
    p1l, p1h = _mul32x32(al, bh)
    p2l, p2h = _mul32x32(ah, bl)
    p3l, p3h = _mul32x32(ah, bh)
    t1 = p0h + p1l
    c1 = (t1 < p0h).astype(U32)
    t1b = t1 + p2l
    c1 = c1 + (t1b < t1).astype(U32)
    t2 = p1h + p2h
    c2 = (t2 < p1h).astype(U32)
    t2b = t2 + p3l
    c2 = c2 + (t2b < t2).astype(U32)
    t2c = t2b + c1
    c2 = c2 + (t2c < t2b).astype(U32)
    return make(t2c, p3h + c2)


def _divmod_unsigned_const_t(a, d: int):
    """Tuple form: exact (a // d, a % d) for u64 (lo, hi) planes and a
    CONSTANT python-int divisor — one multiply-high + <=2 corrections
    instead of the 64-round shift/subtract loop (the reference relies on
    LLVM doing the same strength reduction for native i64 kernels)."""
    shape = a[0].shape
    if d <= 0:
        raise ValueError("divisor must be positive")
    if d == 1:
        z = jnp.zeros(shape, U32)
        return a, (z, z)
    if d & (d - 1) == 0:
        k = d.bit_length() - 1
        if k == 0:
            q = a
        elif k < 32:
            q = ((a[0] >> U32(k)) | (a[1] << U32(32 - k)),
                 a[1] >> U32(k))
        elif k == 32:
            q = (a[1], jnp.zeros(shape, U32))
        else:
            q = (a[1] >> U32(k - 32), jnp.zeros(shape, U32))
        mlo, mhi = _const_t(d - 1, shape)
        return q, (a[0] & mlo, a[1] & mhi)
    m = (1 << 64) // d                     # floor(2^64 / d), < 2^64
    mC = _const_t(m, shape)
    dC = _const_t(d, shape)
    q = _mulhi64_t(a, mC)
    r = _sub_t(a, _mul_t(q, dC))
    one = _const_t(1, shape)
    for _ in range(2):                     # q_est >= q - 2
        ge = ~_lt_u_t(r, dC)
        q = _where_t(ge, _add_t(q, one), q)
        r = _where_t(ge, _sub_t(r, dC), r)
    return q, r


def divmod_unsigned_const(a, d: int):
    """(n, 2) wrapper over the tuple kernel (see tuple-kernels note)."""
    q, r = _divmod_unsigned_const_t((lo(a), hi(a)), d)
    return make(*q), make(*r)


def _divmod_signed_const_t(a, d: int):
    """Tuple form: truncated (a // d toward zero, a % d with dividend
    sign) for i64 planes and a constant divisor (reference rem/div
    semantics)."""
    neg_d = d < 0
    mag_d = -d if neg_d else d
    na = (a[1] >> 31) != 0
    mag_a = _where_t(na, _neg_t(a), a)
    q, r = _divmod_unsigned_const_t(mag_a, mag_d)
    qneg = na ^ neg_d
    q = _where_t(qneg, _neg_t(q), q)
    r = _where_t(na, _neg_t(r), r)
    return q, r


def divmod_signed_const(a, d: int):
    """(n, 2) wrapper over the tuple kernel (see tuple-kernels note)."""
    q, r = _divmod_signed_const_t((lo(a), hi(a)), d)
    return make(*q), make(*r)


def _is_zero(a):
    return (lo(a) == 0) & (hi(a) == 0)


def divmod_signed(a, b):
    """C/Rust truncating signed division (matches jax.lax.div/rem on s64).
    b == 0 yields q=0, r=0 (callers flag divide-by-zero separately)."""
    na = is_negative(a)
    nb = is_negative(b)
    ua = jnp.where(na[..., None], neg(a), a)
    ub = jnp.where(nb[..., None], neg(b), b)
    q, r = _divmod_unsigned(ua, ub)
    qneg = na ^ nb
    q = jnp.where(qneg[..., None], neg(q), q)
    r = jnp.where(na[..., None], neg(r), r)
    zero_b = _is_zero(b)
    q = jnp.where(zero_b[..., None], zeros(lo(a).shape), q)
    r = jnp.where(zero_b[..., None], zeros(lo(a).shape), r)
    return q, r


def divmod_unsigned(a, b):
    q, r = _divmod_unsigned(a, b)
    zero_b = _is_zero(b)
    q = jnp.where(zero_b[..., None], zeros(lo(a).shape), q)
    r = jnp.where(zero_b[..., None], zeros(lo(a).shape), r)
    return q, r


# ---------------------------------------------------------------------------
# widening / narrowing
# ---------------------------------------------------------------------------


def from_int32(x) -> jax.Array:
    """Sign-extend int32 (or narrower signed) to limbs."""
    xi = x.astype(jnp.int32)
    lo_ = xi.astype(U32)
    hi_ = jnp.where(xi < 0, U32(0xFFFFFFFF), U32(0))
    return make(lo_, hi_)


def from_uint32(x) -> jax.Array:
    return make(x.astype(U32), jnp.zeros_like(x, U32))


def to_int32_wrap(a):
    return lo(a).astype(jnp.int32)


# ---------------------------------------------------------------------------
# float64 bit helpers (exact, integer-only)
# ---------------------------------------------------------------------------


def f64_is_nan(a):
    e = (hi(a) >> 20) & U32(0x7FF)
    frac_nonzero = ((hi(a) & U32(0xFFFFF)) != 0) | (lo(a) != 0)
    return (e == U32(0x7FF)) & frac_nonzero


def f64_is_zero(a):
    return ((hi(a) & U32(0x7FFFFFFF)) == 0) & (lo(a) == 0)


def f64_total_order_planes(a):
    """Rust total_cmp transform (reference arrow-row/src/fixed.rs:118-149):
    negative -> flip all bits; non-negative -> flip sign bit.  Returns
    (hi_plane, lo_plane) uint32, lexicographic-ascending == total order."""
    negative = (hi(a) >> 31) != 0
    mask_hi = jnp.where(negative, U32(0xFFFFFFFF), U32(0x80000000))
    mask_lo = jnp.where(negative, U32(0xFFFFFFFF), U32(0))
    return hi(a) ^ mask_hi, lo(a) ^ mask_lo


def f64_ieee_eq(a, b):
    """IEEE ==: NaN != anything, -0 == +0."""
    bits_eq = eq(a, b)
    both_zero = f64_is_zero(a) & f64_is_zero(b)
    return (bits_eq | both_zero) & ~f64_is_nan(a) & ~f64_is_nan(b)


def f64_ieee_lt(a, b):
    ka_hi, ka_lo = f64_total_order_planes(a)
    kb_hi, kb_lo = f64_total_order_planes(b)
    lt = (ka_hi < kb_hi) | ((ka_hi == kb_hi) & (ka_lo < kb_lo))
    both_zero = f64_is_zero(a) & f64_is_zero(b)
    return lt & ~both_zero & ~f64_is_nan(a) & ~f64_is_nan(b)


def _pow2(e) -> jax.Array:
    """Exact float64 2**e for integer e in [-537, 537]: product of exact
    power-of-two constants selected by e's bits (jnp.exp2 is exp(x ln2) in
    XLA and NOT exact — unusable for bit manipulation)."""
    neg_e = e < 0
    mag = jnp.where(neg_e, -e, e).astype(jnp.int32)
    out = jnp.ones(e.shape, jnp.float64)
    for j in range(10):  # bits up to 2^9 = 512 cover |e| <= 1023
        p = float(2.0 ** (2**j))
        factor = jnp.where(neg_e, jnp.float64(1.0 / p), jnp.float64(p))
        bit = ((mag >> j) & 1) == 1
        out = out * jnp.where(bit, factor, jnp.float64(1.0))
    return out


def _scale_pow2(x, e):
    """x * 2**e exactly, |e| <= 1074, via two half-range steps to avoid
    intermediate over/underflow."""
    e1 = e // 2
    e2 = e - e1
    return x * _pow2(e1) * _pow2(e2)


# ---------------------------------------------------------------------------
# exact IEEE754 binary64 softfloat (round-to-nearest-even) on u32 limbs
#
# The TPU's emulated f64 arithmetic is double-f32 (~2^-48 input rounding,
# f32 exponent range), which cancellation can amplify to arbitrary
# relative error.  add/sub/mul below are instead computed EXACTLY in
# integer limb arithmetic — bit-for-bit identical to the reference's
# native f64 (arrow-arith on x86) including subnormals, signed zeros,
# infinities and NaN propagation.  ~60 fused VPU ops per element; used by
# ops/numeric.py for Float64 add/sub/mul.  div stays on the emulated
# bridge with its documented bound.
# ---------------------------------------------------------------------------


# ---- f64 softfloat tuple kernels (see tuple-kernels note above: the
# (n,2)-stacked form of this chain ran at 16.8 ms per 8M adds; tuple
# planes remove the stack materializations) ----------------------------


def _or_t(a, b):
    return a[0] | b[0], a[1] | b[1]


def _shl_t(a, k):
    """Tuple shift-left by per-element k (0..63)."""
    al, ah = a
    k = k.astype(U32) & U32(63)
    small = k < 32
    ks = jnp.where(small, k, k - 32)
    l1 = jnp.where(small & (ks > 0), al << ks,
                   jnp.where(small, al, U32(0)))
    spill = jnp.where(small & (ks > 0), al >> (U32(32) - ks), U32(0))
    h1 = jnp.where(small, jnp.where(ks > 0, (ah << ks) | spill, ah),
                   al << ks)
    return l1, h1


def _shr_t(a, k):
    """Tuple logical shift-right by per-element k (0..63)."""
    al, ah = a
    k = k.astype(U32) & U32(63)
    small = k < 32
    ks = jnp.where(small, k, k - 32)
    spill = jnp.where(small & (ks > 0), ah << (U32(32) - ks), U32(0))
    l1 = jnp.where(small, jnp.where(ks > 0, (al >> ks) | spill, al),
                   ah >> ks)
    h1 = jnp.where(small, jnp.where(ks > 0, ah >> ks, ah), U32(0))
    return l1, h1


def _pow2_t(k: int, shape):
    if k < 32:
        return (jnp.full(shape, np.uint32(1 << k), U32),
                jnp.zeros(shape, U32))
    return (jnp.zeros(shape, U32),
            jnp.full(shape, np.uint32(1 << (k - 32)), U32))


def _clz64_t(m):
    x = m
    n = jnp.zeros(m[0].shape, jnp.int32)
    for step in (32, 16, 8, 4, 2, 1):
        empty = _lt_u_t(x, _pow2_t(64 - step, m[0].shape))
        x = _where_t(empty, _shl_t(x, jnp.full(n.shape, step, U32)), x)
        n = n + jnp.where(empty, step, 0)
    return n


def _f64_parts_t(l, h):
    s = h >> 31
    e = ((h >> 20) & U32(0x7FF)).astype(jnp.int32)
    frac_hi = h & U32(0xFFFFF)
    normal = e > 0
    m_hi = jnp.where(normal, frac_hi | U32(0x100000), frac_hi)
    E = jnp.where(normal, e, 1)
    return s, E, (l, m_hi)


def _f64_assemble_t(s, e_field, m):
    h = (s.astype(U32) << 31) | (e_field.astype(U32) << 20) \
        | (m[1] & U32(0xFFFFF))
    return m[0], h


def _round_pack_t(s, Er, Mn):
    """Tuple form of the RNE round-and-pack (same contract as the
    docstring below on the limb-pair version it replaced)."""
    shape = Mn[0].shape
    zero_t = (jnp.zeros(shape, U32), jnp.zeros(shape, U32))
    den = jnp.maximum(1 - Er, 0)
    dcl = jnp.minimum(den, 63).astype(U32)
    shifted = _shr_t(Mn, dcl)
    lost = _sub_t(Mn, _shl_t(shifted, dcl))
    sticky = jnp.where(den > 0, (lost[0] | lost[1]) != 0, False)
    big = den > 63
    Md = _where_t(big, zero_t, shifted)
    sticky = sticky | (big & ((Mn[0] | Mn[1]) != 0))
    Md = (Md[0] | sticky.astype(U32), Md[1])

    m53 = _shr_t(Md, jnp.full(shape, 3, U32))
    g = (Md[0] >> 2) & U32(1)
    r = (Md[0] >> 1) & U32(1)
    st_ = Md[0] & U32(1)
    odd = m53[0] & U32(1)
    up = (g == 1) & ((r == 1) | (st_ == 1) | (odd == 1))
    mr = _add_t(m53, (up.astype(U32), jnp.zeros(shape, U32)))
    ovf = (mr[1] >> 21) != 0
    mr = _where_t(ovf, _shr_t(mr, jnp.full(shape, 1, U32)), mr)
    Ed = jnp.where(den > 0, 1, Er)
    Ef = Ed + ovf.astype(jnp.int32)
    has_imp = (mr[1] >> 20) != 0
    e_field = jnp.where(has_imp, Ef, 0)
    inf = e_field >= 0x7FF
    e_field = jnp.where(inf, 0x7FF, e_field)
    mr = _where_t(inf, zero_t, mr)
    return _f64_assemble_t(s, e_field, mr)


def f64_add_exact(a, b):
    """Exact IEEE754 RNE a + b on limb pairs (tuple kernels inside)."""
    al, ah = lo(a), hi(a)
    bl, bh = lo(b), hi(b)
    shape = al.shape
    zero_t = (jnp.zeros(shape, U32), jnp.zeros(shape, U32))
    sa, Ea, ma = _f64_parts_t(al, ah)
    sb, Eb, mb = _f64_parts_t(bl, bh)

    # order by (E, m) magnitude so x >= y in magnitude
    swap = (Eb > Ea) | ((Eb == Ea) & _lt_u_t(ma, mb))
    sx = jnp.where(swap, sb, sa)
    sy = jnp.where(swap, sa, sb)
    Ex = jnp.where(swap, Eb, Ea)
    Ey = jnp.where(swap, Ea, Eb)
    mx = _where_t(swap, mb, ma)
    my = _where_t(swap, ma, mb)

    Mx = _shl_t(mx, jnp.full(shape, 3, U32))   # 56-bit with 3 grs bits
    My = _shl_t(my, jnp.full(shape, 3, U32))
    d = Ex - Ey
    dcl = jnp.minimum(d, 63).astype(U32)
    Ms = _shr_t(My, dcl)
    lost = _sub_t(My, _shl_t(Ms, dcl))
    sticky = (d > 0) & ((lost[0] | lost[1]) != 0)
    far = d > 55
    Ms = _where_t(far, zero_t, Ms)
    sticky = sticky | (far & ((My[0] | My[1]) != 0))
    Ms = (Ms[0] | sticky.astype(U32), Ms[1])

    same = sx == sy
    Msum = _where_t(same, _add_t(Mx, Ms), _sub_t(Mx, Ms))

    # normalize so the MSB sits at bit 55 (see _round_pack_t contract):
    # left shift = lz - 8, clamped to the exponent headroom Ex - 1
    iszero = (Msum[0] | Msum[1]) == 0
    nz = _where_t(iszero, _pow2_t(55, shape), Msum)
    lz = _clz64_t(nz)
    left = jnp.minimum(lz - 8, jnp.maximum(Ex - 1, 0))  # in [-1, 55]
    shr_amt = jnp.maximum(-left, 0)       # at most 1 (carry case)
    shl_amt = jnp.maximum(left, 0)
    stick2 = (shr_amt > 0) & ((nz[0] & U32(1)) != 0)
    Mn = _shr_t(nz, shr_amt.astype(U32))
    Mn = _shl_t(Mn, shl_amt.astype(U32))
    Mn = (Mn[0] | stick2.astype(U32), Mn[1])
    Er = Ex - left

    szero = sx & sy                       # exact-cancel / zero sign: +0
    rl, rh = _round_pack_t(jnp.where(iszero, szero, sx),
                           jnp.where(iszero, 1, Er),
                           _where_t(iszero, zero_t, Mn))

    # specials
    a_nan_ = (((ah >> 20) & U32(0x7FF)) == U32(0x7FF)) & \
        (((ah & U32(0xFFFFF)) != 0) | (al != 0))
    b_nan_ = (((bh >> 20) & U32(0x7FF)) == U32(0x7FF)) & \
        (((bh & U32(0xFFFFF)) != 0) | (bl != 0))
    a_inf = (((ah >> 20) & U32(0x7FF)) == U32(0x7FF)) & ~a_nan_
    b_inf = (((bh >> 20) & U32(0x7FF)) == U32(0x7FF)) & ~b_nan_
    inf_conflict = a_inf & b_inf & ((ah >> 31) != (bh >> 31))
    any_nan = a_nan_ | b_nan_ | inf_conflict
    rl = jnp.where(a_inf, al, rl)
    rh = jnp.where(a_inf, ah, rh)
    rl = jnp.where(b_inf & ~a_inf, bl, rl)
    rh = jnp.where(b_inf & ~a_inf, bh, rh)
    rl = jnp.where(any_nan, U32(0), rl)
    rh = jnp.where(any_nan, U32(0x7FF80000), rh)
    return make(rl, rh)


def f64_sub_exact(a, b):
    return f64_add_exact(a, xor(b, make(jnp.zeros(lo(b).shape, U32),
                                        jnp.full(lo(b).shape, 0x80000000,
                                                 U32))))


def f64_mul_exact(a, b):
    """Exact IEEE754 RNE a * b on limb pairs (tuple kernels inside)."""
    al, ah = lo(a), hi(a)
    bl, bh = lo(b), hi(b)
    shape = al.shape
    zero_t = (jnp.zeros(shape, U32), jnp.zeros(shape, U32))
    sa, Ea, ma = _f64_parts_t(al, ah)
    sb, Eb, mb = _f64_parts_t(bl, bh)
    s_ = sa ^ sb

    # pre-normalize subnormal mantissas so m in [2^52, 2^53)
    def prenorm(E, m):
        nzm = (m[0] | m[1]) != 0
        safe = _where_t(nzm, m, _pow2_t(52, shape))
        lz = _clz64_t(safe)               # want lz == 11
        k = jnp.maximum(lz - 11, 0)
        return E - k, _shl_t(safe, jnp.minimum(k, 63).astype(U32)), nzm

    Ea, ma, a_nzm = prenorm(Ea, ma)
    Eb, mb, b_nzm = prenorm(Eb, mb)

    # 106-bit product of two 53-bit mantissas in four u32 limbs
    p0l, p0h = _mul32x32(ma[0], mb[0])
    p1l, p1h = _mul32x32(ma[0], mb[1])
    p2l, p2h = _mul32x32(ma[1], mb[0])
    p3l, p3h = _mul32x32(ma[1], mb[1])
    t1 = p0h + p1l
    c1 = (t1 < p0h).astype(U32)
    t1b = t1 + p2l
    c1 = c1 + (t1b < t1).astype(U32)
    t2 = p1h + p2h
    c2 = (t2 < p1h).astype(U32)
    t2b = t2 + p3l
    c2 = c2 + (t2b < t2).astype(U32)
    t2c = t2b + c1
    c2 = c2 + (t2c < t2b).astype(U32)
    t3 = p3h + c2
    P = (p0l, t1b, t2c, t3)               # little-endian u32 limbs

    # product MSB is at bit 104 or 105; shift the 56-bit (mant53|grs)
    # window down to bit 55 and fold the dropped low bits into sticky.
    # Er = Ea + Eb - 1023 + msb105 (see _round_pack_t contract).
    msb105 = (t3 >> 9) != 0               # product bit 105 == t3 bit 9
    sh32 = jnp.where(msb105, U32(18), U32(17))   # (49|50) - 32
    lo_ = (P[1] >> sh32) | (P[2] << (U32(32) - sh32))
    hi_ = (P[2] >> sh32) | (P[3] << (U32(32) - sh32))
    lost_low = (P[0] != 0) | ((P[1] & ((U32(1) << sh32) - U32(1))) != 0)
    Mn = (lo_ | lost_low.astype(U32), hi_ & U32(0x00FFFFFF))
    Er = Ea + Eb - 1023 + msb105.astype(jnp.int32)
    rl, rh = _round_pack_t(s_, Er, Mn)

    # zero inputs -> signed zero
    prod_zero = ~(a_nzm & b_nzm)
    zl, zh = _f64_assemble_t(s_, jnp.zeros(shape, jnp.int32), zero_t)
    rl = jnp.where(prod_zero, zl, rl)
    rh = jnp.where(prod_zero, zh, rh)

    # specials
    a_nan_ = (((ah >> 20) & U32(0x7FF)) == U32(0x7FF)) & \
        (((ah & U32(0xFFFFF)) != 0) | (al != 0))
    b_nan_ = (((bh >> 20) & U32(0x7FF)) == U32(0x7FF)) & \
        (((bh & U32(0xFFFFF)) != 0) | (bl != 0))
    a_inf = (((ah >> 20) & U32(0x7FF)) == U32(0x7FF)) & ~a_nan_
    b_inf = (((bh >> 20) & U32(0x7FF)) == U32(0x7FF)) & ~b_nan_
    a_zero = ((ah & U32(0x7FFFFFFF)) == 0) & (al == 0)
    b_zero = ((bh & U32(0x7FFFFFFF)) == 0) & (bl == 0)
    inf_zero = (a_inf & b_zero) | (b_inf & a_zero)
    any_nan = a_nan_ | b_nan_ | inf_zero
    il, ih = _f64_assemble_t(s_, jnp.full(shape, 0x7FF, jnp.int32),
                             zero_t)
    is_inf = (a_inf | b_inf) & ~inf_zero
    rl = jnp.where(is_inf, il, rl)
    rh = jnp.where(is_inf, ih, rh)
    rl = jnp.where(any_nan, U32(0), rl)
    rh = jnp.where(any_nan, U32(0x7FF80000), rh)
    return make(rl, rh)


def f64_to_value(a) -> jax.Array:
    """Limbs -> jnp.float64 value for arithmetic.  Exact on CPU.  On this
    TPU the f64 type is double-f32 emulated: ~2^-48 relative precision AND
    f32 exponent range (|x| beyond ~1e38 overflows to inf, subnormals and
    -0 may flush) — the documented Float64 *arithmetic* precision boundary.
    Ordering, equality, movement, grouping and joining of Float64 columns
    never go through this path and are bit-exact everywhere."""
    sign = jnp.where(is_negative(a), -1.0, 1.0).astype(jnp.float64)
    e = ((hi(a) >> 20) & U32(0x7FF)).astype(jnp.int32)
    frac_hi = (hi(a) & U32(0xFFFFF)).astype(jnp.float64)
    frac = frac_hi * jnp.float64(2.0**32) + lo(a).astype(jnp.float64)
    normal = e > 0
    mant = jnp.where(normal, frac + jnp.float64(2.0**52), frac)
    exp = jnp.where(normal, e - 1075, -1074)
    val = sign * _scale_pow2(mant, exp)
    is_inf = (e == 0x7FF) & (frac == 0)
    val = jnp.where(is_inf, sign * jnp.float64(jnp.inf), val)
    val = jnp.where(f64_is_nan(a), jnp.float64(jnp.nan), val)
    return val


def f64_from_value(x) -> jax.Array:
    """jnp float64 value -> limbs.  Exact on CPU; ~2^-48 on TPU."""
    x = x.astype(jnp.float64)
    # arithmetic signbit: jnp.signbit bitcasts s64 (unsupported on this TPU)
    with jax.debug_infs(False):
        zero_sign_neg = (x < 0) | ((x == 0) & (jnp.float64(1.0) / x < 0))
    ax = jnp.abs(x)
    # arithmetic frexp (jnp.frexp bitcasts s64 — unsupported here): binary
    # search the exponent with exact power-of-two scaling.  r in [1, 2).
    r = jnp.where(ax > 0, ax, jnp.float64(1.0))
    e = jnp.zeros(x.shape, jnp.int32)
    for j in range(9, -1, -1):
        p = float(2.0 ** (2**j))
        big = r >= p
        r = jnp.where(big, r * jnp.float64(1.0 / p), r)
        e = e + jnp.where(big, jnp.int32(2**j), jnp.int32(0))
        small = r < float(2.0 ** (1 - 2**j))
        r = jnp.where(small, r * jnp.float64(p), r)
        e = e - jnp.where(small, jnp.int32(2**j), jnp.int32(0))
    m = r * jnp.float64(0.5)  # in [0.5, 1)
    e = e + 1  # ax = m * 2^e
    # normal numbers: biased exponent e + 1022, 52-bit fraction
    frac53 = m * jnp.float64(2.0**53)  # in [2^52, 2^53)
    frac_int_hi = jnp.floor(frac53 / jnp.float64(2.0**32))
    frac_int_lo = frac53 - frac_int_hi * jnp.float64(2.0**32)
    eb = (e + 1022).astype(jnp.int32)
    # clamp: subnormals -> 0 (engine-level precision boundary), inf/nan special
    subnormal = eb <= 0
    hi_ = (
        (zero_sign_neg.astype(U32) << 31)
        | (jnp.clip(eb, 0, 0x7FE).astype(U32) << 20)
        | (frac_int_hi.astype(U32) & U32(0xFFFFF))
    )
    lo_ = frac_int_lo.astype(U32)
    is_zero = ax == 0
    is_inf = jnp.isinf(x)
    is_nan = jnp.isnan(x)
    hi_ = jnp.where(is_zero | subnormal, (zero_sign_neg.astype(U32) << 31), hi_)
    lo_ = jnp.where(is_zero | subnormal, U32(0), lo_)
    hi_ = jnp.where(is_inf, (zero_sign_neg.astype(U32) << 31) | U32(0x7FF00000), hi_)
    lo_ = jnp.where(is_inf, U32(0), lo_)
    hi_ = jnp.where(is_nan, U32(0x7FF80000), hi_)
    lo_ = jnp.where(is_nan, U32(0), lo_)
    return make(lo_, hi_)


# ---------------------------------------------------------------------------
# int64 <-> float (for mean etc.)
# ---------------------------------------------------------------------------


def i64_to_float(a) -> jax.Array:
    """Signed limbs -> float64 (exact on CPU for |v| < 2^53)."""
    n = is_negative(a)
    ua = jnp.where(n[..., None], neg(a), a)
    v = hi(ua).astype(jnp.float64) * jnp.float64(2.0**32) + lo(ua).astype(jnp.float64)
    return jnp.where(n, -v, v)


def u64_to_float(a) -> jax.Array:
    return hi(a).astype(jnp.float64) * jnp.float64(2.0**32) + lo(a).astype(jnp.float64)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def tree_reduce(a, combine, identity_limbs):
    """Reduce (n, 2) limbs along axis 0 with a binary limb combine fn.
    n must be a power of two times 1 (we pad internally)."""
    n = a.shape[0]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = jnp.broadcast_to(jnp.asarray(identity_limbs, U32), (m - n, 2))
        a = jnp.concatenate([a, pad], axis=0)
    while a.shape[0] > 1:
        half = a.shape[0] // 2
        a = combine(a[:half], a[half:])
    return a[0]
