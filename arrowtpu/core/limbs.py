"""Generic N-limb two's-complement integers on uint32 lanes.

The TPU has no 128/256-bit integer types (the reference uses native
`i128` and a software `i256`, arrow-buffer/src/bigint/mod.rs:63).  The
TPU-native representation is a (..., N) little-endian uint32 limb array:
movement ops stream native u32 lanes at full HBM bandwidth, and the
arithmetic below is explicit carry math on the VPU that XLA fuses.

Decimal128 columns use N=4, Decimal256 uses N=8 (core/column.py).  All
ops are elementwise over the leading axes.  Signedness: two's complement;
the sign lives in bit 31 of the top limb.

Reference semantics: arrow-buffer/src/bigint/mod.rs (i256 add/sub/mul,
checked variants), arrow-data decimal validation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32
_B = 1 << 32


# ---------------------------------------------------------------------------
# host <-> limb conversion (exact, via python ints)
# ---------------------------------------------------------------------------


def split_ints(values, n_limbs: int) -> np.ndarray:
    """Iterable of python ints (or None -> 0) -> (n, n_limbs) uint32,
    two's complement little-endian."""
    out = np.zeros((len(values), n_limbs), np.uint32)
    mask_bits = (1 << (32 * n_limbs)) - 1
    for i, v in enumerate(values):
        u = (int(v) if v is not None else 0) & mask_bits
        for j in range(n_limbs):
            out[i, j] = (u >> (32 * j)) & 0xFFFFFFFF
    return out


def join_ints(limbs: np.ndarray) -> list:
    """(n, N) uint32 -> list of signed python ints."""
    limbs = np.asarray(limbs, np.uint32)
    n, nl = limbs.shape
    half = 1 << (32 * nl - 1)
    full = 1 << (32 * nl)
    out = []
    for i in range(n):
        u = 0
        for j in range(nl - 1, -1, -1):
            u = (u << 32) | int(limbs[i, j])
        out.append(u - full if u >= half else u)
    return out


def from_scalar(v: int, n_limbs: int) -> np.ndarray:
    return split_ints([v], n_limbs)[0]


# ---------------------------------------------------------------------------
# arithmetic
# ---------------------------------------------------------------------------


def add(a, b):
    """(..., N) + (..., N) wrapping two's-complement add."""
    nl = a.shape[-1]
    outs = []
    carry = None
    for j in range(nl):
        s = a[..., j] + b[..., j]
        if carry is None:
            c = (s < a[..., j]).astype(U32)
        else:
            s2 = s + carry
            c = ((s < a[..., j]) | (s2 < s)).astype(U32)
            s = s2
        outs.append(s)
        carry = c
    return jnp.stack(outs, axis=-1)


def neg(a):
    """Two's-complement negate."""
    nl = a.shape[-1]
    inv = ~a
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return add(inv, one)


def sub(a, b):
    return add(a, neg(b))


def is_negative(a):
    return (a[..., -1] >> 31) == 1


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def lt_unsigned(a, b):
    """Unsigned <, comparing limbs high -> low."""
    nl = a.shape[-1]
    lt = a[..., 0] < b[..., 0]
    for j in range(1, nl):
        lt = jnp.where(a[..., j] == b[..., j], lt, a[..., j] < b[..., j])
    return lt


def lt_signed(a, b):
    # flip sign bit of the top limb -> unsigned order == signed order
    fa = a.at[..., -1].set(a[..., -1] ^ U32(0x80000000))
    fb = b.at[..., -1].set(b[..., -1] ^ U32(0x80000000))
    return lt_unsigned(fa, fb)


def _mul32x32(a32, b32):
    """u32*u32 -> (lo, hi) u32 via 16-bit half products (VPU has no u64)."""
    a_lo = a32 & U32(0xFFFF)
    a_hi = a32 >> 16
    b_lo = b32 & U32(0xFFFF)
    b_hi = b32 >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> 16) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
    lo = (ll & U32(0xFFFF)) | (mid << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return lo, hi


def mul_lo(a, b):
    """Low-N-limb product (wrapping), schoolbook on 32x32->64 partials.
    Matches i256 wrapping_mul truncation (bigint/mod.rs)."""
    nl = a.shape[-1]
    acc = jnp.zeros(a.shape, U32)
    for i in range(nl):
        # partial = a * b[i], shifted i limbs; accumulate with carries
        carry = jnp.zeros(a.shape[:-1], U32)
        hi_prev = jnp.zeros(a.shape[:-1], U32)
        for j in range(nl - i):
            lo, hi = _mul32x32(a[..., j], b[..., i])
            k = i + j
            s1 = acc[..., k] + lo
            c1 = (s1 < lo).astype(U32)
            s2 = s1 + hi_prev
            c2 = (s2 < s1).astype(U32)
            s3 = s2 + carry
            c3 = (s3 < s2).astype(U32)
            acc = acc.at[..., k].set(s3)
            carry = c1 + c2 + c3
            hi_prev = hi
    return acc


def mul_small(a, m: int):
    """Multiply by a u32 constant."""
    nl = a.shape[-1]
    m32 = U32(m)
    outs = []
    carry = jnp.zeros(a.shape[:-1], U32)
    for j in range(nl):
        lo, hi = _mul32x32(a[..., j], jnp.broadcast_to(m32, a.shape[:-1]))
        s = lo + carry
        c = (s < lo).astype(U32)
        outs.append(s)
        carry = hi + c
    return jnp.stack(outs, axis=-1)


def divmod_small_unsigned(a, d: int):
    """(a_unsigned // d, a_unsigned % d) for u32 divisor d.

    Long division high->low; each step divides (rem << 32 | limb) by d.
    The 64/32 step uses float64-free integer halving: we split the 64-bit
    dividend into 2x32 and do two 48/32 steps via f32-safe 16-bit chunks.
    Simpler and exact: process 16 bits at a time (rem < d < 2^32, chunk
    dividend < 2^48 -> fits in u64 emulated as two u32? no).  We instead
    divide 16-bit chunks: rem' = rem*2^16 + chunk, with rem' < 2^48.
    To stay in u32 we use the identity with d < 2^32: maintain the
    remainder in TWO u32 limbs and subtract d*q with q found 16 bits at a
    time by binary search... too heavy.  Pragmatic: require d < 2^16 and
    process 16-bit chunks (rem < d < 2^16 so rem*2^16+chunk < 2^32 fits
    u32).  Rescale by 10^k is done as repeated /10000 + /rest, all < 2^16.
    """
    assert 0 < d < (1 << 16), "divmod_small_unsigned requires d < 2^16"
    nl = a.shape[-1]
    d32 = U32(d)
    rem = jnp.zeros(a.shape[:-1], U32)
    qs = []
    for j in range(nl - 1, -1, -1):
        limb = a[..., j]
        hi16 = limb >> 16
        lo16 = limb & U32(0xFFFF)
        cur = (rem << 16) | hi16          # < d*2^16 <= 2^32-2^16: fits
        q_hi = cur // d32
        rem = cur - q_hi * d32
        cur = (rem << 16) | lo16
        q_lo = cur // d32
        rem = cur - q_lo * d32
        qs.append((q_hi << 16) | q_lo)
    q = jnp.stack(qs[::-1], axis=-1)
    return q, rem


def divmod_pow10(a, k: int):
    """Signed divide by 10**k, truncating toward zero. Returns (q, r_u32)
    where r is the magnitude remainder (only exact for k <= 4 per step;
    larger k chains steps, remainder composed)."""
    if k == 0:
        return a, jnp.zeros(a.shape[:-1], U32)
    negm = is_negative(a)
    mag = jnp.where(negm[..., None], neg(a), a)
    rem_total = jnp.zeros(a.shape[:-1], U32)
    mult = 1
    kk = k
    while kk > 0:
        step = min(kk, 4)
        d = 10 ** step
        mag, r = divmod_small_unsigned(mag, d)
        rem_total = rem_total + r * U32(mult)
        mult *= d
        kk -= step
    q = jnp.where(negm[..., None], neg(mag), mag)
    return q, rem_total


def mul_pow10(a, k: int):
    """Multiply by 10**k (wrapping)."""
    out = a
    kk = k
    while kk > 0:
        step = min(kk, 9)
        out = mul_small(out, 10 ** step)
        kk -= step
    return out


# ---------------------------------------------------------------------------
# width conversion
# ---------------------------------------------------------------------------


def widen(a, n_limbs: int):
    """Sign-extend (..., M) -> (..., n_limbs)."""
    m = a.shape[-1]
    if m == n_limbs:
        return a
    assert m < n_limbs
    ext = jnp.where(is_negative(a), U32(0xFFFFFFFF), U32(0))
    pads = jnp.broadcast_to(ext[..., None], a.shape[:-1] + (n_limbs - m,))
    return jnp.concatenate([a, pads], axis=-1)


def narrow(a, n_limbs: int):
    """Truncate (..., M) -> (..., n_limbs) low limbs (wrapping)."""
    return a[..., :n_limbs]


def fits_in(a, n_limbs: int):
    """True where the signed value is representable in n_limbs limbs."""
    top = a[..., n_limbs:]
    sign = (a[..., n_limbs - 1] >> 31) == 1
    want = jnp.where(sign, U32(0xFFFFFFFF), U32(0))
    return jnp.all(top == want[..., None], axis=-1)


def to_float(a):
    """Signed N-limb -> float64-ish value (via per-limb scaling; exact to
    f64 precision on CPU, platform-emulated f64 on TPU)."""
    negm = is_negative(a)
    mag = jnp.where(negm[..., None], neg(a), a)
    nl = a.shape[-1]
    acc = jnp.zeros(a.shape[:-1], jnp.float64)
    for j in range(nl):
        acc = acc + mag[..., j].astype(jnp.float64) * float(2 ** (32 * j))
    return jnp.where(negm, -acc, acc)


def sort_planes(a):
    """Order-preserving u32 planes (most-significant first) for the signed
    value: flip the top limb's sign bit.  Feed to rowformat/sort."""
    nl = a.shape[-1]
    planes = [a[..., nl - 1] ^ U32(0x80000000)]
    for j in range(nl - 2, -1, -1):
        planes.append(a[..., j])
    return planes
