"""Decimal kernels: arithmetic, comparison, rescale, casts, aggregation.

Reference capability mirror:
  * arrow-arith decimal paths + arrow-buffer/src/bigint/mod.rs:63 (i256)
  * arrow-cast/src/cast/decimal.rs (decimal<->decimal/int/float/string)

TPU-native design: a decimal column is (capacity, n_limbs) uint32
two's-complement limbs (core/limbs.py).  All kernels below are branchless
elementwise limb math on u32 lanes that XLA fuses; nothing here touches
the host.  Precision overflow follows the reference's "safe" semantics:
results that exceed the target precision become NULL (cast) or raise on
request (checked variants).
"""

from __future__ import annotations

import decimal as _pydec

import numpy as np
import jax.numpy as jnp

from .. import schema as st
from ..core import bitmap as bm
from ..core import column as col
from ..core import limbs as lb


def _dec_info(c):
    nl = st.decimal_limbs(c.dtype)
    if nl is None:
        raise st.ComputeError(f"not a decimal column: {c.dtype}")
    return nl, c.dtype.precision, c.dtype.scale


def _pow10_limbs(nl: int, k: int) -> int:
    """Limb count that holds an nl-limb value scaled by 10**k exactly."""
    import math
    extra_bits = math.ceil(k * math.log2(10)) if k else 0
    return nl + (extra_bits + 31) // 32


def _align(a: col.PrimitiveColumn, b) -> tuple:
    """Bring two decimal operands (column or python Decimal/int scalar) to a
    common (n_limbs, scale); returns (limbs_a, limbs_b, n_limbs, scale)."""
    nl_a, _, s_a = _dec_info(a)
    if isinstance(b, col.PrimitiveColumn):
        nl_b, _, s_b = _dec_info(b)
        vb = b.values
    else:
        s_b = s_a
        nl_b = nl_a
        if isinstance(b, _pydec.Decimal):
            with _pydec.localcontext(_pydec.Context(prec=80)):
                u = int(b.scaleb(s_a).to_integral_value(
                    rounding=_pydec.ROUND_HALF_UP))
        else:
            u = int(b) * 10 ** s_a
        vb = jnp.broadcast_to(
            jnp.asarray(lb.from_scalar(u, nl_a)), a.values.shape)
    nl = max(nl_a, nl_b)
    s = max(s_a, s_b)
    # widen enough that the 10^k scale-up cannot wrap (ADVICE r2: a value
    # valid at the source precision could wrap at nl and pass the bound
    # check as a wrong non-null): 10^k needs ceil(k*log2(10))/32 limbs
    k = max(s - s_a, s - s_b, 0)
    nl_w = _pow10_limbs(nl, k)
    va = lb.widen(a.values, nl_w)
    vb = lb.widen(vb, nl_w)
    if s > s_a:
        va = lb.mul_pow10(va, s - s_a)
    if s > s_b:
        vb = lb.mul_pow10(vb, s - s_b)
    return va, vb, nl_w, s


def _out(base, values, validity, dtype):
    return col.PrimitiveColumn(values, validity, base.length, dtype)


def _union_validity(a, b):
    return bm.union(
        a.validity if isinstance(a, col.Column) else None,
        b.validity if isinstance(b, col.Column) else None,
    )


def _addsub_result(a, b, raw, nl_w, s):
    """Narrow an exact nl_w-limb sum/difference to the result type
    (reference semantics: same width family as the inputs, precision
    max(p1-s1, p2-s2) + s + 1 capped; overflow -> NULL)."""
    nl_a, p_a, s_a = _dec_info(a)
    if isinstance(b, col.PrimitiveColumn):
        nl_b, p_b, s_b = _dec_info(b)
    else:
        nl_b, p_b, s_b = nl_a, p_a, s_a
    nl_res = max(nl_a, nl_b)
    prec = min(st.MAX_DECIMAL_PRECISION[nl_res],
               max(p_a - s_a, p_b - s_b) + s + 1)
    ok = lb.fits_in(raw, nl_res) if nl_res < nl_w else jnp.ones(
        raw.shape[:-1], jnp.bool_)
    bound = jnp.asarray(lb.from_scalar(10 ** prec, nl_w))
    mag = jnp.where(lb.is_negative(raw)[..., None], lb.neg(raw), raw)
    ok = ok & lb.lt_unsigned(mag, jnp.broadcast_to(bound, mag.shape))
    validity = bm.union(_union_validity(a, b), bm.pack(ok))
    return _out(a, lb.narrow(raw, nl_res), validity,
                st.decimal_for_limbs(nl_res, prec, s))


def add(a, b) -> col.PrimitiveColumn:
    va, vb, nl_w, s = _align(a, b)
    return _addsub_result(a, b, lb.add(va, vb), nl_w, s)


def sub(a, b) -> col.PrimitiveColumn:
    va, vb, nl_w, s = _align(a, b)
    return _addsub_result(a, b, lb.sub(va, vb), nl_w, s)


def mul(a, b) -> col.PrimitiveColumn:
    """Product; result scale = s_a + s_b (reference decimal mul semantics)."""
    nl_a, p_a, s_a = _dec_info(a)
    if isinstance(b, col.PrimitiveColumn):
        nl_b, p_b, s_b = _dec_info(b)
        vb = b.values
    else:
        nl_b, p_b, s_b = nl_a, p_a, 0
        vb = jnp.broadcast_to(
            jnp.asarray(lb.from_scalar(int(b), nl_a)), a.values.shape)
    nl = max(nl_a, nl_b)
    # reference result-type rule: p1 + p2 + 1, capped
    prec = min(st.MAX_DECIMAL_PRECISION[nl], p_a + p_b + 1)
    va = lb.widen(a.values, nl)
    vb = lb.widen(vb, nl)
    return _out(a, lb.mul_lo(va, vb), _union_validity(a, b),
                st.decimal_for_limbs(nl, prec, s_a + s_b))


def _cmp_bools(a, b, op):
    va, vb, _, _ = _align(a, b)
    if op == "eq":
        return lb.eq(va, vb)
    if op == "lt":
        return lb.lt_signed(va, vb)
    if op == "gt":
        return lb.lt_signed(vb, va)
    if op == "neq":
        return ~lb.eq(va, vb)
    if op == "lt_eq":
        return ~lb.lt_signed(vb, va)
    return ~lb.lt_signed(va, vb)  # gt_eq


def cmp(a, b, op: str) -> col.BooleanColumn:
    bools = _cmp_bools(a, b, op)
    return col.BooleanColumn(bm.pack(bools), _union_validity(a, b), a.length)


def neg(a) -> col.PrimitiveColumn:
    return _out(a, lb.neg(a.values), a.validity, a.dtype)


def abs_(a) -> col.PrimitiveColumn:
    v = jnp.where(lb.is_negative(a.values)[..., None], lb.neg(a.values),
                  a.values)
    return _out(a, v, a.validity, a.dtype)


# ---------------------------------------------------------------------------
# casts (reference arrow-cast/src/cast/decimal.rs)
# ---------------------------------------------------------------------------


def rescale(a, dtype: st.DataType, safe: bool = True) -> col.PrimitiveColumn:
    """decimal -> decimal cast: change (precision, scale, width).
    Values out of target precision become NULL when safe, else raise at
    trace time is impossible — unsafe marks them with wrapped values."""
    nl_in, _, s_in = _dec_info(a)
    nl_out = st.decimal_limbs(dtype)
    s_out = dtype.scale
    nl_w = _pow10_limbs(max(nl_in, nl_out), max(s_out - s_in, 0))
    v = lb.widen(a.values, nl_w)
    if s_out > s_in:
        v = lb.mul_pow10(v, s_out - s_in)
    elif s_out < s_in:
        v, _r = lb.divmod_pow10(v, s_in - s_out)
    ok = lb.fits_in(v, nl_out) if nl_out < nl_w else jnp.ones(
        v.shape[:-1], jnp.bool_)
    # precision bound: |v| < 10^precision
    bound = jnp.asarray(lb.from_scalar(10 ** dtype.precision, nl_w))
    mag = jnp.where(lb.is_negative(v)[..., None], lb.neg(v), v)
    ok = ok & lb.lt_unsigned(mag, jnp.broadcast_to(bound, mag.shape))
    out_v = lb.narrow(v, nl_out) if nl_out <= nl_w else lb.widen(v, nl_out)
    validity = a.validity
    if safe:
        validity = bm.union(validity, bm.pack(ok))
    return col.PrimitiveColumn(out_v, validity, a.length, dtype)


def from_int(c: col.PrimitiveColumn, dtype: st.DataType) -> col.PrimitiveColumn:
    """int32/int64 column -> decimal with dtype's scale."""
    nl = st.decimal_limbs(dtype)
    if c.wide is not None:
        v = lb.widen(c.values, nl)  # (cap,2) limbs sign-extended
    else:
        x = c.values.astype(jnp.int32)
        neg_ = x < 0
        v = lb.widen(jnp.stack([x.astype(jnp.uint32)], axis=-1), nl)
        # widen() sign-extends from limb sign bit — already correct for i32
        del neg_
    v = lb.mul_pow10(v, dtype.scale)
    return col.PrimitiveColumn(v, c.validity, c.length, dtype)


def to_int(c: col.PrimitiveColumn, dtype: st.DataType,
           safe: bool = True) -> col.PrimitiveColumn:
    """decimal -> int64 (truncating toward zero, reference cast semantics)."""
    nl, _, s = _dec_info(c)
    v, _ = lb.divmod_pow10(c.values, s)
    ok = lb.fits_in(v, 2) if nl > 2 else jnp.ones(v.shape[:-1], jnp.bool_)
    out = lb.widen(v, 2) if nl < 2 else lb.narrow(v, 2)
    validity = c.validity
    if safe:
        validity = bm.union(validity, bm.pack(ok))
    return col.PrimitiveColumn(out, validity, c.length, dtype)


def to_float(c: col.PrimitiveColumn) -> col.PrimitiveColumn:
    """decimal -> float64 (through the platform f64 bridge; exact on CPU,
    ~2^-48 relative on this TPU — documented in core/wide.py)."""
    from ..core import wide as wd

    nl, _, s = _dec_info(c)
    f = lb.to_float(c.values) / float(10 ** s)
    return col.PrimitiveColumn(wd.f64_from_value(f), c.validity, c.length,
                               st.float64)


def from_float(c: col.PrimitiveColumn, dtype: st.DataType) -> col.PrimitiveColumn:
    """float64/32 -> decimal (round-half-away, reference cast behavior is
    round-half-even via rust `round`; we document round-half-away)."""
    from ..core import wide as wd

    nl = st.decimal_limbs(dtype)
    if c.wide == "f64":
        f = wd.f64_to_value(c.values)
    else:
        f = c.values.astype(jnp.float64)
    scaled = f * float(10 ** dtype.scale)
    r = jnp.where(scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5))
    # split |r| into 32-bit chunks via repeated fmod/fdiv (exact below 2^96)
    negm = r < 0
    mag = jnp.abs(r)
    limbs_ = []
    for _ in range(nl):
        limbs_.append(jnp.mod(mag, float(_B32)).astype(jnp.uint32))
        mag = jnp.floor(mag / float(_B32))
    v = jnp.stack(limbs_, axis=-1)
    v = jnp.where(negm[..., None], lb.neg(v), v)
    return col.PrimitiveColumn(v, c.validity, c.length, dtype)


_B32 = 1 << 32


def to_string(c: col.PrimitiveColumn) -> col.Column:
    """decimal -> utf8 (host-side formatting; display path)."""
    vals = c.to_pylist()
    return col.string_view([None if v is None else str(v) for v in vals])


def from_string(c, dtype: st.DataType) -> col.PrimitiveColumn:
    """utf8 -> decimal (host-side parse; ingest path)."""
    texts = c.to_pylist()
    out, valid = [], []
    for t in texts:
        if t is None:
            out.append(0)
            valid.append(False)
            continue
        try:
            with _pydec.localcontext(_pydec.Context(prec=80)):
                d = _pydec.Decimal(t).scaleb(dtype.scale)
            out.append(int(d.to_integral_value(rounding=_pydec.ROUND_HALF_UP)))
            valid.append(True)
        except _pydec.InvalidOperation:
            out.append(0)
            valid.append(False)
    nl = st.decimal_limbs(dtype)
    limbs_np = lb.split_ints(out, nl)
    return col.primitive(limbs_np, dtype,
                         validity=np.asarray(valid, bool), length=len(out))


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


def sum_(c: col.PrimitiveColumn):
    """Whole-column sum -> (scalar limbs, valid_count). Exact wrapping
    N-limb addition via log-tree reduction."""
    nl, _, s = _dec_info(c)
    ok = c.valid_bool()
    v = jnp.where(ok[..., None], c.values, jnp.zeros_like(c.values))

    # pairwise tree reduction with carries (lax.reduce needs a monoid on
    # stacked limbs; fori over log2 halvings keeps it compiled + exact)
    n = v.shape[0]
    while n > 1:
        half = (n + 1) // 2
        top = v[half: n]
        pad = jnp.zeros((half - top.shape[0], nl), jnp.uint32)
        v = lb.add(v[:half], jnp.concatenate([top, pad], axis=0))
        n = half
    return v[0], jnp.sum(ok.astype(jnp.int32))


def min_max(c: col.PrimitiveColumn, is_min: bool):
    nl, _, _ = _dec_info(c)
    ok = c.valid_bool()
    # sign-flip top limb -> unsigned order; identity = max/min unsigned
    key = c.values.at[..., -1].set(c.values[..., -1] ^ jnp.uint32(0x80000000))
    ident = jnp.full((nl,), 0xFFFFFFFF if is_min else 0, jnp.uint32)
    key = jnp.where(ok[..., None], key, jnp.broadcast_to(ident, key.shape))
    n = key.shape[0]
    while n > 1:
        half = (n + 1) // 2
        top = key[half: n]
        pad = jnp.broadcast_to(ident, (half - top.shape[0], nl))
        other = jnp.concatenate([top, pad], axis=0)
        lt = lb.lt_unsigned(key[:half], other)
        pick_first = lt if is_min else ~lt
        key = jnp.where(pick_first[..., None], key[:half], other)
        n = half
    best = key[0].at[-1].set(key[0][-1] ^ jnp.uint32(0x80000000))
    return best, jnp.any(ok)
