"""Decimal128/256/64/32 end-to-end: limb math, kernels, aggregation,
casts, sort/filter, parquet + IPC round-trips, pyarrow interop.

Reference parity targets: arrow-buffer/src/bigint/mod.rs (i256),
arrow-cast/src/cast/decimal.rs, parquet decimal physical mappings."""

import decimal as D
import io

import numpy as np
import pytest

import jax

import arrowtpu as at
from arrowtpu import ops, schema as st
from arrowtpu.core import limbs as lb
from arrowtpu.ops import aggregate as agg
from arrowtpu.ops import decimal as dec
from arrowtpu.ops import groupby as gb
from arrowtpu.ops.cast import cast
from arrowtpu.ops.take import take

pa = pytest.importorskip("pyarrow")


DT = st.Decimal128(20, 2)


def _col(vals, dtype=DT, validity=None):
    return at.primitive(vals, dtype,
                        validity=validity, length=len(vals))


def test_limb_roundtrip_and_math():
    ints = [0, 1, -1, 2**100, -(2**100), 10**38 - 1, -(10**38)]
    limbs = lb.split_ints(ints, 4)
    assert lb.join_ints(limbs) == ints
    import jax.numpy as jnp

    a = jnp.asarray(limbs)
    # add/sub/neg vs python
    s = lb.add(a, a)
    assert lb.join_ints(np.asarray(s)) == [_wrap128(2 * v) for v in ints]
    assert lb.join_ints(np.asarray(lb.neg(a))) == [_wrap128(-v) for v in ints]
    # mul vs python (wrapping)
    m = lb.mul_lo(a, a)
    assert lb.join_ints(np.asarray(m)) == [_wrap128(v * v) for v in ints]
    # signed comparison
    lt = np.asarray(lb.lt_signed(a, jnp.zeros_like(a)))
    assert lt.tolist() == [v < 0 for v in ints]
    # divmod by powers of ten
    q, _ = lb.divmod_pow10(a, 3)
    want = [abs(v) // 10**3 * (1 if v >= 0 else -1) for v in ints]  # trunc
    assert lb.join_ints(np.asarray(q)) == want


def _wrap128(v):
    m = 1 << 128
    u = v % m
    return u - m if u >= (1 << 127) else u


def test_arith_cmp_nulls():
    a = _col([D.Decimal("1.25"), D.Decimal("-3.50"), None,
              D.Decimal("123456789012345.99")],
             validity=np.array([1, 1, 0, 1], bool))
    b = _col([D.Decimal("0.75"), D.Decimal("1.00"),
              D.Decimal("2.00"), D.Decimal("-0.99")])
    assert ops.add(a, b).to_pylist() == [
        D.Decimal("2.00"), D.Decimal("-2.50"), None,
        D.Decimal("123456789012345.00")]
    assert ops.sub(a, b).to_pylist() == [
        D.Decimal("0.50"), D.Decimal("-4.50"), None,
        D.Decimal("123456789012346.98")]
    m = ops.mul(a, b)
    assert m.dtype.scale == 4
    assert m.to_pylist()[0] == D.Decimal("0.9375")
    assert ops.lt(a, b).to_pylist() == [False, True, None, False]
    assert ops.eq(a, a).to_pylist() == [True, True, None, True]
    # scalar operand
    assert ops.gt(a, D.Decimal("1.00")).to_pylist() == [True, False, None, True]


def test_mixed_scale_alignment():
    a = _col([D.Decimal("1.5")], st.Decimal128(10, 1))
    b = _col([D.Decimal("0.25")], st.Decimal128(10, 2))
    out = ops.add(a, b)
    assert out.to_pylist() == [D.Decimal("1.75")]
    assert out.dtype.scale == 2


def test_aggregates():
    vals = [D.Decimal("1.25"), D.Decimal("-3.50"), None, D.Decimal("9.99")]
    a = _col(vals, validity=np.array([1, 1, 0, 1], bool))
    assert agg.finalize(agg.sum_(a), DT) == D.Decimal("7.74")
    assert agg.finalize(agg.min_(a), DT) == D.Decimal("-3.50")
    assert agg.finalize(agg.max_(a), DT) == D.Decimal("9.99")


def test_groupby_sum_matches_python():
    rng = np.random.default_rng(7)
    n = 500
    keys = rng.integers(0, 7, n)
    amounts = [D.Decimal(int(v)).scaleb(-2)
               for v in rng.integers(-10**7, 10**7, n)]
    batch = at.record_batch({
        "k": at.primitive(keys.astype(np.int32), st.int32, length=n),
        "v": _col(amounts, st.Decimal128(38, 2)),
    })
    res = jax.jit(lambda b: gb.group_by(
        b, ["k"], [("v", "sum"), ("v", "min"), ("v", "max")]))(batch)
    got = dict(zip(res["k"].to_pylist(), res["sum_v"].to_pylist()))
    import collections

    want = collections.defaultdict(D.Decimal)
    for k, a in zip(keys, amounts):
        want[int(k)] += a
    assert got == dict(want)
    gmin = dict(zip(res["k"].to_pylist(), res["min_v"].to_pylist()))
    wmin = {}
    for k, a in zip(keys, amounts):
        wmin[int(k)] = min(wmin.get(int(k), a), a)
    assert gmin == wmin


def test_sort_filter_take():
    rng = np.random.default_rng(3)
    amounts = [D.Decimal(int(v)).scaleb(-2)
               for v in rng.integers(-10**6, 10**6, 300)]
    c = _col(amounts, st.Decimal128(38, 2))
    idx = ops.sort_to_indices(c)
    assert take(c, idx).to_pylist() == sorted(amounts)
    f = ops.filter_(c, ops.gt(c, D.Decimal(0)))
    assert sorted(f.to_pylist()) == sorted(a for a in amounts if a > 0)


def test_casts():
    a = _col([D.Decimal("1.25"), D.Decimal("-3.50"), D.Decimal("99.99")])
    assert cast(a, st.int64).to_pylist() == [1, -3, 99]
    r = cast(a, st.Decimal128(20, 4))
    assert r.to_pylist() == [D.Decimal("1.2500"), D.Decimal("-3.5000"),
                             D.Decimal("99.9900")]
    r2 = cast(r, st.Decimal64(18, 1))
    assert r2.to_pylist() == [D.Decimal("1.2"), D.Decimal("-3.5"),
                              D.Decimal("99.9")]
    f = cast(a, st.float64)
    assert f.to_pylist() == [1.25, -3.5, 99.99]
    s = cast(a, st.utf8)
    assert s.to_pylist() == ["1.25", "-3.50", "99.99"]
    back = cast(s, DT)
    assert back.to_pylist() == a.to_pylist()
    # int -> decimal
    i = at.primitive(np.array([3, -7], np.int64), st.int64, length=2)
    d = cast(i, st.Decimal128(20, 2))
    assert d.to_pylist() == [D.Decimal("3.00"), D.Decimal("-7.00")]
    # float -> decimal
    # 1.255 as binary f64 is 1.25499999..., so truncation yields 1.25;
    # 0.375 is exact and rounds half-away to 0.38
    fl = at.primitive(np.array([1.255, -2.5, 0.375]), st.float64, length=3)
    fd = cast(fl, st.Decimal128(20, 2))
    assert fd.to_pylist() == [D.Decimal("1.25"), D.Decimal("-2.50"),
                              D.Decimal("0.38")]
    # overflow -> null under safe semantics
    big = _col([D.Decimal("99999.99")], st.Decimal128(7, 2))
    out = cast(big, st.Decimal32(4, 2))
    assert out.to_pylist() == [None]


def test_precision_overflow_to_null_rescale():
    a = _col([D.Decimal("12.34"), D.Decimal("9999999999999999.99")],
             st.Decimal128(18, 2))
    out = cast(a, st.Decimal64(10, 4))
    assert out.to_pylist() == [D.Decimal("12.3400"), None]


VALS = [D.Decimal("1.25"), D.Decimal("-3.50"), None,
        D.Decimal("123456789012345.99")]


def test_parquet_roundtrip_and_pyarrow():
    from arrowtpu.formats import parquet as pq

    papq = pytest.importorskip("pyarrow.parquet")
    c = _col(VALS, validity=np.array([1, 1, 0, 1], bool))
    buf = pq.write_parquet([at.record_batch({"d": c})])
    r = pq.read_parquet(buf)
    assert r["d"].to_pylist() == VALS
    assert r["d"].dtype == DT
    # pyarrow reads ours
    t = papq.read_table(io.BytesIO(bytes(buf)))
    assert t.column("d").to_pylist() == VALS
    assert t.schema.field("d").type == pa.decimal128(20, 2)
    # we read pyarrow's (FLBA physical, minimal type_length)
    pt = pa.table({"d": pa.array(VALS, pa.decimal128(20, 2))})
    bio = io.BytesIO()
    papq.write_table(pt, bio, compression="none")
    r2 = pq.read_parquet(bio.getvalue())
    assert r2["d"].to_pylist() == VALS


def test_parquet_decimal64_int64_physical():
    from arrowtpu.formats import parquet as pq

    papq = pytest.importorskip("pyarrow.parquet")
    d64 = _col([D.Decimal("12.3456"), D.Decimal("-0.0001")],
               st.Decimal64(18, 4))
    buf = pq.write_parquet([at.record_batch({"e": d64})])
    assert pq.read_parquet(buf)["e"].to_pylist() == d64.to_pylist()
    t = papq.read_table(io.BytesIO(bytes(buf)))
    assert t.column("e").to_pylist() == d64.to_pylist()


def test_ipc_roundtrip():
    from arrowtpu.formats import ipc

    c = _col(VALS, validity=np.array([1, 1, 0, 1], bool))
    b = at.record_batch({"d": c})
    buf = ipc.write_stream([b])
    out = ipc.read_stream(buf)[0]
    assert out["d"].to_pylist() == VALS
    assert out["d"].dtype == DT


def test_ipc_pyarrow_interop():
    from arrowtpu.formats import ipc

    c = _col(VALS, validity=np.array([1, 1, 0, 1], bool))
    buf = ipc.write_stream([at.record_batch({"d": c})])
    with pa.ipc.open_stream(io.BytesIO(bytes(buf))) as rd:
        t = rd.read_all()
    assert t.column("d").to_pylist() == VALS
    # and back: pyarrow stream -> ours
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        for batch in t.to_batches():
            w.write_batch(batch)
    out = ipc.read_stream(sink.getvalue())[0]
    assert out["d"].to_pylist() == VALS


def test_pyarrow_bridge():
    from arrowtpu.interop import pyarrow_bridge as pb

    c = _col(VALS, validity=np.array([1, 1, 0, 1], bool))
    arr = pb.to_pyarrow(c)
    assert arr.to_pylist() == VALS
    assert arr.type == pa.decimal128(20, 2)
    back = pb.column_from_pa(arr)
    assert back.to_pylist() == VALS
    assert back.dtype == DT


def test_dtype_parse():
    from arrowtpu.dtype_parse import parse_datatype

    assert parse_datatype("decimal128(20,2)") == DT
    assert parse_datatype("decimal64(18, 4)") == st.Decimal64(18, 4)
    assert parse_datatype("decimal32(9,2)") == st.Decimal32(9, 2)
