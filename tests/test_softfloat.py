"""Bit-exactness of the limb-based IEEE754 softfloat (core/wide.py
f64_add_exact / f64_sub_exact / f64_mul_exact) against numpy's native
float64 — including cancellation, round-to-even ties, subnormals, signed
zeros, infinities, NaN and overflow.  The reference gets these semantics
from hardware f64 (e.g. arrow-arith/src/numeric.rs); here they are exact
integer limb arithmetic so results match on any backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrowtpu.core import wide as wd


def _check(a, b, op):
    la = jnp.asarray(wd.split_numpy(a))
    lb = jnp.asarray(wd.split_numpy(b))
    with np.errstate(all="ignore"):
        if op == "add":
            out, want = wd.f64_add_exact(la, lb), a + b
        elif op == "sub":
            out, want = wd.f64_sub_exact(la, lb), a - b
        else:
            out, want = wd.f64_mul_exact(la, lb), a * b
    got = wd.join_numpy(np.asarray(out), np.float64)
    nan_ok = np.isnan(got) & np.isnan(want)
    ok = (got.view(np.uint64) == want.view(np.uint64)) | nan_ok
    assert ok.all(), (op, a[~ok][:3], b[~ok][:3], got[~ok][:3], want[~ok][:3])


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_random_wide_range(rng, op):
    n = 50_000
    a = rng.standard_normal(n) * (10.0 ** rng.integers(-300, 300, n))
    b = rng.standard_normal(n) * (10.0 ** rng.integers(-300, 300, n))
    _check(a, b, op)


def test_cancellation(rng):
    n = 50_000
    a = rng.standard_normal(n)
    b = -(a * (1 + rng.standard_normal(n) * 2.0**-50))
    _check(a, b, "add")


def test_round_to_even_ties(rng):
    n = 50_000
    a = rng.integers(-2**52, 2**52, n).astype(np.float64)
    b = (rng.integers(0, 4, n) * 0.25).astype(np.float64)
    _check(a, b, "add")
    _check(a, b, "mul")


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_specials_cross_product(op):
    sp = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324, -5e-324,
                   1e-310, -1e-310, 2.2250738585072014e-308,
                   1.7976931348623157e308, -1.7976931348623157e308,
                   1.0, -1.0, 2.0**-1074, 2.0**-1022], np.float64)
    A, B = np.meshgrid(sp, sp)
    _check(A.ravel(), B.ravel(), op)


def test_subnormal_arithmetic(rng):
    n = 50_000
    s1 = rng.integers(1, 2**52, n).astype(np.uint64).view(np.float64)
    s2 = rng.integers(1, 2**52, n).astype(np.uint64).view(np.float64)
    _check(s1, s2, "add")
    _check(s1, -s2, "add")
    sm = rng.standard_normal(n) * 1e-160
    sm2 = rng.standard_normal(n) * 1e-160
    _check(sm, sm2, "mul")  # subnormal results (gradual underflow)
    ov = rng.standard_normal(n) * 1e200
    _check(ov, ov, "mul")   # overflow to inf
