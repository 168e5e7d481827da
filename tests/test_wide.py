"""Limb-pair 64-bit math (core/wide.py) vs numpy int64/float64 oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from arrowtpu.core import wide


def rand_i64(rng, n, full_range=True):
    if full_range:
        return rng.integers(-(2**63), 2**63 - 1, n, dtype=np.int64)
    return rng.integers(-(2**40), 2**40, n, dtype=np.int64)


def dev(arr):
    return jnp.asarray(wide.split_numpy(arr))


def back(limbs, dtype=np.int64):
    return wide.join_numpy(np.asarray(limbs), dtype)


class TestIntLimbs:
    def test_roundtrip(self, rng):
        a = rand_i64(rng, 1000)
        np.testing.assert_array_equal(back(dev(a)), a)

    def test_add_sub_mul_wrap(self, rng):
        a, b = rand_i64(rng, 1000), rand_i64(rng, 1000)
        with np.errstate(over="ignore"):
            np.testing.assert_array_equal(back(wide.add(dev(a), dev(b))), a + b)
            np.testing.assert_array_equal(back(wide.sub(dev(a), dev(b))), a - b)
            np.testing.assert_array_equal(back(wide.mul(dev(a), dev(b))), a * b)
            np.testing.assert_array_equal(back(wide.neg(dev(a))), -a)

    def test_compare(self, rng):
        a, b = rand_i64(rng, 1000), rand_i64(rng, 1000)
        np.testing.assert_array_equal(np.asarray(wide.lt_signed(dev(a), dev(b))), a < b)
        np.testing.assert_array_equal(np.asarray(wide.eq(dev(a), dev(a))), np.ones(1000, bool))
        ua = a.view(np.uint64)
        ub = b.view(np.uint64)
        np.testing.assert_array_equal(
            np.asarray(wide.lt_unsigned(dev(a), dev(b))), ua < ub
        )

    def test_divmod_signed_trunc(self, rng):
        a = rand_i64(rng, 300)
        b = rand_i64(rng, 300, full_range=False)
        b[b == 0] = 3
        b[:10] = np.array([1, -1, 2, -2, 7, -7, 10**12, -(10**12), 3, 5])
        q, r = wide.divmod_signed(dev(a), dev(b))
        # C truncation semantics
        expect_q = np.trunc(a / b.astype(np.float64))  # may be inexact for big
        small = (np.abs(a) < 2**52)
        qq = back(q)
        rr = back(r)
        # exact check: a == q*b + r, |r| < |b|, sign(r) == sign(a) or r==0
        with np.errstate(over="ignore"):
            np.testing.assert_array_equal(qq * b + rr, a)
        assert (np.abs(rr) < np.abs(b)).all()
        assert ((rr == 0) | (np.sign(rr) == np.sign(a))).all()

    def test_div_by_zero_is_zero(self):
        a = dev(np.array([5, -5], np.int64))
        b = dev(np.array([0, 0], np.int64))
        q, r = wide.divmod_signed(a, b)
        assert back(q).tolist() == [0, 0]

    def test_shifts(self, rng):
        a = rand_i64(rng, 200)
        k = rng.integers(0, 64, 200).astype(np.uint32)
        ua = a.view(np.uint64)
        np.testing.assert_array_equal(
            back(wide.shl(dev(a), jnp.asarray(k)), np.uint64), ua << k.astype(np.uint64)
        )
        np.testing.assert_array_equal(
            back(wide.shr(dev(a), jnp.asarray(k)), np.uint64), ua >> k.astype(np.uint64)
        )


class TestFloatLimbs:
    def special(self):
        return np.array(
            [0.0, -0.0, 1.0, -1.0, 0.1, np.pi, 1e300, -1e300, 1e-300,
             np.inf, -np.inf, np.nan, 1.5e-323, 2**-1022],
            np.float64,
        )

    def test_total_order_planes_match_rust_total_cmp(self, rng):
        vals = np.concatenate([rng.normal(size=500) * 1e10, self.special()])
        limbs = dev(vals)
        ph, pl = wide.f64_total_order_planes(limbs)
        key = (np.asarray(ph).astype(np.uint64) << 32) | np.asarray(pl).astype(np.uint64)
        order = np.argsort(key, kind="stable")
        # numpy total order oracle: sort by transformed bits
        b = vals.view(np.int64)
        tkey = np.where(b < 0, ~b, b ^ np.int64(-0x8000000000000000)).astype(np.uint64)
        expect = np.argsort(tkey, kind="stable")
        np.testing.assert_array_equal(order, expect)

    def test_ieee_cmp(self, rng):
        a = np.concatenate([rng.normal(size=200), self.special()])
        b = np.concatenate([rng.normal(size=200), self.special()[::-1]])
        np.testing.assert_array_equal(
            np.asarray(wide.f64_ieee_eq(dev(a), dev(b))), a == b
        )
        np.testing.assert_array_equal(
            np.asarray(wide.f64_ieee_lt(dev(a), dev(b))), a < b
        )

    def test_value_roundtrip_exact_on_cpu(self, rng):
        vals = np.concatenate([rng.normal(size=500) * 1e18, self.special()[:-2]])
        v = wide.f64_to_value(dev(vals))
        np.testing.assert_array_equal(np.asarray(v), vals)
        rt = wide.f64_from_value(v)
        got = back(rt, np.float64)
        # subnormals clamp to zero (documented); compare the rest bitwise
        normal = (np.abs(vals) >= 2**-1022) | (vals == 0) | ~np.isfinite(vals)
        np.testing.assert_array_equal(
            got[normal].view(np.uint64), vals[normal].view(np.uint64)
        )

    def test_i64_to_float(self, rng):
        a = rng.integers(-(2**52), 2**52, 500, dtype=np.int64)
        np.testing.assert_array_equal(np.asarray(wide.i64_to_float(dev(a))), a.astype(np.float64))


class TestTreeReduce:
    def test_sum(self, rng):
        a = rand_i64(rng, 1000, full_range=False)
        s = wide.tree_reduce(dev(a), wide.add, wide.from_scalar(0))
        assert back(s[None])[0] == a.sum()
