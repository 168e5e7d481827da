"""M1 elementwise plane, validated bit-exact against pyarrow.compute
(the reference's Rust kernels share semantics with pyarrow's C++ ones for
these ops; reference behaviors: arrow-arith/src/{numeric,boolean,arity}.rs,
arrow-ord/src/cmp.rs)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrowtpu as at
from arrowtpu import ops


def make_pair(rng, n=1000, null_density=0.3, dtype=np.int64, hi=1000):
    def one():
        vals = rng.integers(-hi, hi, n).astype(dtype)
        data = [
            None if rng.random() < null_density else v.item() for v in vals
        ]
        return data

    return one(), one()


def check_vs_pyarrow(ours_col, pa_result):
    assert ours_col.to_pylist() == pa_result.to_pylist()


class TestArith:
    @pytest.mark.parametrize("opname", ["add", "subtract", "multiply"])
    def test_int_null_propagation(self, rng, opname):
        a, b = make_pair(rng)
        ours = {"add": ops.add, "subtract": ops.sub, "multiply": ops.mul}[opname](
            at.from_pylist(a), at.from_pylist(b)
        )
        theirs = getattr(pc, opname)(pa.array(a), pa.array(b))
        check_vs_pyarrow(ours, theirs)

    def test_float_div(self, rng):
        a = [1.5, None, -3.0, 10.0]
        b = [0.5, 2.0, None, 4.0]
        ours = ops.div(at.from_pylist(a), at.from_pylist(b))
        check_vs_pyarrow(ours, pc.divide(pa.array(a), pa.array(b)))

    def test_int_div_trunc_semantics(self):
        # Rust/C truncation: -7 / 2 == -3 (numpy floor_divide would give -4)
        a = at.from_pylist([-7, 7, -7, 7])
        b = at.from_pylist([2, 2, -2, -2])
        assert ops.div(a, b).to_pylist() == [-3, 3, 3, -3]
        assert ops.rem(a, b).to_pylist() == [-1, 1, -1, 1]

    def test_scalar_broadcast(self, rng):
        a, _ = make_pair(rng, n=100)
        ours = ops.add(at.from_pylist(a), 7)
        check_vs_pyarrow(ours, pc.add(pa.array(a), 7))

    def test_checked_overflow(self):
        big = np.iinfo(np.int64).max
        a = at.from_pylist([big, 1])
        b = at.from_pylist([1, 1])
        _, flag = ops.add_checked(a, b)
        assert bool(flag)
        with pytest.raises(at.schema.ComputeError):
            ops.raise_if(flag)
        _, flag2 = ops.add_checked(at.from_pylist([1, 2]), b)
        assert not bool(flag2)

    def test_checked_overflow_ignores_null_slots(self):
        big = np.iinfo(np.int64).max
        a = at.from_pylist([big, None])
        b = at.from_pylist([None, 1])
        _, flag = ops.add_checked(a, b)
        assert not bool(flag)  # overflow row is null -> never observed

    def test_div_by_zero_flag(self):
        _, flag = ops.div_checked(at.from_pylist([1, 2]), at.from_pylist([1, 0]))
        assert bool(flag)


class TestCmp:
    @pytest.mark.parametrize(
        "opname", ["equal", "not_equal", "less", "less_equal", "greater", "greater_equal"]
    )
    def test_vs_pyarrow(self, rng, opname):
        a, b = make_pair(rng, hi=5)  # small domain -> plenty of ties
        ours = {
            "equal": ops.eq,
            "not_equal": ops.neq,
            "less": ops.lt,
            "less_equal": ops.lt_eq,
            "greater": ops.gt,
            "greater_equal": ops.gt_eq,
        }[opname](at.from_pylist(a), at.from_pylist(b))
        check_vs_pyarrow(ours, getattr(pc, opname)(pa.array(a), pa.array(b)))

    def test_distinct_never_null(self, rng):
        a = [1, None, 3, None, 5]
        b = [1, None, 4, 2, None]
        ours = ops.distinct(at.from_pylist(a), at.from_pylist(b))
        assert ours.to_pylist() == [False, False, True, True, True]
        ours2 = ops.not_distinct(at.from_pylist(a), at.from_pylist(b))
        assert ours2.to_pylist() == [True, True, False, False, False]


class TestBooleanKleene:
    CASES = [True, False, None]

    def test_and_kleene_table(self):
        a = [x for x in self.CASES for _ in self.CASES]
        b = self.CASES * 3
        ours = ops.and_kleene(at.from_pylist(a), at.from_pylist(b))
        check_vs_pyarrow(ours, pc.and_kleene(pa.array(a), pa.array(b)))

    def test_or_kleene_table(self):
        a = [x for x in self.CASES for _ in self.CASES]
        b = self.CASES * 3
        ours = ops.or_kleene(at.from_pylist(a), at.from_pylist(b))
        check_vs_pyarrow(ours, pc.or_kleene(pa.array(a), pa.array(b)))

    def test_non_kleene_and_not(self, rng):
        a = [True, False, None, True]
        b = [True, True, False, None]
        ours = ops.and_(at.from_pylist(a), at.from_pylist(b))
        check_vs_pyarrow(ours, pc.and_(pa.array(a), pa.array(b)))
        ours = ops.not_(at.from_pylist(a))
        check_vs_pyarrow(ours, pc.invert(pa.array(a)))

    def test_is_null(self):
        a = [1, None, 3]
        ours = ops.is_null(at.from_pylist(a))
        assert ours.to_pylist() == [False, True, False]
        assert ops.is_not_null(at.from_pylist(a)).to_pylist() == [True, False, True]


class TestAggregate:
    def test_sum_min_max_count(self, rng):
        data = [
            None if rng.random() < 0.3 else int(x)
            for x in rng.integers(-1000, 1000, 500)
        ]
        c = at.from_pylist(data)
        arr = pa.array(data)
        assert ops.finalize(ops.sum_(c)) == pc.sum(arr).as_py()
        assert ops.finalize(ops.min_(c)) == pc.min(arr).as_py()
        assert ops.finalize(ops.max_(c)) == pc.max(arr).as_py()
        assert int(ops.count(c)) == pc.count(arr).as_py()

    def test_all_null_returns_none(self):
        c = at.from_pylist([None, None, None], at.schema.int64)
        assert ops.finalize(ops.sum_(c)) is None
        assert ops.finalize(ops.min_(c)) is None

    def test_bool_agg(self):
        c = at.from_pylist([True, None, True])
        assert ops.finalize(ops.bool_and(c)) is True
        c2 = at.from_pylist([True, False, None])
        assert ops.finalize(ops.bool_and(c2)) is False
        assert ops.finalize(ops.bool_or(c2)) is True


class TestZipNullifShift:
    def test_zip(self):
        mask = at.from_pylist([True, False, None, True])
        t = at.from_pylist([1, 2, 3, None])
        f = at.from_pylist([10, 20, 30, 40])
        ours = ops.zip_(mask, t, f)
        assert ours.to_pylist() == [1, 20, None, None]

    def test_nullif(self):
        c = at.from_pylist([1, 2, 3, 4])
        cond = at.from_pylist([True, False, None, True])
        ours = ops.nullif(c, cond)
        check_vs_pyarrow(
            ours,
            pc.if_else(pc.fill_null(pa.array([True, False, None, True]), False),
                       pa.nulls(4, pa.int64()), pa.array([1, 2, 3, 4])),
        )

    def test_shift(self):
        c = at.from_pylist([1, 2, None, 4])
        assert ops.shift(c, 2).to_pylist() == [None, None, 1, 2]
        assert ops.shift(c, -1).to_pylist() == [2, None, 4, None]


class TestFusion:
    def test_fused_predicate_pipeline(self, rng):
        """BASELINE config 2 shape: (a > b) AND (c % k == 0) over numeric
        columns with null propagation, as one jitted program."""
        import jax

        n = 2048
        cols = {}
        pa_cols = {}
        for name in "abc":
            data = [
                None if rng.random() < 0.1 else int(v)
                for v in rng.integers(-100, 100, n)
            ]
            cols[name] = at.from_pylist(data)
            pa_cols[name] = pa.array(data)

        @jax.jit
        def predicate(a, b, c):
            return ops.and_kleene(ops.gt(a, b), ops.eq(ops.rem(c, 7), 0))

        ours = predicate(cols["a"], cols["b"], cols["c"])
        theirs = pc.and_kleene(
            pc.greater(pa_cols["a"], pa_cols["b"]),
            pc.equal(_pyarrow_trunc_rem(pa_cols["c"], 7), 0),
        )
        assert ours.to_pylist() == theirs.to_pylist()


def _pyarrow_trunc_rem(arr, k):
    # pyarrow has no %, emulate C-truncation remainder: a - trunc(a/k)*k
    quot = pc.divide(arr, k)  # integer division in pyarrow truncates
    return pc.subtract(arr, pc.multiply(quot, k))
