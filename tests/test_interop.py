"""pyarrow bridge round-trips (reference analogue: arrow-pyarrow integration
tests, /root/reference/arrow-pyarrow-integration-testing/tests/test_sql.py is
the cross-language model; here the bridge itself is validated value-exactly)."""

import numpy as np
import pyarrow as pa
import pytest

import arrowtpu as at
from arrowtpu.interop import from_pyarrow, to_pyarrow


def _roundtrip_pa(arr: pa.Array):
    """pa -> arrowtpu -> pa, compare logical values."""
    c = from_pyarrow(arr)
    back = to_pyarrow(c)
    assert back.to_pylist() == arr.to_pylist()
    return c


@pytest.mark.parametrize(
    "patype,pyvals",
    [
        (pa.int8(), [1, -2, None, 127]),
        (pa.int16(), [300, None, -300, 0]),
        (pa.int32(), [2**31 - 1, -(2**31), None, 7]),
        (pa.int64(), [2**63 - 1, -(2**63), None, 42]),
        (pa.uint8(), [0, 255, None, 3]),
        (pa.uint32(), [2**32 - 1, 0, None, 9]),
        (pa.uint64(), [2**64 - 1, 0, None, 11]),
        (pa.float32(), [1.5, None, -2.25, 0.0]),
        (pa.float64(), [1e300, None, -2.5e-300, 3.14]),
        (pa.bool_(), [True, None, False, True]),
        (pa.timestamp("us"), [1, None, 10**15, -5]),
        (pa.date32(), [0, None, 20000, -10]),
        (pa.duration("ns"), [5, None, -(10**12), 0]),
    ],
)
def test_roundtrip_primitive(patype, pyvals):
    _roundtrip_pa(pa.array(pyvals, type=patype))


def test_roundtrip_no_nulls():
    _roundtrip_pa(pa.array([1, 2, 3], type=pa.int32()))
    c = from_pyarrow(pa.array([1, 2, 3], type=pa.int32()))
    assert c.validity is None


def test_roundtrip_strings():
    vals = ["", "short", None, "twelve bytes", "a much longer string that spills to the arena", "x" * 100]
    c = _roundtrip_pa(pa.array(vals, type=pa.utf8()))
    assert c.to_pylist() == vals


def test_roundtrip_large_string_and_binary():
    _roundtrip_pa(pa.array([b"ab", None, b"c" * 50], type=pa.binary()))
    arr = pa.array(["x", "yy", None], type=pa.large_string())
    c = from_pyarrow(arr)
    assert c.to_pylist() == ["x", "yy", None]


def test_roundtrip_dictionary():
    arr = pa.array(["a", "b", "a", None, "c", "b"]).dictionary_encode()
    c = from_pyarrow(arr)
    assert c.to_pylist() == ["a", "b", "a", None, "c", "b"]
    back = to_pyarrow(c)
    assert back.to_pylist() == arr.to_pylist()


def test_roundtrip_null_column():
    _roundtrip_pa(pa.nulls(5))


def test_roundtrip_record_batch():
    batch = pa.record_batch(
        {
            "i": pa.array([1, None, 3], type=pa.int64()),
            "f": pa.array([1.0, 2.0, None], type=pa.float64()),
            "s": pa.array(["a", None, "ccc" * 20]),
            "b": pa.array([True, False, None]),
        }
    )
    b = from_pyarrow(batch)
    assert b.to_pydict() == {
        "i": [1, None, 3],
        "f": [1.0, 2.0, None],
        "s": ["a", None, "ccc" * 20],
        "b": [True, False, None],
    }
    back = to_pyarrow(b)
    assert back.to_pylist() == batch.to_pylist()


def test_roundtrip_table_chunked():
    t = pa.table({"x": pa.chunked_array([[1, 2], [3, None]], type=pa.int32())})
    b = from_pyarrow(t)
    assert b.to_pydict() == {"x": [1, 2, 3, None]}


def test_from_sliced_array():
    arr = pa.array([0, 1, 2, 3, 4, 5], type=pa.int32()).slice(2, 3)
    c = from_pyarrow(arr)
    assert c.to_pylist() == [2, 3, 4]


def test_to_pyarrow_after_device_compute():
    """Kernel output -> pyarrow (the validation path every op test can use)."""
    from arrowtpu import ops

    a = at.from_pylist([1, 2, None, 4], at.int64)
    b = at.from_pylist([10, None, 30, 40], at.int64)
    s = ops.add(a, b)
    assert to_pyarrow(s).to_pylist() == [11, None, None, 44]


def test_schema_roundtrip():
    s = at.schema.schema(
        [("a", at.int64), ("b", at.utf8), ("c", at.schema.Timestamp("ns", "UTC"))],
        metadata=(("k", "v"),),
    )
    pas = at.interop.schema_to_pa(s)
    back = at.interop.schema_from_pa(pas)
    assert back == s


def test_large_roundtrip_no_python_loop_blowup(rng):
    n = 200_000
    vals = rng.integers(-(2**62), 2**62, n)
    mask = rng.random(n) < 0.1
    arr = pa.array(np.where(mask, 0, vals), mask=mask, type=pa.int64())
    c = from_pyarrow(arr)
    back = to_pyarrow(c)
    assert back.equals(arr.cast(pa.int64()))
