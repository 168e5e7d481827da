"""String kernel tests vs pyarrow.compute (reference test model:
/root/reference/arrow-string/src/like.rs inline tests + predicate.rs)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrowtpu as at
from arrowtpu import ops
from arrowtpu.interop import from_pyarrow, to_pyarrow

DATA = [
    "arrow",
    "arrow_tpu",
    None,
    "",
    "ARROW",
    "a longer string that definitely spills into the arena buffer",
    "sparrow",
    "arr",
    "%special_",
    "tail-arrow",
]


@pytest.fixture
def c():
    return from_pyarrow(pa.array(DATA))


def _bools(b):
    return b.to_pylist()


def test_like_eq(c):
    got = _bools(ops.like(c, "arrow"))
    exp = pc.match_like(pa.array(DATA), "arrow").to_pylist()
    exp = [bool(x) if x is not None else None for x in exp]
    assert got == exp


@pytest.mark.parametrize(
    "pattern",
    ["arrow%", "%arrow", "%arrow%", "a%w", "_rrow", "arr_w", "%", "a%", "%special%"],
)
def test_like_patterns(c, pattern):
    got = _bools(ops.like(c, pattern))
    exp = pc.match_like(pa.array(DATA), pattern).to_pylist()
    assert got == exp, pattern


def test_nlike_ilike(c):
    got = _bools(ops.nlike(c, "arrow%"))
    exp = [None if v is None else not v for v in pc.match_like(pa.array(DATA), "arrow%").to_pylist()]
    assert got == exp
    got = _bools(ops.ilike(c, "ArRoW"))
    exp = pc.match_like(pa.array(DATA), "ArRoW", ignore_case=True).to_pylist()
    assert got == exp


def test_starts_ends_contains(c):
    arr = pa.array(DATA)
    assert _bools(ops.starts_with(c, "arr")) == pc.starts_with(arr, "arr").to_pylist()
    assert _bools(ops.ends_with(c, "row")) == pc.ends_with(arr, "row").to_pylist()
    assert _bools(ops.contains(c, "rro")) == pc.match_substring(arr, "rro").to_pylist()
    assert _bools(ops.contains(c, "arena")) == pc.match_substring(arr, "arena").to_pylist()


def test_lengths(c):
    arr = pa.array(DATA)
    assert ops.length(c).to_pylist() == pc.utf8_length(arr).to_pylist()
    assert ops.octet_length(c).to_pylist() == pc.binary_length(arr).to_pylist()
    assert ops.bit_length(c).to_pylist() == [
        None if v is None else 8 * len(v.encode()) for v in DATA
    ]


def test_length_unicode():
    vals = ["héllo", "日本語のテキスト", None, "emoji 🎉 here"]
    c = from_pyarrow(pa.array(vals))
    assert ops.length(c).to_pylist() == pc.utf8_length(pa.array(vals)).to_pylist()


def test_substring(c):
    arr = pa.array(DATA)
    got = ops.substring(c, 1, 3)
    exp = pc.utf8_slice_codeunits if False else None
    # byte-offset semantics (reference substring.rs); ASCII data here so
    # compare against python slicing
    assert got.to_pylist() == [None if v is None else v[1:4] for v in DATA]
    got = ops.substring(c, -3)
    assert got.to_pylist() == [None if v is None else v[-3:] for v in DATA]
    got = ops.substring(c, 2)
    assert got.to_pylist() == [None if v is None else v[2:] for v in DATA]


def test_concat_elements():
    a = from_pyarrow(pa.array(["ab", None, "x" * 30, ""]))
    b = from_pyarrow(pa.array(["cd", "e", "y" * 30, "z"]))
    got = ops.concat_elements(a, b)
    assert got.to_pylist() == ["abcd", None, "x" * 30 + "y" * 30, "z"]


def test_case(c):
    arr = pa.array(DATA)
    assert ops.lower(c).to_pylist() == pc.utf8_lower(arr).to_pylist()
    assert ops.upper(c).to_pylist() == pc.utf8_upper(arr).to_pylist()


def test_case_unicode():
    vals = ["Héllo", None, "ÅNGSTRÖM"]
    c = from_pyarrow(pa.array(vals))
    assert ops.lower(c).to_pylist() == pc.utf8_lower(pa.array(vals)).to_pylist()


def test_regexp(c):
    arr = pa.array(DATA)
    got = ops.regexp_is_match(c, "^a.*w$")
    exp = pc.match_substring_regex(arr, "^a.*w$").to_pylist()
    assert got.to_pylist() == exp


def test_dictionary_fast_path():
    arr = pa.array(["aa", "bb", "aa", None, "ab"]).dictionary_encode()
    c = from_pyarrow(arr)
    got = ops.like(c, "a%")
    assert got.to_pylist() == [True, False, True, None, True]
    assert ops.length(c).to_pylist() == [2, 2, 2, None, 2]


def test_like_under_jit():
    import jax

    c = from_pyarrow(pa.array(["abc", "abd", None]))
    out = jax.jit(lambda x: ops.starts_with(x, "ab"))(c)
    assert out.to_pylist() == [True, True, None]


def test_roundtrip_from_byte_matrix():
    """from_byte_matrix inverse of byte_matrix, incl. inline/arena split."""
    from arrowtpu.ops.strings import byte_matrix, from_byte_matrix, max_byte_length

    vals = ["", "short", "exactly12byt", "thirteen bytes!", None, "x" * 40]
    c = from_pyarrow(pa.array(vals))
    L = max_byte_length(c)
    mat, lens = byte_matrix(c, L)
    rebuilt = from_byte_matrix(mat, lens, c.validity, c.length, c.dtype)
    assert rebuilt.to_pylist() == vals
