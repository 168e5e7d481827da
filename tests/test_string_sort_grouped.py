"""Grouped string sort: prefix planes + rank-chained refinement
(rowformat/pack.py sort_by_plane_groups; reference variable-length row
encoding arrow-row/src/variable.rs:94; round-5 ask #4)."""

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.config import SortOptions
from arrowtpu.core import column as col
import importlib

S = importlib.import_module("arrowtpu.ops.sort")
from arrowtpu.rowformat import encode as rf


def _strings(n, seed=0, tie_heavy=True, max_len=64):
    rng = np.random.default_rng(seed)
    out = []
    # tie-heavy: shared 20-byte prefixes force refinement rounds
    prefixes = [f"common-prefix-{i:04d}--" for i in range(8)]
    for i in range(n):
        if rng.random() < 0.05:
            out.append(None)
            continue
        ln = int(rng.integers(0, max_len - 22))
        body = "".join(chr(97 + int(x)) for x in rng.integers(0, 26, ln))
        out.append((prefixes[int(rng.integers(0, 8))] if tie_heavy else "")
                   + body)
    return out


def test_grouped_encoding_splits():
    strs = _strings(500)
    c = col.string_view(strs, st.utf8)
    groups = rf.encode_columns_grouped([c])
    assert len(groups) > 1  # long strings actually chunk
    assert all(len(g) <= 5 for g in groups)


@pytest.mark.parametrize("descending,nulls_first", [
    (False, True), (True, True), (False, False), (True, False)])
def test_bit_exact_vs_python(descending, nulls_first):
    strs = _strings(4000)
    c = col.string_view(strs, st.utf8)
    idx = S.sort_to_indices(
        c, SortOptions(descending=descending, nulls_first=nulls_first))
    got = np.asarray(idx.values)[:len(strs)]
    keyed = [(s is None, s) for s in strs]

    def key(i):
        s = strs[i]
        null = s is None
        kb = b"" if null else s.encode()
        if descending:
            kb = bytes(255 - b for b in kb) + b"\xff"  # order flip w/ prefix
        nullk = (0 if null else 1) if nulls_first else (1 if null else 0)
        return (nullk, kb, i)

    # stable python oracle over byte order
    order = sorted(range(len(strs)), key=key)
    # descending flip above is approximate for variable lengths; build
    # exact oracle instead: sort by (nullk, key bytes) with reverse on
    # the value part only, stable
    valid_idx = [i for i in range(len(strs)) if strs[i] is not None]
    null_idx = [i for i in range(len(strs)) if strs[i] is None]
    valid_sorted = sorted(valid_idx, key=lambda i: strs[i].encode())
    if descending:
        # stable descending: reverse groups of equal keys
        from itertools import groupby

        rev = []
        for _, grp in groupby(valid_sorted, key=lambda i: strs[i]):
            rev.append(list(grp))
        valid_sorted = [i for g in reversed(rev) for i in g]
    order = (null_idx + valid_sorted) if nulls_first else \
        (valid_sorted + null_idx)
    assert list(got) == order


def test_lexsort_string_then_int():
    strs = _strings(3000, seed=1)
    rng = np.random.default_rng(2)
    ints = rng.integers(0, 5, 3000)
    c1 = col.string_view(strs, st.utf8)
    c2 = at.primitive(ints.astype(np.int64), at.schema.int64, length=3000)
    idx = S.lexsort_to_indices([c1, c2])
    got = list(np.asarray(idx.values)[:3000])
    order = sorted(range(3000), key=lambda i: (
        strs[i] is not None, b"" if strs[i] is None else strs[i].encode(),
        int(ints[i]), 0))
    # nulls first default
    null_idx = [i for i in order if strs[i] is None]
    valid = [i for i in order if strs[i] is not None]
    assert got == null_idx + valid


def test_int_then_string():
    strs = _strings(2000, seed=3)
    rng = np.random.default_rng(4)
    ints = rng.integers(0, 3, 2000)
    c1 = at.primitive(ints.astype(np.int64), at.schema.int64, length=2000)
    c2 = col.string_view(strs, st.utf8)
    idx = S.lexsort_to_indices([c1, c2])
    got = list(np.asarray(idx.values)[:2000])
    order = sorted(range(2000), key=lambda i: (
        int(ints[i]), strs[i] is not None,
        b"" if strs[i] is None else strs[i].encode()))
    assert got == order


def test_equal_beyond_prefix_ties_stable():
    # strings equal through 48 bytes, differing only at byte 49
    base = "x" * 48
    strs = [base + suf for suf in ["b", "a", "c", "a", ""]] * 50
    c = col.string_view(strs, st.utf8)
    idx = S.sort_to_indices(c)
    got = list(np.asarray(idx.values)[:len(strs)])
    order = sorted(range(len(strs)), key=lambda i: (strs[i], i))
    assert got == order
