"""Untrusted-input validation (reference arrow-data/src/data.rs:1388
validate_full; corrupt-file behavior parquet/tests/arrow_reader/bad_data.rs)."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.core import column as cc
from arrowtpu.core.validate import check_column, validate_column, _utf8_invalid


def flags_true(c, **kw):
    import jax

    f = validate_column(c, **kw)
    return {k for k, v in f.items() if bool(np.asarray(jax.device_get(v)))}


class TestUtf8:
    def matrix(self, strings):
        L = max((len(s) for s in strings), default=1)
        L = -(-L // 4) * 4
        mat = np.zeros((len(strings), L), np.uint8)
        lens = np.zeros(len(strings), np.int32)
        for i, s in enumerate(strings):
            mat[i, : len(s)] = np.frombuffer(s, np.uint8)
            lens[i] = len(s)
        return jnp.asarray(mat), jnp.asarray(lens)

    def test_valid_sequences(self):
        good = ["hello".encode(), "".encode(), "héllo".encode(),
                "日本語".encode(), "🎉 emoji".encode(), b"\x7f",
                "ࠀ￿".encode(), "\U0010FFFF".encode()]
        mat, lens = self.matrix(good)
        bad = np.asarray(_utf8_invalid(mat, lens))
        assert not bad.any(), f"false positives: {bad}"

    def test_invalid_sequences(self):
        cases = [
            b"\x80",              # lone continuation
            b"\xc3",              # truncated 2-byte
            b"\xc0\xaf",          # overlong 2-byte
            b"\xe0\x80\xaf",      # overlong 3-byte
            b"\xed\xa0\x80",      # surrogate
            b"\xf0\x80\x80\x80",  # overlong 4-byte
            b"\xf5\x80\x80\x80",  # > U+10FFFF
            b"\xf4\x90\x80\x80",  # > U+10FFFF
            b"ok\xffbad",         # invalid byte mid-string
            b"\xc3\x28",          # lead without continuation
        ]
        mat, lens = self.matrix(cases)
        bad = np.asarray(_utf8_invalid(mat, lens))
        for i, c in enumerate(cases):
            # cross-check the oracle
            try:
                c.decode("utf-8")
                oracle_bad = False
            except UnicodeDecodeError:
                oracle_bad = True
            assert oracle_bad, f"test case {c!r} is actually valid"
            assert bad[i], f"missed invalid utf8: {c!r}"


class TestColumnValidation:
    def test_good_columns_pass(self, rng):
        check_column(cc.from_pylist([1, None, 3], st.int64), name="ints")
        check_column(at.string_view(["a", None, "long-string-over-twelve-b"]),
                     name="strs")
        check_column(at.dictionary_encode_host(["x", "y", None, "x"]), name="d")

    def test_dict_key_out_of_bounds(self):
        d = at.dictionary_encode_host(["x", "y", "x"])
        import dataclasses
        bad_keys = dataclasses.replace(
            d.keys, values=jnp.full_like(d.keys.values, 99))
        bad = dataclasses.replace(d, keys=bad_keys)
        assert "dict_key_out_of_bounds" in flags_true(bad)
        with pytest.raises(st.ValidationError):
            check_column(bad, name="d")

    def test_view_out_of_bounds(self):
        s = at.string_view(["a-string-longer-than-twelve-bytes"])
        import dataclasses
        views = s.views.at[0, 3].set(jnp.uint32(10**8))
        bad = dataclasses.replace(s, views=views)
        assert "view_out_of_bounds" in flags_true(bad)

    def test_invalid_utf8_column(self):
        s = at.string_view([b"\xff\xfe-definitely-not-utf8"], dtype=st.utf8)
        assert "invalid_utf8" in flags_true(s)

    def test_binary_skips_utf8(self):
        s = at.string_view([b"\xff\xfe"], dtype=st.binary)
        assert "invalid_utf8" not in flags_true(s)

    def test_list_view_bounds(self):
        lv = cc.list_view([[1, 2], [3]])
        import dataclasses
        bad = dataclasses.replace(
            lv, starts=jnp.full_like(lv.starts, 10**6))
        assert "list_view_out_of_bounds" in flags_true(bad)


class TestCorruptFiles:
    def test_truncated_parquet_raises(self, rng):
        from arrowtpu.formats.parquet import read_parquet, write_parquet

        b = at.record_batch({"a": [1, 2, 3], "s": at.string_view(["x", "yy", None])})
        data = write_parquet([b])
        with pytest.raises(Exception):
            read_parquet(io.BytesIO(data[: len(data) // 2]))

    def test_bitflipped_parquet_magic(self, rng):
        from arrowtpu.formats.parquet import read_parquet, write_parquet

        b = at.record_batch({"a": [1, 2, 3]})
        data = bytearray(write_parquet([b]))
        data[-1] ^= 0xFF  # corrupt trailing magic
        with pytest.raises(Exception):
            read_parquet(io.BytesIO(bytes(data)))

    def test_truncated_ipc_raises(self):
        from arrowtpu.formats.ipc import read_stream, write_stream

        b = at.record_batch({"a": [1, 2, 3]})
        data = write_stream([b])
        with pytest.raises(Exception):
            read_stream(io.BytesIO(data[: len(data) - 10]))

    def test_ipc_validate_flag_roundtrip(self):
        from arrowtpu.formats.ipc import read_stream, write_stream

        b = at.record_batch({
            "a": [1, None, 3],
            "s": at.string_view(["ok", "fine", "a-long-string-over-twelve"]),
        })
        data = write_stream([b])
        out = read_stream(io.BytesIO(data), validate=True)
        assert out[0].to_pydict() == b.to_pydict()

    def test_parquet_validate_flag(self):
        from arrowtpu.formats.parquet import read_parquet, write_parquet

        b = at.record_batch({"a": [1, 2, None]})
        data = write_parquet([b])
        out = read_parquet(io.BytesIO(data), validate=True)
        assert out.to_pydict() == b.to_pydict()
