"""Snappy block codec (formats/snappy.py; format_description.txt)."""

import numpy as np
import pytest

from arrowtpu import schema as st
from arrowtpu.formats import snappy


def test_literal_only_decode():
    # uvarint len=5, literal tag (len-1=4)<<2, "hello"
    assert snappy.decompress(bytes([5, 4 << 2]) + b"hello") == b"hello"


def test_copy_decode():
    # "abab" repeated via 1-byte-offset copy: len=8 uvarint, literal
    # "ab" (tag 1<<2), copy kind 1 len 6 off 2
    data = bytes([8, 1 << 2]) + b"ab" + bytes([1 | ((6 - 4) << 2), 2])
    assert snappy.decompress(data) == b"abababab"


@pytest.mark.parametrize("payload", [
    b"",
    b"x",
    b"hello world hello world hello world",
    bytes(range(256)) * 40,
    b"a" * 100000,
    np.random.default_rng(0).integers(0, 4, 50000,
                                      dtype=np.uint8).tobytes(),
])
def test_roundtrip(payload):
    comp = snappy.compress(payload)
    assert snappy.decompress(comp) == payload


def test_compresses_repetitive():
    data = b"abcdefgh" * 1000
    assert len(snappy.compress(data)) < len(data) // 4


def test_bad_offset_raises():
    with pytest.raises(st.ArrowTpuError):
        snappy.decompress(bytes([4, 1 | (0 << 2), 9]))  # offset past start
