"""Bitmap layer tests (reference behaviors:
arrow-buffer/src/buffer/boolean.rs, null.rs)."""

import jax.numpy as jnp
import numpy as np

from arrowtpu.core import bitmap as bm


def test_pack_unpack_roundtrip(rng):
    for n in [128, 256, 1024]:
        bools = rng.random(n) < 0.3
        words = bm.pack(jnp.asarray(bools))
        assert words.dtype == jnp.uint32
        assert words.shape == (n // 32,)
        back = np.asarray(bm.unpack(words))
        np.testing.assert_array_equal(back, bools)


def test_count_set_bits(rng):
    bools = rng.random(512) < 0.5
    words = bm.pack(jnp.asarray(bools))
    assert int(bm.count_set_bits(words)) == int(bools.sum())


def test_union_semantics(rng):
    a = rng.random(128) < 0.5
    b = rng.random(128) < 0.5
    wa, wb = bm.pack(jnp.asarray(a)), bm.pack(jnp.asarray(b))
    assert bm.union(None, None) is None
    assert bm.union(wa, None) is wa
    u = bm.union(wa, wb)
    np.testing.assert_array_equal(np.asarray(bm.unpack(u)), a & b)


def test_row_mask_words():
    for length in [0, 1, 31, 32, 33, 100, 128]:
        words = bm.row_mask_words(128, length)
        expect = np.arange(128) < length
        np.testing.assert_array_equal(np.asarray(bm.unpack(words)), expect)


def test_host_pack_roundtrip(rng):
    bools = rng.random(100) < 0.4
    words = bm.from_numpy_bools(bools)
    assert words.shape == (4,)  # rounded to 128 bits
    np.testing.assert_array_equal(bm.to_numpy_bools(words, 100), bools)
