"""Property tests for the Pallas compaction kernel (interpret mode on CPU;
the same kernel compiles for TPU — see tests/test_tpu_device.py for the
on-device run).  Reference semantics: arrow-select/src/filter.rs:201 —
kept elements move to the front in order; tail is zero (padding contract).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from arrowtpu.pallas import compact as C


def _ref(x, keep):
    want = np.zeros_like(x)
    sel = x[keep.astype(bool)]
    want[: sel.size] = sel
    return want, sel.size


@pytest.mark.parametrize("rs_mode", ["mxu", "vpu"])
@pytest.mark.parametrize(
    "ntiles,pattern",
    [
        (1, "half"), (1, "none"), (1, "all"), (2, "half"), (2, "sparse"),
        (3, "dense"), (2, "firsthalf"), (2, "lasthalf"), (4, "random"),
    ],
)
def test_compact_words(ntiles, pattern, rs_mode):
    rng = np.random.default_rng(hash((ntiles, pattern)) % 2**32)
    n = ntiles * C.TILE
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    keep = {
        "half": rng.random(n) < 0.5,
        "none": np.zeros(n, bool),
        "all": np.ones(n, bool),
        "sparse": rng.random(n) < 0.01,
        "dense": rng.random(n) < 0.99,
        "firsthalf": np.arange(n) < n // 2,
        "lasthalf": np.arange(n) >= n // 2,
        "random": rng.random(n) < rng.random(),
    }[pattern].astype(np.uint8)
    out, cnt = C.compact_words(
        jnp.asarray(x), jnp.asarray(keep), rs_mode=rs_mode, interpret=True
    )
    want, wcnt = _ref(x, keep)
    assert int(cnt) == wcnt
    np.testing.assert_array_equal(np.asarray(out), want)


def test_compact_bytes():
    rng = np.random.default_rng(7)
    n = 2 * C.TILE
    x = rng.integers(0, 256, n, dtype=np.uint8)
    keep = (rng.random(n) < 0.4).astype(np.uint8)
    out, cnt = C.compact_bytes(jnp.asarray(x), jnp.asarray(keep), interpret=True)
    want, wcnt = _ref(x, keep)
    assert int(cnt) == wcnt
    np.testing.assert_array_equal(np.asarray(out), want)


def test_compact_words_pairs():
    """64-bit rows as interleaved u32 limb pairs: keep repeated 2x stays
    monotone, so pairs stay adjacent and ordered (wide-column layout)."""
    rng = np.random.default_rng(9)
    rows = C.TILE  # words = 2 * TILE
    v = rng.integers(0, 2**64, rows, dtype=np.uint64)
    limbs = np.stack([(v & 0xFFFFFFFF), (v >> 32)], axis=-1).astype(np.uint32)
    keep_rows = (rng.random(rows) < 0.6)
    keep_words = np.repeat(keep_rows, 2).astype(np.uint8)
    out, cnt = C.compact_words(
        jnp.asarray(limbs.reshape(-1)), jnp.asarray(keep_words), interpret=True
    )
    out = np.asarray(out).reshape(rows, 2)
    sel = limbs[keep_rows]
    assert int(cnt) == 2 * sel.shape[0]
    np.testing.assert_array_equal(out[: sel.shape[0]], sel)
    assert not out[sel.shape[0]:].any()


def test_unsupported_size():
    with pytest.raises(ValueError):
        C.compact_words(jnp.zeros(100, jnp.uint32), jnp.zeros(100, jnp.uint8))
