"""Aux subsystem tests: pretty formatting, metrics, datagen, CLI."""

import json
import subprocess
import sys

import arrowtpu as at
from arrowtpu import schema as st
from arrowtpu.utils import datagen, pretty, metrics


def test_pretty_format():
    b = at.record_batch({"a": [1, None], "s": ["x", "yy"]})
    out = pretty.pretty_format_batches(b)
    lines = out.splitlines()
    assert lines[1] == "| a | s  |"
    assert "| 1 | x  |" in out
    assert "|   | yy |" in out  # null renders empty


def test_buffer_memory_size():
    b = at.record_batch({"a": list(range(1000))})
    n = metrics.buffer_memory_size(b)
    assert n >= 1024 * 8  # values as limb pairs at minimum


def test_tracking_pool():
    pool = metrics.TrackingMemoryPool()
    b = at.record_batch({"a": [1, 2, 3]})
    n = pool.claim("scan", b)
    assert pool.used("scan") == n and pool.used() == n
    pool.release("scan", n)
    assert pool.used() == 0


def test_datagen_seeded_reproducible():
    a = datagen.create_primitive_column(100, 0.2, st.int64, datagen.seedable_rng(7))
    b = datagen.create_primitive_column(100, 0.2, st.int64, datagen.seedable_rng(7))
    assert a.to_pylist() == b.to_pylist()
    batch = datagen.create_random_batch(64)
    assert batch.num_columns == 6 and int(batch.length) == 64


def test_cli_roundtrip(tmp_path):
    from arrowtpu.formats import parquet as apq

    b = at.record_batch({"x": [1, 2, None], "s": ["a", "b", None]})
    src = tmp_path / "t.parquet"
    src.write_bytes(apq.write_parquet(b))
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/root"}
    out = subprocess.run(
        [sys.executable, "-m", "arrowtpu.cli", "rowcount", str(src)],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert out.stdout.strip() == "3", out.stderr
    out = subprocess.run(
        [sys.executable, "-m", "arrowtpu.cli", "schema", str(src)],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert "x: int64" in out.stdout
    dst = tmp_path / "t.csv"
    out = subprocess.run(
        [sys.executable, "-m", "arrowtpu.cli", "convert", str(src), str(dst)],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert dst.exists(), out.stderr
    assert "x,s" in dst.read_text()
