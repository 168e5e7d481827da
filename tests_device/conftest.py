"""Device test harness: run kernels on the REAL accelerator (TPU via the
axon tunnel when present) and assert against CPU/numpy oracles.

The main suite (tests/) runs everything on the host CPU backend for speed
and for the 8-device emulated mesh; THIS suite is the other half of the
SURVEY §5.2 validation story — bit-exact CPU-vs-TPU comparison for
integer/movement kernels, documented tolerance for emulated f64 limb
arithmetic (core/wide.py), and compiled-mode Pallas kernel validation.

Run with:  python -m pytest tests_device/ -q   (bench.py --device-tests
also invokes it).  Skips itself when no accelerator is attached.
"""

import os

import numpy as np
import pytest

# persistent compilation cache: repeat runs skip XLA compiles
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    if jax.default_backend() == "cpu":
        pytest.exit(
            "tests_device/ requires an accelerator backend (TPU); "
            "the CPU-backed suite lives in tests/", returncode=0,
        )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
