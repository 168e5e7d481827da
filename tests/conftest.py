"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests use
XLA's host-platform device emulation (the reference's analogue is spinning
up in-process tonic servers for Flight tests,
/root/reference/arrow-flight/tests/common/server.rs — here the 'cluster' is
an emulated device mesh instead)."""

import os

# NOTE: this environment presets JAX_PLATFORMS=axon (the TPU tunnel) and the
# plugin wins over the env var — the programmatic config update below is the
# only override that actually works here.
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU compiles the dense-range group-by's per-bucket reduction loop
# ~25x slower than the TPU backend (136 s at 256 buckets); shrink the
# bucket count on the CPU mesh — the code path is identical.
os.environ.setdefault("ARROWTPU_DENSE_GROUPBY_BUCKETS", "32")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the host CPU backend; the axon TPU plugin "
        "hijacked platform selection"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)
