"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Sharding/parallel tests exercise real multi-chip code paths
(shard_map/pjit over a Mesh) without TPU hardware, per SURVEY.md section 4.
Must run before any `import jax` in the test session.
"""

import os

# Force the CPU backend: the axon harness exports JAX_PLATFORMS=axon, so a
# plain setdefault would keep the real TPU. Tests always run on the 8-device
# virtual CPU mesh (override with BROTLI_TPU_TEST_PLATFORM if ever needed).
os.environ["JAX_PLATFORMS"] = os.environ.get("BROTLI_TPU_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import pytest  # noqa: E402

VECTORS_DIR = "/root/reference/test/fixtures/vectors"
BENCH_FIXTURES_DIR = "/root/reference/bench/fixtures"


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (large fixtures)")
