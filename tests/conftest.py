"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Sharding/parallel tests exercise real multi-chip code paths
(shard_map/pjit over a Mesh) without TPU hardware, per SURVEY.md section 4.
Must run before any `import jax` in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

VECTORS_DIR = "/root/reference/test/fixtures/vectors"
BENCH_FIXTURES_DIR = "/root/reference/bench/fixtures"


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (large fixtures)")
