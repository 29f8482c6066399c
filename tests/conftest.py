"""Test harness setup.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic can
be exercised without TPU hardware (SURVEY.md §4).  Must be set before jax
initialises its backends, hence the os.environ writes at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
