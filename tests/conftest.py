"""Test harness: force an 8-device CPU platform so multi-chip sharding
(data-parallel all_gather/psum paths) is exercised without TPU hardware —
the standard JAX answer to testing multi-node logic single-host."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may say 'axon'
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
