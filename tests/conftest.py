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

# The ambient axon sitecustomize imports jax at interpreter start and pins
# jax.config.jax_platforms = "axon,cpu" — which overrides the JAX_PLATFORMS
# env var set above (the platform choice is already baked by the time this
# file runs). Re-assert cpu on the CONFIG, not just the env, or the whole
# suite silently runs single-device on the tunneled TPU whenever axon init
# succeeds (racy: it depends on tunnel state). Same pattern as
# __graft_entry__._provision_cpu_devices and parallel/multihost_check.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# CPU compiles dominate the suite's wall time (train steps take minutes to
# build); the on-disk XLA cache makes re-runs start from compiled programs.
from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

assert len(jax.devices()) == 8, (
    "test harness expects 8 virtual CPU devices, got "
    f"{len(jax.devices())} x {jax.devices()[0].platform}"
)


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Pallas kernels remote-compile through the axon relay even in CPU-platform
# processes (PALLAS_AXON_REMOTE_COMPILE=1) — and when the relay is down the
# compile HANGS rather than erroring. Degrade gracefully: clear the flag so
# the kernel tests run in LOCAL interpret mode (numerics still verified;
# the Mosaic lowering itself gets exercised whenever the relay is up).
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
    # end-to-end probe, not just TCP: in the r5 wedge mode the relay
    # ACCEPTS connections while every RPC hangs, so a relay_alive() check
    # passes and the first Mosaic compile then hangs pytest forever.
    from efficientvlm_tpu.utils.tunnel import tunnel_responsive

    if not tunnel_responsive():
        del os.environ["PALLAS_AXON_REMOTE_COMPILE"]
        print("### axon relay unreachable/unresponsive: Pallas tests run in "
              "local interpret mode (no Mosaic lowering this run)")
