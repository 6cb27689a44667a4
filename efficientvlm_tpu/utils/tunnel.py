"""Axon-relay liveness probe.

The tunneled TPU backend (and Pallas remote compiles, even from
CPU-platform processes) go through a local relay; when it is down,
jax.devices() and Mosaic compiles HANG forever instead of erroring
(CLAUDE.md). Everything that might touch the tunnel probes here first:
bench.py, __graft_entry__._provision_devices, tests/conftest.py.
"""

from __future__ import annotations

import socket

RELAY_ADDR = ("127.0.0.1", 8083)


def relay_alive(timeout: float = 5.0) -> bool:
    try:
        with socket.create_connection(RELAY_ADDR, timeout=timeout):
            return True
    except OSError:
        return False


def tunnel_responsive(timeout: float = 90.0) -> bool:
    """End-to-end probe: TCP accept is NOT sufficient (r5 failure mode —
    the relay can accept connections while every RPC hangs, so
    relay_alive() passes yet jax.devices() and all chip ops hang).
    Run one tiny device op in a SUBPROCESS under a hard timeout: an
    in-process hung RPC cannot be cancelled, a subprocess can be killed.
    """
    if not relay_alive():
        return False
    import subprocess
    import sys

    code = (
        # pin the probe to the axon platform: under the ambient "axon,cpu"
        # config a fast axon-init failure would silently fall back to CPU
        # and report a healthy tunnel that is actually down
        "import jax; jax.config.update('jax_platforms', 'axon');"
        "import numpy as np, jax.numpy as jnp;"
        "np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))"
    )
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode
            == 0
        )
    except (subprocess.TimeoutExpired, OSError):
        return False
