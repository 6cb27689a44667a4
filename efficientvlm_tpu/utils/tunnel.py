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
