"""Distributed/mesh setup.

Replaces reference utils/__init__.py:391-413 (env/SLURM rank discovery +
NCCL init + rank-0 print patch) with jax.distributed.initialize + a
jax.sharding.Mesh over all chips. Under multi-host each host runs one
process; XLA handles ICI/DCN transport — the framework only declares the
mesh (SURVEY §2.7).
"""

from __future__ import annotations

import builtins
import os
from typing import Optional, Tuple

import jax
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def setup_for_distributed(is_master: bool) -> None:
    """rank-0-only print (reference utils/__init__.py:347-359)."""
    builtin_print = builtins.print

    def print_fn(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_fn


def init_distributed_mode(args: Optional[dict] = None) -> dict:
    """Initialize multi-process JAX if env says so; returns topology info."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ or int(os.environ.get("WORLD_SIZE", "1")) > 1:
        coordinator = os.environ.get(
            "JAX_COORDINATOR_ADDRESS",
            f"{os.environ.get('MASTER_ADDR', 'localhost')}:{os.environ.get('MASTER_PORT', '1234')}",
        )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ.get("WORLD_SIZE", jax.process_count())),
            process_id=int(os.environ.get("RANK", 0)),
        )
    info = {
        "rank": get_rank(),
        "world_size": get_world_size(),
        "num_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }
    setup_for_distributed(is_main_process())
    return info


def make_mesh(axis: str = "data", devices=None):
    """Single data-parallel mesh over all chips (SURVEY §2.7 plan); a
    'model' axis can be threaded later without API change."""
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: dict, mesh) -> dict:
    """Place a host-global batch sharded along the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
