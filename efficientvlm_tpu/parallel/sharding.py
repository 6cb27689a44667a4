"""Mesh construction + Megatron-style tensor-parallel sharding rules.

The reference has exactly one parallelism strategy (DDP over NCCL,
SURVEY §2.7); here the mesh carries ('data', 'model') axes from day one:

- data parallelism: batch sharded on 'data'; gradient reduction is the
  psum XLA inserts (or explicit pmean under shard_map);
- tensor parallelism (optional, 'model' axis size > 1): attention q/k/v
  kernels shard their output (head) dim, out-proj its input dim; FFN fc1
  shards output, fc2 input; word embeddings shard the vocab dim.
  XLA's SPMD partitioner inserts the all-reduces after out-proj/fc2 —
  the Megatron pattern without hand-written collectives.

With model=1 the rules degrade to pure replication (plain DP).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts).lower()


def _spec_for(path: str, leaf) -> P:
    if leaf.ndim < 2:
        return P()
    # attention projections
    if any(f"/{n}/kernel" in path for n in ("q", "k", "v")):
        return P(None, MODEL_AXIS)  # shard heads (output dim)
    if "/out/kernel" in path:
        return P(MODEL_AXIS, None)  # shard input dim; XLA all-reduces after
    # FFN
    if any(n in path for n in ("intermediate/kernel", "fc1/kernel", "qkv/kernel")):
        return P(None, MODEL_AXIS)
    if any(n in path for n in ("output/kernel", "fc2/kernel")):
        return P(MODEL_AXIS, None)
    # vocab-dim sharding for embeddings / MLM decoder
    if "word/embedding" in path:
        return P(MODEL_AXIS, None)
    if "cls/decoder/kernel" in path:
        return P(None, MODEL_AXIS)
    return P()


def param_partition_specs(params):
    """PartitionSpec pytree for a model param tree (tp rules above)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), leaf), params
    )


def shard_params(params, mesh: Mesh):
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


SEQ_AXIS = "seq"


def make_sp_mesh(data: Optional[int] = None, seq: int = 1, devices=None) -> Mesh:
    """('data','seq') mesh — the context-parallel hook SURVEY §5.7 asks to
    keep plumbed-but-unit-sized: sequences in this model family are tiny
    (<=901 patches), so seq=1 in production; a seq>1 axis shards the token
    dim of activations via constrain_activations and GSPMD inserts the K/V
    all-gathers."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // seq
    assert data * seq <= len(devices), (data, seq, len(devices))
    arr = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def constrain_activations(h, act_partition):
    """with_sharding_constraint on a [batch, seq, hidden] activation using
    the cfg-provided leading axis names (e.g. ["data","seq"]). No-op when
    unset, so shard_map/eager paths are untouched. Requires an ambient mesh
    (jax.sharding.use_mesh) when set."""
    if not act_partition:
        return h
    spec = P(*act_partition, *([None] * (h.ndim - len(act_partition))))
    return jax.lax.with_sharding_constraint(h, spec)


def batch_partition_spec(batch: dict) -> dict:
    return {k: P(DATA_AXIS) for k in batch}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    return {
        k: jax.device_put(v, NamedSharding(mesh, P(DATA_AXIS))) for k, v in batch.items()
    }
