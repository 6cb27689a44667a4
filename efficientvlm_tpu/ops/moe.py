"""Mixture-of-Experts FFN with expert parallelism (Switch-style top-1).

No reference counterpart (the reference's FFNs are dense); this is the
scale-out FFN extension of the framework, built the TPU way:

- **Dense dispatch, not ragged scatter**: routing materializes one-hot
  dispatch/combine tensors and the whole layer is three einsums — XLA tiles
  them straight onto the MXU, and there is no data-dependent shape anywhere
  (capacity is static), so the op jits once.
- **Expert parallelism as sharding, not message passing**: expert params
  carry a leading E axis; shard it over an 'expert' mesh axis
  (`expert_partition_spec`) and jit under the mesh — the SPMD partitioner
  inserts the all-to-alls that move token slots to their expert's shard and
  back. Same recipe as the tp/sp hooks in parallel/sharding.py.
- **Static capacity** C = ceil(capacity_factor * T / E): tokens routed past
  an expert's capacity are DROPPED (contribute zero; the caller's residual
  connection carries them through) — the standard Switch trade that keeps
  shapes static for XLA.

Aux load-balancing loss follows Switch Transformer (arXiv:2101.03961 eq. 4):
E * sum_e f_e * P_e over the token batch.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def init_moe_ffn(key, *, hidden: int, ffn: int, num_experts: int, dtype=jnp.float32):
    kr, k1, k2 = jax.random.split(key, 3)
    s1 = 1.0 / math.sqrt(hidden)
    s2 = 1.0 / math.sqrt(ffn)
    return {
        "router": {"kernel": jax.random.normal(kr, (hidden, num_experts), dtype) * s1},
        "wi": jax.random.normal(k1, (num_experts, hidden, ffn), dtype) * s1,
        "bi": jnp.zeros((num_experts, ffn), dtype),
        "wo": jax.random.normal(k2, (num_experts, ffn, hidden), dtype) * s2,
        "bo": jnp.zeros((num_experts, hidden), dtype),
    }


def moe_ffn(
    params: dict,
    h: jax.Array,
    *,
    capacity_factor: float = 1.25,
    act=jax.nn.gelu,
    dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-1 MoE FFN. h: [B, S, D] (or [T, D]). Returns (out, aux_loss);
    out has h's shape and must be combined by the caller's residual (tokens
    dropped at capacity return zero here). All compute is batched einsums —
    shard params' leading E axis over an 'expert' mesh axis for ep."""
    orig_shape = h.shape
    d = orig_shape[-1]
    x = h.reshape(-1, d)
    if dtype is not None:
        x = x.astype(dtype)
    t = x.shape[0]
    e = params["wi"].shape[0]
    cap = max(1, math.ceil(capacity_factor * t / e))

    logits = x @ params["router"]["kernel"].astype(x.dtype)  # [T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate = jnp.max(probs, axis=-1)            # [T] router weight of chosen expert
    choice = jnp.argmax(probs, axis=-1)       # [T] top-1 expert id

    # position of each token within its expert's queue (stable, in token
    # order); >= cap → dropped
    onehot = jax.nn.one_hot(choice, e, dtype=jnp.int32)        # [T, E]
    pos = jnp.cumsum(onehot, axis=0) * onehot                  # 1-based slot
    slot = jnp.sum(pos, axis=-1) - 1                           # [T], -1 if none
    keep = (slot >= 0) & (slot < cap)

    # dispatch [T, E, C]: one-hot token -> (expert, slot); combine adds the
    # router gate weight
    dispatch = (jax.nn.one_hot(choice, e, dtype=x.dtype)[:, :, None]
                * jax.nn.one_hot(jnp.where(keep, slot, -1), cap, dtype=x.dtype)[:, None, :])
    combine = dispatch * gate.astype(x.dtype)[:, None, None]

    expert_in = jnp.einsum("td,tec->ecd", x, dispatch)          # [E, C, D]
    hmid = act(jnp.einsum("ecd,edf->ecf", expert_in,
                          params["wi"].astype(x.dtype))
               + params["bi"].astype(x.dtype)[:, None, :])
    expert_out = (jnp.einsum("ecf,efd->ecd", hmid, params["wo"].astype(x.dtype))
                  + params["bo"].astype(x.dtype)[:, None, :])
    out = jnp.einsum("ecd,tec->td", expert_out, combine)        # [T, D]

    # Switch aux loss: E * sum_e (token fraction_e * mean prob_e)
    frac = jnp.mean(jax.nn.one_hot(choice, e, dtype=jnp.float32), axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac * mean_prob)
    return out.astype(h.dtype).reshape(orig_shape), aux


def expert_partition_spec(mesh_axis: str = "expert"):
    """PartitionSpecs for init_moe_ffn params: experts sharded on the
    leading E axis, router replicated. jax.device_put(params, specs) under
    the mesh + jit(moe_ffn) → XLA inserts the dispatch/combine all-to-alls."""
    from jax.sharding import PartitionSpec as P

    return {
        "router": {"kernel": P()},
        "wi": P(mesh_axis), "bi": P(mesh_axis),
        "wo": P(mesh_axis), "bo": P(mesh_axis),
    }


def make_ep_mesh(n_experts_shards: int, devices=None):
    import numpy as np

    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())[:n_experts_shards]
    return Mesh(np.array(devices), ("expert",))
