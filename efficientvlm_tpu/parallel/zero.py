"""ZeRO-1 optimizer-state sharding over the data axis (pjit/GSPMD).

The reference trains pure DDP: every rank holds a full replica of the
AdamW moments (apex_ddp_accelerator.py DDP + optim.py). For the KD
fine-tune state that is 3 optimizers' worth of f32 moments — about 2x
params bytes for the main AdamW alone — replicated N ways. On TPU pods
the idiomatic fix is not a hand-written ZeRO: declare the moment arrays
SHARDED over the 'data' mesh axis in the step's in/out shardings and let
XLA's SPMD partitioner place the reduce-scatter / all-gather (the same
mechanism t5x/flax call "optimizer state partitioning").

Usage (opt-in; the step must be built with axis_name=None — global-batch
semantics, no explicit pmean/all_gather; XLA inserts the collectives):

    step = make_retrieval_train_step(..., axis_name=None)
    fn, mesh, n = zero1_step(step, state, with_teacher=True)
    state = jax.device_put(state, state_shardings(mesh, state))  # once
    new_state, metrics = fn(state, batch, rng, teacher_params)

Correctness notes vs a shard_map ZeRO:
- optax.clip_by_global_norm stays GLOBAL (the program is written on
  global arrays; a sliced-grads shard_map version would clip per-shard
  norms, silently wrong);
- the ITC contrastive loss sees the global batch (get_contrastive_loss
  with axis_name=None), matching the reference's world-batch AllGather;
- results are bit-identical to the replicated jit of the same step fn
  up to XLA reduction order (tests/test_zero.py pins ~1e-6).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def _moment_spec(leaf, n: int) -> P:
    """Shard the largest dim divisible by the axis size; replicate if none.

    Prefers the largest divisible dim so the per-device shard (and the
    reduce-scatter tile) is as even as possible; 1-D and scalar leaves
    (biases, layernorm scales, step counts) stay replicated — their bytes
    are negligible and sharding them just adds collective latency.
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] >= n and shape[d] % n == 0:
            return P(*(DATA_AXIS if i == d else None for i in range(len(shape))))
    return P()


def zero1_state_specs(state, n: int):
    """PartitionSpec pytree for a train state: optimizer-state moments
    sharded (ZeRO-1), everything the forward pass reads (params, gates,
    lambdas) replicated. Accepts the KD TrainState NamedTuple or the GD
    driver's plain (params, opt_state, step) tuple."""
    if hasattr(state, "_fields"):
        fields = state._fields
    elif isinstance(state, tuple) and len(state) == 3:
        fields = ("params", "opt_state", "step")
    else:
        raise TypeError(f"unsupported train-state type {type(state)}")
    specs = []
    for name, sub in zip(fields, state):
        if name in ("opt_state", "l0_state", "lam_state"):
            specs.append(jax.tree.map(lambda x: _moment_spec(x, n), sub))
        else:
            specs.append(jax.tree.map(lambda x: P(), sub))
    return type(state)(*specs) if hasattr(state, "_fields") else tuple(specs)


def state_shardings(mesh: Mesh, state):
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), zero1_state_specs(state, n),
        is_leaf=lambda x: isinstance(x, P),
    )


def zero1_step(step_fn, state, *, with_teacher: bool = False, mesh: Optional[Mesh] = None):
    """jit step_fn(state, batch, rng[, teacher_params]) -> (state, metrics)
    with ZeRO-1 shardings: batch sharded on 'data', params/teacher
    replicated, optimizer moments sharded. Returns (fn, mesh, n_devices);
    single-device degrades to plain jit (mesh=None).

    The `state` argument is only inspected for its structure/shapes (to
    derive the sharding tree); it is not captured.
    """
    devices = jax.devices()
    n = len(devices)
    if n == 1 and mesh is None:
        return jax.jit(step_fn), None, 1
    if mesh is None:
        mesh = Mesh(np.asarray(devices), (DATA_AXIS,))
    st_sh = state_shardings(mesh, state)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    if with_teacher:
        in_shardings = (st_sh, batch_sh, repl, repl)
    else:
        in_shardings = (st_sh, batch_sh, repl)
    fn = jax.jit(step_fn, in_shardings=in_shardings, out_shardings=(st_sh, repl))
    return fn, mesh, n


def sharded_moment_bytes(state) -> dict:
    """Per-device vs replicated optimizer-state bytes (observability for
    the memory win; used by tests and the dryrun report)."""
    total = 0
    local = 0
    for name in ("opt_state", "l0_state", "lam_state"):
        for leaf in jax.tree.leaves(getattr(state, name)):
            if not hasattr(leaf, "nbytes"):
                continue
            total += leaf.nbytes
            shards = getattr(leaf, "addressable_shards", None)
            if shards:
                local += shards[0].data.nbytes
            else:
                local += leaf.nbytes
    return {"replicated_bytes": total, "per_device_bytes": local}
