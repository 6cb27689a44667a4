"""GPipe-style pipeline parallelism over a uniform transformer layer stack.

The reference framework has no pipeline parallelism (its DDP replicates the
whole model, apex_ddp_accelerator.py); this is a TPU-native extension in the
same spirit as the tensor/sequence hooks in `parallel/sharding.py`: the
'stage' mesh axis exists so pipelining a deeper model family is a config
flip, not an API change.

Design (the shard_map pipelining recipe): the L stacked layer params are
sharded over the 'stage' axis — each of the S stages holds L/S layers and
scans them locally. The batch is split into M microbatches; for
T = M + S - 1 ticks every stage processes one activation and hands it to
its successor with a single `lax.ppermute` hop (ICI neighbour traffic, no
all-to-all). Stage 0 feeds microbatch t on tick t; the last stage emits
microbatch t-(S-1). The whole schedule is a `lax.scan`, so it is traced
once, and because ppermute/scan are differentiable the SAME code pipelines
the backward pass (activations ppermute forward, cotangents ppermute
backward in the transposed scan) — `pipeline_apply` works under `jax.grad`.

Bubble fraction is the textbook (S-1)/(M+S-1); pick n_micro >= 4*S for >90%
utilisation. Everything here assumes a shape-uniform stack (the same
constraint as the `scan_layers` fast path in models/bert.py:301-318).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def stack_layers(layers):
    """[{param tree} x L] -> one tree with a leading L axis on every leaf
    (the shard_map input: in_spec P('stage') shards the L axis)."""
    return jax.tree.map(lambda *x: jnp.stack(x), *layers)


def pipeline_apply(
    layer_fn: Callable[[Any, jax.Array, Any], jax.Array],
    local_params,
    x: jax.Array,
    aux: Any = None,
    *,
    n_stages: int,
    n_micro: int,
    axis_name: str = "stage",
) -> jax.Array:
    """Run the pipelined stack. Call INSIDE shard_map over `axis_name`.

    layer_fn(layer_params, h, aux) -> h — one layer, h is [mb, ...].
    local_params — this stage's layer shard: leading dim L/S (pass the
        stacked tree through shard_map with in_specs P(axis_name)).
    x — the full [B, ...] activations, replicated across stages
        (in_specs P()); B must divide by n_micro.
    aux — optional pytree of batch-leading arrays that ride along with each
        microbatch unchanged (attention bias etc.); replicated like x.

    Returns the full [B, ...] outputs, replicated on every stage (one psum
    broadcast from the last stage).
    """
    stage = jax.lax.axis_index(axis_name)
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    xm = x.reshape(n_micro, mb, *x.shape[1:])
    auxm = jax.tree.map(
        lambda a: a.reshape(n_micro, mb, *a.shape[1:]), aux)

    def stage_fn(h, a):
        def body(c, p):
            return layer_fn(p, c, a), None

        h, _ = jax.lax.scan(body, h, local_params)
        return h

    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        state, out = carry
        mi = jnp.clip(t, 0, n_micro - 1)
        fresh = jax.lax.dynamic_index_in_dim(xm, mi, 0, keepdims=False)
        a = jax.tree.map(
            lambda v: jax.lax.dynamic_index_in_dim(v, mi, 0, keepdims=False),
            auxm)
        # stage 0 always consumes fresh input; later stages consume what the
        # predecessor ppermuted in last tick (garbage during fill ticks —
        # computed but never written to `out`)
        h = jnp.where(stage == 0, fresh, state)
        y = stage_fn(h, a)
        oi = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        prev = jax.lax.dynamic_index_in_dim(out, oi, 0, keepdims=False)
        write = (t >= n_stages - 1) & (stage == n_stages - 1)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(write, y, prev), oi, 0)
        state = jax.lax.ppermute(y, axis_name, fwd_perm)
        return (state, out), None

    state0 = jnp.zeros_like(xm[0])
    out0 = jnp.zeros_like(xm)
    (_, out), _ = jax.lax.scan(
        tick, (state0, out0), jnp.arange(n_micro + n_stages - 1))
    # only the last stage holds real outputs; psum broadcasts them so the
    # result is replicated (matches the replicated-activations contract of
    # the surrounding model code)
    out = jax.lax.psum(
        jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)), axis_name)
    return out.reshape(b, *x.shape[1:])


def make_pp_mesh(n_stages: int, devices=None):
    from jax.sharding import Mesh

    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[:n_stages]
    return Mesh(np.array(devices), ("stage",))


def pipelined_stack_forward(
    layer_fn, stacked_params, x, aux=None, *, mesh, n_micro,
):
    """Convenience wrapper: shard the stacked [L, ...] params over 'stage'
    and run `pipeline_apply` under shard_map on `mesh` (a ('stage',) mesh
    from make_pp_mesh). x/aux replicated in, result replicated out."""
    from jax.sharding import PartitionSpec as P

    n_stages = mesh.shape["stage"]
    leading = jax.tree.leaves(stacked_params)[0].shape[0]
    assert leading % n_stages == 0, (leading, n_stages)

    def run(lp, xx, aa):
        return pipeline_apply(
            layer_fn, lp, xx, aa, n_stages=n_stages, n_micro=n_micro)

    return jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(P("stage"), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )(stacked_params, x, aux)
