"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch schedule
over a uniform BERT layer stack must match the sequential stack exactly —
forward and backward — on a ('stage',) mesh.

The reference has no pipeline parallelism (DDP replicates the model); this
certifies the TPU-native 'stage' axis hook the same way test_zero.py
certifies ZeRO-1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.config import TextConfig
from efficientvlm_tpu.models.bert import bert_layer_apply, init_bert_layer
from efficientvlm_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    pipelined_stack_forward,
    stack_layers,
)

N_LAYERS = 4


@pytest.fixture(scope="module")
def setup():
    cfg = TextConfig.create(
        vocab_size=64, hidden_size=64, num_hidden_layers=N_LAYERS,
        num_attention_heads=4, intermediate_size=128, encoder_width=64,
        fusion_layer=N_LAYERS, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), N_LAYERS)
    layers = [init_bert_layer(k, cfg, i) for i, k in enumerate(keys)]
    b, t = 8, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg["hidden_size"]))
    mask = jnp.ones((b, t)).at[:, -3:].set(0)  # ragged-ish attention
    bias = (1.0 - mask[:, None, None, :]) * -1e9
    return cfg, layers, x, bias


def _layer_fn(cfg):
    def fn(lp, h, aux):
        out, _, _, _ = bert_layer_apply(lp, h, cfg, bias=aux)
        return out

    return fn


def _sequential(layers, x, bias, cfg):
    h = x
    for lp in layers:
        h, _, _, _ = bert_layer_apply(lp, h, cfg, bias=bias)
    return h


def test_pipeline_matches_sequential(setup):
    cfg, layers, x, bias = setup
    ref = _sequential(layers, x, bias, cfg)
    stacked = stack_layers(layers)
    mesh = make_pp_mesh(2)
    out = pipelined_stack_forward(
        _layer_fn(cfg), stacked, x, bias, mesh=mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_single_microbatch_and_full_stages(setup):
    """Degenerate schedules: S=4 stages (1 layer each) and M=1 microbatch
    both reduce to the sequential program."""
    cfg, layers, x, bias = setup
    ref = _sequential(layers, x, bias, cfg)
    stacked = stack_layers(layers)
    out = pipelined_stack_forward(
        _layer_fn(cfg), stacked, x, bias, mesh=make_pp_mesh(4), n_micro=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    out1 = pipelined_stack_forward(
        _layer_fn(cfg), stacked, x, bias, mesh=make_pp_mesh(2), n_micro=1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_backward_matches_sequential(setup):
    """The scan+ppermute schedule is differentiable: cotangents ppermute
    backward through the stages, and the per-stage param grads equal the
    sequential stack's grads (this is what makes pp a TRAINING hook, not an
    inference trick)."""
    cfg, layers, x, bias = setup
    stacked = stack_layers(layers)
    mesh = make_pp_mesh(2)
    layer_fn = _layer_fn(cfg)

    from jax.sharding import PartitionSpec as P

    def run(lp, xx, aa):
        return pipeline_apply(layer_fn, lp, xx, aa, n_stages=2, n_micro=4)

    pp_fwd = jax.shard_map(
        run, mesh=mesh, in_specs=(P("stage"), P(), P()), out_specs=P(),
        check_vma=False,
    )

    def loss_pp(st):
        return jnp.sum(pp_fwd(st, x, bias) ** 2)

    def loss_seq(st):
        h = x
        def body(c, p):
            out, _, _, _ = bert_layer_apply(p, c, cfg, bias=bias)
            return out, None
        h, _ = jax.lax.scan(body, h, st)
        return jnp.sum(h ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    flat_pp, td = jax.tree.flatten(g_pp)
    flat_seq, _ = jax.tree.flatten(g_seq)
    for a, b_ in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5)
