"""MoE FFN (ops/moe.py): Switch-style top-1 routing with dense one-hot
dispatch — einsum-only, static shapes — and expert parallelism as a
sharding of the leading E axis. No reference counterpart (reference FFNs
are dense); certified like the other parallel hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.ops.moe import (
    expert_partition_spec,
    init_moe_ffn,
    make_ep_mesh,
    moe_ffn,
)

D, F, E = 16, 32, 4


@pytest.fixture(scope="module")
def setup():
    params = init_moe_ffn(jax.random.PRNGKey(0), hidden=D, ffn=F, num_experts=E)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 12, D))
    return params, h


def _reference_per_token(params, h):
    """Route each token through its argmax expert's FFN, scaled by the
    router prob — the semantics the dense-dispatch einsums must match."""
    x = np.asarray(h).reshape(-1, D)
    logits = x @ np.asarray(params["router"]["kernel"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for t in range(x.shape[0]):
        e = int(np.argmax(probs[t]))
        mid = np.asarray(jax.nn.gelu(
            jnp.asarray(x[t] @ np.asarray(params["wi"][e]) + np.asarray(params["bi"][e]))))
        out[t] = (mid @ np.asarray(params["wo"][e]) + np.asarray(params["bo"][e])) * probs[t].max()
    return out.reshape(np.asarray(h).shape)


def test_moe_matches_per_token_reference(setup):
    params, h = setup
    out, aux = moe_ffn(params, h, capacity_factor=8.0)  # no drops
    np.testing.assert_allclose(np.asarray(out), _reference_per_token(params, h),
                               rtol=1e-4, atol=1e-5)
    assert float(aux) >= 1.0 - 1e-5  # E * sum f*P is minimized at 1 (uniform)


def test_moe_capacity_drops_to_zero(setup):
    """Tokens routed past an expert's static capacity contribute ZERO (the
    caller's residual carries them) — the standard Switch trade for static
    shapes."""
    params, h = setup
    t = h.shape[0] * h.shape[1]
    out, _ = moe_ffn(params, h, capacity_factor=1.0 / t * E)  # cap = 1 slot
    ref = _reference_per_token(params, h)
    flat_out = np.asarray(out).reshape(-1, D)
    flat_ref = ref.reshape(-1, D)
    zeros = np.all(flat_out == 0, axis=-1)
    assert zeros.sum() >= t - E  # at most one token per expert survives
    kept = ~zeros
    np.testing.assert_allclose(flat_out[kept], flat_ref[kept], rtol=1e-4, atol=1e-5)


def test_moe_expert_parallel_sharding(setup):
    """ep: experts sharded over an ('expert',) mesh — XLA inserts the
    dispatch/combine collectives; results match the unsharded op."""
    params, h = setup
    ref, ref_aux = moe_ffn(params, h, capacity_factor=2.0)
    mesh = make_ep_mesh(4)
    from jax.sharding import NamedSharding

    specs = expert_partition_spec()
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: hasattr(x, "shape"))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        out, aux = jax.jit(
            lambda p, x: moe_ffn(p, x, capacity_factor=2.0))(sharded, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux), float(ref_aux), rtol=1e-5)


def test_moe_differentiable(setup):
    params, h = setup

    def loss(p):
        out, aux = moe_ffn(p, h, capacity_factor=2.0)
        return jnp.sum(out ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())
    # router gets gradient through the gate weights and aux loss
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0
