"""Pallas fused attention vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.ops.attention import init_attention, make_attention_bias, multi_head_attention
from efficientvlm_tpu.ops.pallas_attention import flash_attention


def test_flash_attention_matches_reference():
    B, H, Tq, Tk, dh = 2, 4, 37, 53, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Tq, dh)) * 0.125
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Tk, dh))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, Tk, dh))
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (B, Tk)) > 0.2).astype(jnp.float32)
    bias = make_attention_bias(mask)

    ref = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias, -1) @ v
    out = flash_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)

    ref2 = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), -1) @ v
    out2 = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ref2), np.asarray(out2), atol=2e-5)


def test_mha_impl_dispatch_equivalence():
    """multi_head_attention(impl='pallas') == impl='xla', incl. head gates."""
    d, h = 64, 4
    params = init_attention(jax.random.PRNGKey(0), d, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, d))
    mask = jnp.ones((2, 10), jnp.int32).at[1, 7:].set(0)
    bias = make_attention_bias(mask)
    head_z = jnp.asarray([1.0, 0.5, 0.0, 1.0])

    out_x, _, _ = multi_head_attention(params, x, num_heads=h, bias=bias, head_z=head_z, impl="xla")
    out_p, _, _ = multi_head_attention(params, x, num_heads=h, bias=bias, head_z=head_z, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p), atol=2e-5)


def test_flash_attention_grouped_matches_einsum():
    """Grouped-K/V flash kernel == grouped XLA einsum (the k_test rerank /
    fusion-stack hot path, VERDICT r4 #4). Also checks the kernel actually
    engages at a lane-pad-efficient key length, per-kv-row bias, tq>=16."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientvlm_tpu.ops.attention import (
        init_attention, make_attention_bias, multi_head_attention)

    bk, g, h, tq, s, d = 2, 16, 2, 24, 120, 128
    params = init_attention(jax.random.PRNGKey(0), d, h, kv_width=96)
    q_in = jax.random.normal(jax.random.PRNGKey(1), (bk * g, tq, d)) * 0.1
    kv_in = jax.random.normal(jax.random.PRNGKey(2), (bk, s, 96)) * 0.1
    mask = jnp.ones((bk, s), jnp.int32).at[1, 100:].set(0)
    bias = make_attention_bias(mask)
    hz = jnp.asarray([1.0, 0.5])

    outs = {}
    for impl in ("xla", "fused"):
        out, _, _ = multi_head_attention(
            params, q_in, kv_in, num_heads=h, bias=bias, head_z=hz,
            kv_groups=g, impl=impl)
        outs[impl] = np.asarray(out)
    np.testing.assert_allclose(outs["xla"], outs["fused"], atol=3e-5)

    # per-QUERY-row bias (a beam-expanded mask) must fall back to the XLA
    # einsum (the kernel only takes per-group vectors) and stay correct
    bias_q = make_attention_bias(jnp.repeat(mask, g, axis=0))
    a, _, _ = multi_head_attention(params, q_in, kv_in, num_heads=h,
                                   bias=bias_q, head_z=hz, kv_groups=g,
                                   impl="fused")
    np.testing.assert_allclose(np.asarray(a), outs["xla"], atol=3e-5)
    jx_q = str(jax.make_jaxpr(lambda p, q, kv: multi_head_attention(
        p, q, kv, num_heads=h, bias=bias_q, kv_groups=g, impl="fused")[0]
    )(params, q_in, kv_in))
    assert "pallas_call" not in jx_q

    jx = str(jax.make_jaxpr(lambda p, q, kv: multi_head_attention(
        p, q, kv, num_heads=h, bias=bias, kv_groups=g, impl="fused")[0]
    )(params, q_in, kv_in))
    assert "pallas_call" in jx
