"""Fused patch-embed kernel vs the XLA stage (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import VisionConfig
from efficientvlm_tpu.models.vit import init_vit, vit_apply
from efficientvlm_tpu.ops.pallas_patch_embed import fused_patch_embed


def _cfg(width=128, image_res=32, patch=8, layers=2, heads=4):
    return VisionConfig.create(
        vision_width=width, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=2 * width, image_res=image_res, patch_size=patch,
        local_attn_depth=0,
    )


def _xla_embed(params, images, cfg):
    from efficientvlm_tpu.ops.basic import layer_norm

    patches = jax.lax.conv_general_dilated(
        images, params["patch_embed"]["kernel"],
        window_strides=(cfg["patch_size"], cfg["patch_size"]),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = patches.shape[0]
    patches = patches.reshape(b, -1, cfg["vision_width"])
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, cfg["vision_width"]))
    h = jnp.concatenate([cls, patches], axis=1)
    h = h + params["pos_embed"]["embedding"][None, : h.shape[1]]
    return layer_norm(params["pre_ln"], h, eps=1e-5)


def test_fused_patch_embed_matches_xla():
    """Exact stage equivalence (f32): conv-as-matmul + pos + pre-LN. The
    8x8x3 patch K=192 also exercises the lane padding path (192 -> 256)."""
    cfg = _cfg()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    ref = _xla_embed(params, images, cfg)
    out = fused_patch_embed(params, images, patch_size=cfg["patch_size"],
                            vision_width=cfg["vision_width"])
    assert out.shape == ref.shape  # [3, 1+16, 128]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=2e-5)


def test_fused_patch_embed_nonsquare_block_pad():
    """Np not a multiple of the row block: padded rows must not leak."""
    cfg = _cfg(width=128, image_res=40, patch=8)  # Np = 25
    params = init_vit(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 40, 3))
    ref = _xla_embed(params, images, cfg)
    out = fused_patch_embed(params, images, patch_size=cfg["patch_size"],
                            vision_width=cfg["vision_width"])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=2e-5)


def test_fused_patch_embed_grads_match_xla():
    """custom_vjp: kernel forward, XLA-reference backward — grads w.r.t.
    patch kernel / pos embed / CLS / pre-LN match the plain stage."""
    cfg = _cfg()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.2

    sub = {k: params[k] for k in
           ("patch_embed", "pos_embed", "class_embedding", "pre_ln")}

    def loss_fused(s):
        p = dict(params, **s)
        return jnp.sum(fused_patch_embed(
            p, images, patch_size=cfg["patch_size"],
            vision_width=cfg["vision_width"]) ** 2)

    def loss_xla(s):
        p = dict(params, **s)
        return jnp.sum(_xla_embed(p, images, cfg) ** 2)

    va, ga = jax.value_and_grad(loss_fused)(sub)
    vb, gb = jax.value_and_grad(loss_xla)(sub)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-4, rtol=2e-3)


def test_vit_apply_fused_impl_dispatch():
    """vit_apply(impl='fused') routes through the kernel at lane widths and
    stays equivalent to the XLA path end-to-end."""
    cfg = _cfg()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    ref = vit_apply(params, images, cfg, impl="xla")["last_hidden"]
    out = vit_apply(params, images, cfg, impl="fused")["last_hidden"]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=5e-5, rtol=5e-5)
