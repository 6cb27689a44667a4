"""DeiT-style ViT — alternative vision encoder (reference models/vit.py,
timm-style; kept for parity: "worse than clip-vit", models/xvlm.py:165).

Differences from the CLIP tower (models/vit.py here): patch-embed conv has a
bias, positional embedding is a plain parameter added before dropout, no
pre-LN, standard gelu MLP, final LayerNorm. Supports the same head/mlp gates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import VisionConfig
from ..ops.attention import init_attention, multi_head_attention
from ..ops.basic import dense, dropout, gelu, init_dense, init_layer_norm, layer_norm

Array = jax.Array


def init_deit(key: Array, cfg: VisionConfig) -> dict:
    d = cfg["vision_width"]
    p = cfg["patch_size"]
    n_pos = cfg.num_patches + 1
    keys = jax.random.split(key, cfg["num_hidden_layers"] + 3)
    params = {
        "patch_embed": {
            "kernel": jax.random.normal(keys[0], (p, p, 3, d)) * 0.02,
            "bias": jnp.zeros((d,)),
        },
        "cls_token": jax.random.normal(keys[1], (d,)) * 0.02,
        "pos_embed": {"embedding": jax.random.normal(keys[2], (n_pos, d)) * 0.02},
        "norm": init_layer_norm(d),
        "layers": [],
    }
    for i in range(cfg["num_hidden_layers"]):
        lk = jax.random.split(keys[3 + i], 3)
        params["layers"].append({
            "ln1": init_layer_norm(d),
            "attn": init_attention(lk[0], d, cfg["num_attention_heads"]),
            "ln2": init_layer_norm(d),
            "mlp": {
                "fc1": init_dense(lk[1], d, cfg["intermediate_size"]),
                "fc2": init_dense(lk[2], cfg["intermediate_size"], d),
            },
        })
    return params


def deit_apply(
    params: dict,
    images: Array,
    cfg: VisionConfig,
    *,
    head_z=None,
    mlp_z=None,
    output_attentions: bool = False,
    output_hidden_states: bool = False,
    train: bool = False,
    rng: Optional[Array] = None,
    dtype=None,
    impl: str = "xla",
) -> dict:
    head_dim = cfg["vision_width"] // cfg["num_attention_heads"]
    x = jax.lax.conv_general_dilated(
        images.astype(dtype) if dtype is not None else images,
        params["patch_embed"]["kernel"].astype(dtype) if dtype is not None else params["patch_embed"]["kernel"],
        (cfg["patch_size"], cfg["patch_size"]), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(dtype or jnp.float32)
    b = x.shape[0]
    x = x.reshape(b, -1, cfg["vision_width"])
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg["vision_width"]))
    h = jnp.concatenate([cls, x], axis=1)
    h = h + params["pos_embed"]["embedding"][None, : h.shape[1]].astype(h.dtype)

    all_hidden = [] if output_hidden_states else None
    all_probs = [] if output_attentions else None
    for i, lp in enumerate(params["layers"]):
        if output_hidden_states:
            all_hidden.append(h)
        res = h
        x = layer_norm(lp["ln1"], h, eps=1e-6)
        q = lp["attn"]["q"]
        nh = q.get("kernel", q.get("kernel_q8", q.get("kernel_q8a8"))).shape[1] // head_dim
        attn_out, probs, _ = multi_head_attention(
            lp["attn"], x, num_heads=nh,
            head_z=head_z[i] if head_z is not None else None,
            output_probs=output_attentions, dtype=dtype, impl=impl,
        )
        h = res + attn_out
        res = h
        x = gelu(dense(lp["mlp"]["fc1"], layer_norm(lp["ln2"], h, eps=1e-6), dtype=dtype))
        if mlp_z is not None:
            x = x * mlp_z[i].astype(x.dtype)
        h = res + dense(lp["mlp"]["fc2"], x, dtype=dtype)
        if output_attentions:
            all_probs.append(probs)
    if output_hidden_states:
        all_hidden.append(h)
    h = layer_norm(params["norm"], h, eps=1e-6)
    return {"last_hidden": h, "hidden_states": all_hidden, "attentions": all_probs}
