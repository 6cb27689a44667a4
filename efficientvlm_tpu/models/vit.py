"""CLIP-ViT vision encoder, functional and gated.

One implementation replaces both reference towers (models/clip_vit.py dense
teacher and efficient_models/eff_vit.py gated student): gates are arguments
and `None` compiles to the dense program.

Structure (reference models/clip_vit.py:337-393):
  conv patch-embed (no bias) -> [CLS] + learned pos-embed -> pre-LN ->
  N pre-LN transformer layers (quick_gelu MLP) -> post-LN over the full
  sequence.

Region batches: the last `local_attn_depth` layers optionally run "local"
attention where grouped per-region rows (gathered via idx_to_group_img) are
stacked on top of the full-attention batch and masked to their patch boxes
(reference clip_vit.py:291-326).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import VisionConfig
from ..ops.attention import init_attention, make_attention_bias, multi_head_attention
from ..ops.basic import (
    ACT2FN, dense, dropout, init_dense, init_layer_norm, layer_norm,
    uniform_layers as _uniform_layers,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_vit(key: Array, cfg: VisionConfig) -> dict:
    d = cfg["vision_width"]
    p = cfg["patch_size"]
    n_pos = cfg.num_patches + 1
    keys = jax.random.split(key, cfg["num_hidden_layers"] + 3)

    params = {
        "patch_embed": {  # conv kernel stored HWIO; no bias (clip_vit.py:345-347)
            "kernel": jax.random.normal(keys[0], (p, p, 3, d)) * 0.02,
        },
        "class_embedding": jax.random.normal(keys[1], (d,)) * 0.02,
        "pos_embed": {"embedding": jax.random.normal(keys[2], (n_pos, d)) * 0.02},
        "pre_ln": init_layer_norm(d),
        "post_ln": init_layer_norm(d),
        "layers": [],
    }
    for i in range(cfg["num_hidden_layers"]):
        lk = jax.random.split(keys[3 + i], 3)
        params["layers"].append(
            {
                "ln1": init_layer_norm(d),
                "attn": init_attention(lk[0], d, cfg["num_attention_heads"]),
                "ln2": init_layer_norm(d),
                "mlp": {
                    "fc1": init_dense(lk[1], d, cfg["intermediate_size"]),
                    "fc2": init_dense(lk[2], cfg["intermediate_size"], d),
                },
            }
        )
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _num_heads(layer_params: dict, head_dim: int) -> int:
    if layer_params.get("attn") is None:
        return 0
    q = layer_params["attn"]["q"]
    k = q.get("kernel", q.get("kernel_q8", q.get("kernel_q8a8")))
    return k.shape[1] // head_dim


def vit_layer(
    lp: dict,
    h: Array,
    *,
    num_heads: int,
    act,
    bias: Optional[Array] = None,
    key_mask: Optional[Array] = None,
    head_z: Optional[Array] = None,
    head_layer_z: Optional[Array] = None,
    mlp_z: Optional[Array] = None,
    output_probs: bool = False,
    dropout_rate: float = 0.0,
    rng: Optional[Array] = None,
    train: bool = False,
    dtype=None,
    impl: str = "xla",
):
    probs = None
    if lp.get("attn") is not None:  # fully-pruned attention -> identity
        residual = h
        x = layer_norm(lp["ln1"], h, eps=1e-5)
        use_fused = (
            # a generic [B,1,*,S] bias forces XLA, but a KEY-VECTOR mask
            # fuses: the kernel takes [B,S] masks natively, and the GD
            # region masks (reference clip_vit.py:292-300 image_atts_blk,
            # built from [B,S] patch atts) are exactly that — the reference
            # merely broadcast-expands them to (bs,1,S,S). vit_apply passes
            # the vector form alongside the XLA bias (VERDICT r4 #7).
            impl == "fused" and (bias is None or key_mask is not None)
            # train-mode forwards are differentiated: fuse them only via the
            # custom_vjp (XLA-recompute backward) path, and only when the
            # kernel computes the complete attention (no dropout)
            and (not train or dropout_rate == 0.0)
            and x.shape[-1] >= 128  # sub-lane widths (tiny test configs)
            # intermittently fail Mosaic compile and gain nothing from fusion
            and "kernel" in lp["attn"]["q"]  # int8-quantized params run XLA
        )
        if use_fused:
            # short sequences (197 at 224px) pad keys +30% to the lane
            # width and measurably lose to XLA — see lane_pad_efficient
            from ..ops.pallas_fused_mha import lane_pad_efficient

            use_fused = lane_pad_efficient(x.shape[1])
        if use_fused:
            from ..ops.pallas_fused_mha import fused_self_attention

            # output_probs no longer forces the XLA fallback: the kernel
            # emits the softmax maps the KD taps need (VERDICT r2 #5)
            res = fused_self_attention(
                lp["attn"], x.astype(dtype) if dtype is not None else x,
                num_heads=num_heads, mask=key_mask, head_z=head_z,
                return_probs=output_probs, differentiable=train,
            )
            attn_out, probs = res if output_probs else (res, None)
            if head_layer_z is not None:
                attn_out = attn_out * jnp.asarray(head_layer_z, attn_out.dtype)
        else:
            attn_out, probs, _ = multi_head_attention(
                lp["attn"],
                x,
                num_heads=num_heads,
                bias=bias,
                head_z=head_z,
                head_layer_z=head_layer_z,
                output_probs=output_probs,
                dropout_rate=dropout_rate,
                rng=rng,
                train=train,
                dtype=dtype,
                impl="xla" if impl == "fused" else impl,
            )
        h = residual + attn_out

    if lp.get("mlp") is not None:  # fully-pruned FFN -> identity
        residual = h
        x = layer_norm(lp["ln2"], h, eps=1e-5)
        x = dense(lp["mlp"]["fc1"], x, dtype=dtype)
        if mlp_z is not None:
            # mask FFN intermediate dims BETWEEN fc1 and the activation —
            # eff_vit.py:214-218 (CLIPMLP: fc1 -> mul(mlp_z) -> act -> fc2).
            # NOTE this differs from the text tower, where the reference
            # gates AFTER the activation (eff_bert.py:543-556); for binary
            # masks both orders agree (act(0)=0), but the stochastic
            # training gates are continuous and act(z*x) != z*act(x) — the
            # trajectory differential caught the post-act variant here.
            x = x * mlp_z.astype(x.dtype)
        x = act(x)
        x = dense(lp["mlp"]["fc2"], x, dtype=dtype)
        h = residual + x
    return h, probs


def vit_apply(
    params: dict,
    images: Array,
    cfg: VisionConfig,
    *,
    idx_to_group_img: Optional[Array] = None,
    image_atts: Optional[Array] = None,
    head_z: Optional[Array] = None,
    head_layer_z: Optional[Array] = None,
    mlp_z: Optional[Array] = None,
    output_attentions: bool = False,
    output_hidden_states: bool = False,
    train: bool = False,
    rng: Optional[Array] = None,
    dtype=None,
    impl: str = "xla",
):
    """Forward the vision tower.

    images: [B, H, W, 3] (NHWC — TPU-native conv layout; the torch reference
    uses NCHW, transposed at the data layer).
    head_z/mlp_z: [L, num_heads] / [L, intermediate] stacked per-layer gates
    (or per-layer list; None = dense).
    Returns dict(last_hidden, hidden_states, attentions, full_atts_hidden).
    """
    act = ACT2FN[cfg["hidden_act"]]
    depth = cfg["num_hidden_layers"]
    local_attn_depth = cfg.get("local_attn_depth", 0)
    head_dim = cfg["vision_width"] // cfg["num_attention_heads"]

    # fused patch embed (SURVEY §2.8): conv-as-matmul + pos add + pre-LN in
    # one Pallas kernel — saves two [B, Np, D] HBM round-trips vs the XLA
    # conv -> concat -> add -> LN chain. Lane-width models only; int8
    # exports keep the XLA conv (their patch kernel stays float anyway, but
    # the guard keys on the param format for uniformity with bert/use_fused)
    use_fused_embed = (
        impl == "fused"
        and cfg["vision_width"] % 128 == 0
        and "kernel" in params["patch_embed"]
        # the kernel's patch reshape needs exact tiling; the XLA VALID conv
        # tolerates (truncates) a remainder — fall back rather than crash
        and images.shape[1] % cfg["patch_size"] == 0
        and images.shape[2] % cfg["patch_size"] == 0
    )
    if use_fused_embed:
        from ..ops.pallas_patch_embed import fused_patch_embed

        # dtype=None matches the XLA branch's promotion semantics (bf16
        # images x f32 params compute/return f32, not images.dtype)
        h = fused_patch_embed(
            params, images, patch_size=cfg["patch_size"],
            vision_width=cfg["vision_width"],
            dtype=dtype if dtype is not None else jnp.result_type(
                images.dtype, params["patch_embed"]["kernel"].dtype))
        b = h.shape[0]
    else:
        patches = jax.lax.conv_general_dilated(
            images.astype(dtype) if dtype is not None else images,
            params["patch_embed"]["kernel"].astype(dtype) if dtype is not None else params["patch_embed"]["kernel"],
            window_strides=(cfg["patch_size"], cfg["patch_size"]),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = patches.shape[0]
        patches = patches.reshape(b, -1, cfg["vision_width"])
        cls = jnp.broadcast_to(params["class_embedding"].astype(patches.dtype), (b, 1, cfg["vision_width"]))
        h = jnp.concatenate([cls, patches], axis=1)
        h = h + params["pos_embed"]["embedding"][None, : h.shape[1]].astype(h.dtype)
        h = layer_norm(params["pre_ln"], h, eps=1e-5)
    if cfg.get("act_partition"):
        # context-parallel hook (SURVEY §5.7): pin [B, S, D] activations to
        # the cfg axes (e.g. ["data","seq"]); GSPMD propagates through the
        # layer stack and inserts the attention K/V all-gathers
        from ..parallel.sharding import constrain_activations

        h = constrain_activations(h, cfg["act_partition"])

    # Region local-attention bias (clip_vit.py:291-300): grouped rows get
    # per-region patch masks; the original full-attention rows get all-ones.
    local_bias = None
    local_key_mask = None
    if idx_to_group_img is not None and image_atts is not None:
        if local_attn_depth <= 0:
            # the grouped-copy gather happens at the local-attention
            # boundary (same as the reference, clip_vit.py:301-311): with 0
            # local layers no region rows exist and downstream bbox heads
            # would see batch-0 tensors — fail loudly at trace time instead
            raise ValueError(
                "region batches (idx_to_group_img) require a vision config "
                "with local_attn_depth > 0 (the reference uses 2-layer "
                "local attention for region representations)")
        full_atts = jnp.ones((h.shape[0], h.shape[1]), jnp.float32)
        atts_blk = jnp.concatenate([image_atts.astype(jnp.float32), full_atts], axis=0)
        local_bias = make_attention_bias(atts_blk)
        local_key_mask = atts_blk  # vector form: fuses (vit_layer key_mask)

    # lax.scan over uniform layers: shrinks the traced graph ~depth-x — the
    # unrolled loop makes teacher+KD steps take minutes to trace at 12
    # layers. Works gated too (gates/rngs ride as scan xs with a leading L
    # dim). Unrolled path remains for region batches and post-export models
    # (per-layer shapes differ).
    def _scannable_gate(z):
        return z is None or (hasattr(z, "shape") and z.ndim >= 1 and z.shape[0] == depth)

    use_scan = (
        cfg.get("scan_layers", False)
        and idx_to_group_img is None and local_attn_depth == 0
        and all(_scannable_gate(z) for z in (head_z, head_layer_z, mlp_z))
        and _uniform_layers(params["layers"])  # post-export shapes differ
    )
    if use_scan:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
        # derive the head count from the (uniform) param shapes, NOT the
        # config: a uniformly-pruned physical export keeps fewer heads than
        # cfg.num_attention_heads yet still satisfies _uniform_layers, so
        # the scan path must size heads like the unrolled path does
        nh = _num_heads(params["layers"][0], head_dim)
        xs = {"params": stacked}
        if head_z is not None:
            xs["head_z"] = jnp.asarray(head_z)
        if head_layer_z is not None:
            xs["head_layer_z"] = jnp.asarray(head_layer_z)
        if mlp_z is not None:
            xs["mlp_z"] = jnp.asarray(mlp_z)
        if rng is not None:
            xs["rng"] = jax.random.split(rng, depth)

        def body(carry, x):
            out, probs = vit_layer(
                x["params"], carry, num_heads=nh, act=act,
                head_z=x.get("head_z"), head_layer_z=x.get("head_layer_z"),
                mlp_z=x.get("mlp_z"),
                output_probs=output_attentions,
                dropout_rate=cfg.get("attention_dropout", 0.0),
                rng=x.get("rng"), train=train, dtype=dtype, impl=impl,
            )
            ys = []
            if output_hidden_states:
                ys.append(carry)
            if output_attentions:
                ys.append(probs)
            return out, tuple(ys)

        if cfg.get("remat", False):
            body = jax.checkpoint(body)
        h_final, ys = jax.lax.scan(body, h, xs)
        yi = 0
        all_hidden = None
        all_probs = None
        if output_hidden_states:
            all_hidden = [ys[yi][i] for i in range(depth)] + [h_final]
            yi += 1
        if output_attentions:
            all_probs = [ys[yi][i] for i in range(depth)]
        h = layer_norm(params["post_ln"], h_final, eps=1e-5)
        return {"last_hidden": h, "hidden_states": all_hidden, "attentions": all_probs}

    all_hidden = [] if output_hidden_states else None
    all_probs = [] if output_attentions else None
    do_gather = idx_to_group_img is not None

    def layer_gate(z, i):
        if z is None:
            return None
        return z[i]

    for i in range(depth):
        if output_hidden_states:
            all_hidden.append(h)
        is_local = local_attn_depth > 0 and i >= depth - local_attn_depth
        bias_i = None
        key_mask_i = None
        if is_local and do_gather:
            # stack grouped per-region rows on top of full-attention batch
            gathered = jnp.take(h, idx_to_group_img, axis=0)
            h = jnp.concatenate([gathered, h], axis=0)
            do_gather = False
        if is_local and local_bias is not None:
            bias_i = local_bias
            key_mask_i = local_key_mask
        lrng = None
        if rng is not None:
            rng, lrng = jax.random.split(rng)
        h, probs = vit_layer(
            params["layers"][i],
            h,
            num_heads=_num_heads(params["layers"][i], head_dim),
            act=act,
            bias=bias_i,
            key_mask=key_mask_i,
            head_z=layer_gate(head_z, i),
            head_layer_z=layer_gate(head_layer_z, i),
            mlp_z=layer_gate(mlp_z, i),
            output_probs=output_attentions,
            dropout_rate=cfg.get("attention_dropout", 0.0),
            rng=lrng,
            train=train,
            dtype=dtype,
            impl=impl,
        )
        if output_attentions:
            all_probs.append(probs)
    if output_hidden_states:
        all_hidden.append(h)

    h = layer_norm(params["post_ln"], h, eps=1e-5)

    out = {"last_hidden": h, "hidden_states": all_hidden, "attentions": all_probs}
    if idx_to_group_img is not None:
        bs = idx_to_group_img.shape[0]
        out["last_hidden"] = h[:bs]
        out["full_atts_hidden"] = h[bs:]
    return out


def interpolate_pos_embed(pos_embed: jnp.ndarray, num_patches_new: int) -> jnp.ndarray:
    """Bicubic pos-embed interpolation for resolution changes
    (reference models/vit.py:222-246) — [N+1, D] -> [N'+1, D]."""
    n_extra = 1  # CLS
    emb = pos_embed[n_extra:]
    cls = pos_embed[:n_extra]
    size_old = int(emb.shape[0] ** 0.5)
    size_new = int(num_patches_new**0.5)
    if size_old == size_new:
        return pos_embed
    d = emb.shape[-1]
    grid = emb.reshape(size_old, size_old, d)
    grid = jax.image.resize(grid, (size_new, size_new, d), method="bicubic")
    return jnp.concatenate([cls, grid.reshape(size_new * size_new, d)], axis=0)
