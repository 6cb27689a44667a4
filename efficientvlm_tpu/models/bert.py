"""Fusion BERT: text / fusion / multi_modal / decoder modes, functional + gated.

One implementation replaces the reference's xbert.py (2091 LoC teacher) and
eff_bert.py (2168 LoC gated student). X-VLM semantics reproduced:

- layers [0, fusion_layer) are text-only self-attention; layers
  [fusion_layer, N) add image-grounded cross-attention whose K/V width is
  `encoder_width` (reference xbert.py:463, 235-240);
- encoder modes: 'text' = [0, fusion), 'fusion' = [fusion, N) over
  precomputed text embeds, 'multi_modal' = all (xbert.py:558-567);
- gates: per-layer head_z multiplies per-head context, cross layers take a
  (self_z, cross_z) pair — the reference interleaves them as
  head_z[2i], head_z[2i+1] (eff_bert.py:494-498, 612-615); mlp_z masks FFN
  intermediate activations (eff_bert.py:555-556);
- causal decoding with a fixed-size functional KV cache (replacing the
  Python-growth past_key_value tuples, eff_bert.py:1084-1087);
- MLM head with masked_pos gather (xbert.py:1560-1614) and LM head with
  shift-by-one + label smoothing (xbert.py:1197-1240, 1350-1358).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..ops.attention import (
    causal_bias,
    decode_bias,
    init_attention,
    init_decode_cache,
    make_attention_bias,
    multi_head_attention,
)
from ..ops.basic import (
    ACT2FN,
    dense,
    dropout,
    embedding_lookup,
    init_dense,
    init_embedding,
    init_layer_norm,
    layer_norm,
    uniform_layers as _uniform_layers,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def has_cross_attention(cfg: TextConfig, layer_idx: int) -> bool:
    return layer_idx >= cfg["fusion_layer"]


def init_bert_layer(key: Array, cfg: TextConfig, layer_idx: int) -> dict:
    d = cfg["hidden_size"]
    keys = jax.random.split(key, 5)
    layer = {
        "attention": init_attention(keys[0], d, cfg["num_attention_heads"]),
        "attention_ln": init_layer_norm(d),
        "intermediate": init_dense(keys[1], d, cfg["intermediate_size"]),
        "output": init_dense(keys[2], cfg["intermediate_size"], d),
        "output_ln": init_layer_norm(d),
    }
    if has_cross_attention(cfg, layer_idx):
        layer["crossattention"] = init_attention(
            keys[3], d, cfg["num_attention_heads"], kv_width=cfg["encoder_width"]
        )
        layer["crossattention_ln"] = init_layer_norm(d)
    return layer


def init_bert(key: Array, cfg: TextConfig, *, with_mlm_head: bool = False) -> dict:
    d = cfg["hidden_size"]
    keys = jax.random.split(key, cfg["num_hidden_layers"] + 6)
    params: dict = {
        "embeddings": {
            "word": init_embedding(keys[0], cfg["vocab_size"], d),
            "position": init_embedding(keys[1], cfg["max_position_embeddings"], d),
            "token_type": init_embedding(keys[2], cfg["type_vocab_size"], d),
            "ln": init_layer_norm(d),
        },
        "layers": [
            init_bert_layer(keys[3 + i], cfg, i) for i in range(cfg["num_hidden_layers"])
        ],
    }
    if with_mlm_head:
        params["cls"] = init_mlm_head(keys[-1], cfg)
    return params


def init_mlm_head(key: Array, cfg: TextConfig) -> dict:
    d = cfg["hidden_size"]
    k1, k2 = jax.random.split(key)
    return {
        "transform": {"dense": init_dense(k1, d, d), "ln": init_layer_norm(d)},
        "decoder": init_dense(k2, d, cfg["vocab_size"]),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def bert_embeddings(
    params: dict,
    input_ids: Array,
    cfg: TextConfig,
    *,
    position_offset: Array | int = 0,
    train: bool = False,
    rng: Optional[Array] = None,
    dtype=None,
) -> Array:
    t = input_ids.shape[1]
    pos_ids = jnp.arange(t)[None] + position_offset
    h = embedding_lookup(params["word"], input_ids, dtype=dtype)
    # nn.Embedding(padding_idx=pad_token_id) blocks gradients to the PAD row
    # (HF BertEmbeddings); the PAD embedding reaches the loss through the KD
    # hidden-state taps at padded positions, so without this the PAD row
    # drifts where the reference's stays frozen. stop_gradient at pad
    # positions is exactly equivalent: row `pad` only ever receives
    # gradient contributions from positions whose id == pad.
    pad = cfg.get("pad_token_id", 0)
    if pad is not None:
        h = jnp.where(
            (input_ids == pad)[..., None], jax.lax.stop_gradient(h), h
        )
    h = h + embedding_lookup(params["position"], pos_ids, dtype=dtype)
    h = h + embedding_lookup(
        params["token_type"], jnp.zeros_like(input_ids), dtype=dtype
    )
    h = layer_norm(params["ln"], h, eps=cfg.get("layer_norm_eps", 1e-12))
    return dropout(h, cfg.get("hidden_dropout_prob", 0.0), rng=rng, train=train)


def _num_heads(attn_params: dict, head_dim: int) -> int:
    q = attn_params["q"]
    k = q.get("kernel", q.get("kernel_q8", q.get("kernel_q8a8")))
    return k.shape[1] // head_dim


def bert_layer_apply(
    lp: dict,
    h: Array,
    cfg: TextConfig,
    *,
    bias: Optional[Array] = None,
    encoder_hidden: Optional[Array] = None,
    encoder_bias: Optional[Array] = None,
    self_head_z: Optional[Array] = None,
    cross_head_z: Optional[Array] = None,
    mlp_z: Optional[Array] = None,
    cache: Optional[dict] = None,
    cross_kv: Optional[dict] = None,
    encoder_groups: int = 1,
    output_probs: bool = False,
    train: bool = False,
    rng: Optional[Array] = None,
    dtype=None,
    impl: str = "xla",
):
    """Post-LN BERT layer; returns (h, self_probs, cross_probs, new_cache).
    `cross_kv` supplies pre-projected cross K/V (see precompute_cross_kv) —
    the decode hot loop must not repay the image-embed projections every
    step (reference reuses them via past_key_value, eff_bert.py:283-295).
    `encoder_groups` > 1 declares that encoder_hidden/cross_kv rows are
    SHARED by groups of contiguous query rows (grouped-K/V attention,
    ops/attention.py) — batch mismatches without it are loud errors."""
    eps = cfg.get("layer_norm_eps", 1e-12)
    head_dim = cfg["hidden_size"] // cfg["num_attention_heads"]
    act = ACT2FN[cfg.get("hidden_act", "gelu")]
    hdrop = cfg.get("hidden_dropout_prob", 0.0)
    adrop = cfg.get("attention_probs_dropout_prob", 0.0)
    rngs = list(jax.random.split(rng, 6)) if rng is not None else [None] * 6

    new_cache = cache
    self_probs = None
    self_cache = cache.get("self") if cache is not None else None
    if lp.get("attention") is not None:  # fully-pruned self-attn -> identity
        use_fused = (
            impl == "fused" and cache is None
            # train-mode: only the custom_vjp path, and only dropout-free
            # (the fused branch skips the post-attention hidden dropout)
            and (not train or (adrop == 0.0 and hdrop == 0.0))
            and (bias is None or (bias.ndim == 4 and bias.shape[2] == 1))
            and h.shape[-1] >= 128  # sub-lane widths: see vit.py use_fused
            and "kernel" in lp["attention"]["q"]  # int8 params run XLA
        )
        if use_fused:
            # text tower T=40 pads keys to 128 (3.2x masked attention
            # work) — measured loss vs XLA; see lane_pad_efficient
            from ..ops.pallas_fused_mha import lane_pad_efficient

            use_fused = lane_pad_efficient(h.shape[1])
        if use_fused:
            from ..ops.pallas_fused_mha import fused_self_attention

            res = fused_self_attention(
                lp["attention"], h.astype(dtype) if dtype is not None else h,
                num_heads=_num_heads(lp["attention"], head_dim),
                key_bias=bias[:, 0, 0, :] if bias is not None else None,
                head_z=self_head_z, return_probs=output_probs,
                differentiable=train,
            )
            attn_out, self_probs = res if output_probs else (res, None)
        else:
            attn_out, self_probs, self_cache = multi_head_attention(
                lp["attention"],
                h,
                num_heads=_num_heads(lp["attention"], head_dim),
                bias=bias,
                head_z=self_head_z,
                output_probs=output_probs,
                dropout_rate=adrop,
                rng=rngs[0],
                train=train,
                dtype=dtype,
                cache=self_cache,
                impl="xla" if impl == "fused" else impl,
            )
            attn_out = dropout(attn_out, hdrop, rng=rngs[1], train=train)
        h = layer_norm(lp["attention_ln"], h + attn_out, eps=eps)

    cross_probs = None
    if lp.get("crossattention") is not None and (
            encoder_hidden is not None or cross_kv is not None):
        can_fuse_x = (
            impl == "fused" and cache is None and cross_kv is None
            and (not train or (adrop == 0.0 and hdrop == 0.0))
            and (encoder_bias is None
                 or (encoder_bias.ndim == 4 and encoder_bias.shape[2] == 1))
            and h.shape[-1] >= 128  # sub-lane widths: see vit.py use_fused
            and "kernel" in lp["crossattention"]["q"]  # int8 params run XLA
        )  # cached decode queries are 1 token — the XLA path wins there
        if can_fuse_x:
            # cross keys = image tokens (577 at 384px: +11% pad, kernel
            # wins; 197 at 224px: +30%, XLA wins) — see lane_pad_efficient
            from ..ops.pallas_fused_mha import lane_pad_efficient

            can_fuse_x = lane_pad_efficient(encoder_hidden.shape[1])
        use_fused_x = can_fuse_x and encoder_groups == 1
        # grouped (unexpanded) encoder rows: the grouped LAYER kernel
        # projects each image's K/V once into VMEM scratch and group-folds
        # the queries into MXU-shaped row blocks — the k_test rerank hot
        # path (VERDICT r4 #4). Eval-only (no custom_vjp) and no probs.
        use_fused_xg = (
            can_fuse_x and encoder_groups > 1 and not train
            and not output_probs
            and (encoder_bias is None or encoder_bias.shape[0] in
                 (1, encoder_hidden.shape[0]))  # per-image key vector
            and encoder_groups * h.shape[1] >= 256  # decode steps stay XLA
        )
        if use_fused_xg:
            from ..ops.pallas_fused_mha import fused_cross_attention_grouped

            # the kernel's epilogue applies this layer's residual +
            # post-LayerNorm too (h = LN(h + x_out)), so the shared LN
            # line below is SKIPPED for this branch
            h = fused_cross_attention_grouped(
                lp["crossattention"], h.astype(dtype) if dtype is not None else h,
                encoder_hidden,
                num_heads=_num_heads(lp["crossattention"], head_dim),
                kv_groups=encoder_groups,
                key_bias=(jnp.broadcast_to(
                    encoder_bias[:, 0, 0, :],
                    (encoder_hidden.shape[0], encoder_hidden.shape[1]))
                    if encoder_bias is not None else None),
                head_z=cross_head_z,
                ln_params=lp["crossattention_ln"], ln_eps=eps,
            )
        elif use_fused_x:
            from ..ops.pallas_fused_mha import fused_cross_attention

            res = fused_cross_attention(
                lp["crossattention"], h.astype(dtype) if dtype is not None else h,
                encoder_hidden,
                num_heads=_num_heads(lp["crossattention"], head_dim),
                key_bias=encoder_bias[:, 0, 0, :] if encoder_bias is not None else None,
                head_z=cross_head_z, return_probs=output_probs,
                differentiable=train,
            )
            x_out, cross_probs = res if output_probs else (res, None)
        else:
            x_out, cross_probs, _ = multi_head_attention(
                lp["crossattention"],
                h,
                encoder_hidden if cross_kv is None else h,  # kv source unused with cross_kv
                num_heads=_num_heads(lp["crossattention"], head_dim),
                bias=encoder_bias,
                head_z=cross_head_z,
                output_probs=output_probs,
                dropout_rate=adrop,
                rng=rngs[2],
                train=train,
                dtype=dtype,
                precomputed_kv=cross_kv,
                kv_groups=encoder_groups,
                # grouped cross-attention keeps the real impl: the grouped
                # flash kernel (ops/pallas_attention.flash_attention_grouped)
                # shares K/V across the group AND keeps scores in VMEM —
                # multi_head_attention only honors it on the grouped path,
                # so non-grouped calls still lower to the XLA einsum
                impl=impl if encoder_groups > 1 else (
                    "xla" if impl == "fused" else impl),
            )
            x_out = dropout(x_out, hdrop, rng=rngs[3], train=train)
        if not use_fused_xg:  # grouped layer kernel already applied the LN
            h = layer_norm(lp["crossattention_ln"], h + x_out, eps=eps)

    if lp.get("intermediate") is not None:  # fully-pruned FFN -> identity
        inter = act(dense(lp["intermediate"], h, dtype=dtype))
        if mlp_z is not None:
            inter = inter * mlp_z.astype(inter.dtype)
        out = dense(lp["output"], inter, dtype=dtype)
        out = dropout(out, hdrop, rng=rngs[4], train=train)
        h = layer_norm(lp["output_ln"], h + out, eps=eps)

    if cache is not None:
        new_cache = dict(cache)
        new_cache["self"] = self_cache
    return h, self_probs, cross_probs, new_cache


def _index_gate(z, i):
    if z is None:
        return None
    return z[i]


def bert_encoder_apply(
    params: dict,
    h: Array,
    cfg: TextConfig,
    *,
    bias: Optional[Array] = None,
    mode: str = "multi_modal",
    encoder_hidden: Optional[Array] = None,
    encoder_bias: Optional[Array] = None,
    text_head_z=None,
    cross_head_z=None,  # [Lc, 2, H] or list of (2,H): [:,0]=self, [:,1]=cross
    text_mlp_z=None,
    cross_mlp_z=None,
    cache: Optional[list] = None,
    cross_kv: Optional[list] = None,
    encoder_groups: int = 1,
    output_attentions: bool = False,
    output_hidden_states: bool = False,
    train: bool = False,
    rng: Optional[Array] = None,
    dtype=None,
    impl: str = "xla",
):
    """Run layers per mode (reference xbert.py:558-567). Returns dict with
    last_hidden, hidden_states, attentions, cross_attentions, cache.
    `cross_kv`: per-cross-layer pre-projected K/V (precompute_cross_kv).
    `encoder_groups`: grouped-K/V declaration, see bert_layer_apply."""
    fusion = cfg["fusion_layer"]
    n = cfg["num_hidden_layers"]
    if mode == "text":
        lo, hi = 0, fusion
    elif mode == "fusion":
        lo, hi = fusion, n
    elif mode == "multi_modal":
        lo, hi = 0, n
    else:
        raise ValueError(f"mode {mode} is not supported")

    # lax.scan over uniform layer groups (cf. vit.py): text layers
    # [lo, fusion) and cross layers [fusion, hi) each scan as a group.
    # Gates/rngs ride as scan xs; unrolled path remains for caches and
    # post-export models (per-layer shapes differ).
    def _scannable(z, n, nd):
        return z is None or (hasattr(z, "shape") and z.ndim == nd and z.shape[0] == n)

    n_text = max(0, min(hi, fusion) - lo)
    n_cross = max(0, hi - max(lo, fusion))
    use_scan = (
        cfg.get("scan_layers", False)
        and cache is None
        and cross_kv is None
        and _scannable(text_head_z, n_text, 2) and _scannable(text_mlp_z, n_text, 2)
        and _scannable(cross_head_z, n_cross, 3) and _scannable(cross_mlp_z, n_cross, 2)
        # each scan group must be shape-uniform (post-export models are not)
        and _uniform_layers(params["layers"][lo:min(hi, fusion)])
        and _uniform_layers(params["layers"][max(lo, fusion):hi])
    )
    if use_scan:
        all_hidden = [] if output_hidden_states else None
        all_probs = [] if output_attentions else None
        all_cross_probs = [] if output_attentions else None
        grng = rng

        def scan_group(h, layers, is_cross, head_zs, mlp_zs, grng):
            n = len(layers)
            xs = {"params": jax.tree.map(lambda *x: jnp.stack(x), *layers)}
            if head_zs is not None:
                xs["head_zs"] = jnp.asarray(head_zs)
            if mlp_zs is not None:
                xs["mlp_zs"] = jnp.asarray(mlp_zs)
            if grng is not None:
                xs["rng"] = jax.random.split(grng, n)

            def body(carry, x):
                hz = x.get("head_zs")
                out, sp, cp, _ = bert_layer_apply(
                    x["params"], carry, cfg, bias=bias,
                    encoder_hidden=encoder_hidden if is_cross else None,
                    encoder_bias=encoder_bias if is_cross else None,
                    encoder_groups=encoder_groups if is_cross else 1,
                    self_head_z=(hz[0] if is_cross else hz) if hz is not None else None,
                    cross_head_z=(hz[1] if is_cross else None) if hz is not None else None,
                    mlp_z=x.get("mlp_zs"),
                    output_probs=output_attentions, train=train,
                    rng=x.get("rng"), dtype=dtype, impl=impl,
                )
                ys = []
                if output_hidden_states:
                    ys.append(carry)
                if output_attentions:
                    ys.append(sp)
                    if is_cross:
                        ys.append(cp)
                return out, tuple(ys)

            if cfg.get("remat", False):
                body = jax.checkpoint(body)
            h, ys = jax.lax.scan(body, h, xs)
            yi = 0
            if output_hidden_states:
                all_hidden.extend(ys[yi][i] for i in range(n))
                yi += 1
            if output_attentions:
                all_probs.extend(ys[yi][i] for i in range(n))
                yi += 1
                if is_cross:
                    all_cross_probs.extend(ys[yi][i] for i in range(n))
            return h

        r1 = r2 = None
        if grng is not None:
            r1, r2 = jax.random.split(grng)
        if n_text:
            h = scan_group(h, params["layers"][lo:min(hi, fusion)], False,
                           text_head_z, text_mlp_z, r1)
        if n_cross:
            h = scan_group(h, params["layers"][max(lo, fusion):hi], True,
                           cross_head_z, cross_mlp_z, r2)
        if output_hidden_states:
            all_hidden.append(h)
        return {
            "last_hidden": h,
            "hidden_states": all_hidden,
            "attentions": all_probs,
            "cross_attentions": all_cross_probs,
            "cache": None,
        }

    all_hidden = [] if output_hidden_states else None
    all_probs = [] if output_attentions else None
    all_cross_probs = [] if output_attentions else None
    new_cache = list(cache) if cache is not None else None

    for i in range(lo, hi):
        if output_hidden_states:
            all_hidden.append(h)
        is_cross = i >= fusion
        if is_cross:
            ci = i - fusion
            shz = _index_gate(cross_head_z, ci)
            self_z = shz[0] if shz is not None else None
            cross_z = shz[1] if shz is not None else None
            mlp_zi = _index_gate(cross_mlp_z, ci)
        else:
            self_z = _index_gate(text_head_z, i)
            cross_z = None
            mlp_zi = _index_gate(text_mlp_z, i)
        lrng = None
        if rng is not None:
            rng, lrng = jax.random.split(rng)
        h, sp, cp, lcache = bert_layer_apply(
            params["layers"][i],
            h,
            cfg,
            bias=bias,
            encoder_hidden=encoder_hidden if is_cross else None,
            encoder_bias=encoder_bias if is_cross else None,
            self_head_z=self_z,
            cross_head_z=cross_z,
            mlp_z=mlp_zi,
            cache=cache[i - lo] if cache is not None else None,
            cross_kv=(cross_kv[i - fusion] if (is_cross and cross_kv is not None)
                      else None),
            encoder_groups=encoder_groups if is_cross else 1,
            output_probs=output_attentions,
            train=train,
            rng=lrng,
            dtype=dtype,
            impl=impl,
        )
        if output_attentions:
            all_probs.append(sp)
            if cp is not None:
                all_cross_probs.append(cp)
        if new_cache is not None:
            new_cache[i - lo] = lcache
    if output_hidden_states:
        all_hidden.append(h)

    return {
        "last_hidden": h,
        "hidden_states": all_hidden,
        "attentions": all_probs,
        "cross_attentions": all_cross_probs,
        "cache": new_cache,
    }


def bert_apply(
    params: dict,
    input_ids: Optional[Array],
    cfg: TextConfig,
    *,
    attention_mask: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    encoder_hidden: Optional[Array] = None,
    encoder_attention_mask: Optional[Array] = None,
    mode: str = "multi_modal",
    is_decoder: bool = False,
    cache: Optional[list] = None,
    cross_kv: Optional[list] = None,
    encoder_groups: int = 1,
    position_offset: Array | int = 0,
    text_head_z=None,
    cross_head_z=None,
    text_mlp_z=None,
    cross_mlp_z=None,
    output_attentions: bool = False,
    output_hidden_states: bool = False,
    train: bool = False,
    rng: Optional[Array] = None,
    dtype=None,
    impl: str = "xla",
):
    """BertModel.forward equivalent (xbert.py:853-1103).

    In 'fusion' mode pass inputs_embeds (precomputed text embeds).
    For cached decode, pass `cache` (see init_bert_cache) and position_offset
    = number of already-decoded tokens.
    """
    erng = None
    if rng is not None:
        rng, erng = jax.random.split(rng)
    if inputs_embeds is None:
        h = bert_embeddings(
            params["embeddings"], input_ids, cfg,
            position_offset=position_offset, train=train, rng=erng, dtype=dtype,
        )
    else:
        h = inputs_embeds
    if cfg.get("act_partition"):
        # context-parallel hook (SURVEY §5.7) — see vit_apply
        from ..parallel.sharding import constrain_activations

        h = constrain_activations(h, cfg["act_partition"])

    t = h.shape[1]
    if is_decoder:
        if cache is not None:
            max_len = cache[0]["self"]["k"].shape[2]
            bias = decode_bias(max_len, cache[0]["self"]["index"], q_len=t)
        else:
            bias = causal_bias(t, t)
        if attention_mask is not None:
            bias = bias + make_attention_bias(attention_mask)[:, :, :, : bias.shape[-1]]
    else:
        bias = make_attention_bias(attention_mask) if attention_mask is not None else None

    encoder_bias = None
    if encoder_hidden is not None and encoder_attention_mask is not None:
        encoder_bias = make_attention_bias(encoder_attention_mask)

    return bert_encoder_apply(
        params,
        h,
        cfg,
        bias=bias,
        mode=mode,
        encoder_hidden=encoder_hidden,
        encoder_bias=encoder_bias,
        text_head_z=text_head_z,
        cross_head_z=cross_head_z,
        text_mlp_z=text_mlp_z,
        cross_mlp_z=cross_mlp_z,
        cache=cache,
        cross_kv=cross_kv,
        encoder_groups=encoder_groups,
        output_attentions=output_attentions,
        output_hidden_states=output_hidden_states,
        train=train,
        rng=rng,
        dtype=dtype,
        impl=impl,
    )


def precompute_cross_kv(
    params: dict, cfg: TextConfig, encoder_hidden: Array, *, dtype=None
) -> list:
    """Project the cross-attention K/V for every cross layer ONCE (list
    indexed by cross-layer ci = i - fusion; None for fully-pruned modules).
    The image embeds are constant across decode steps, so the decode loop
    closes over these as loop invariants instead of repaying two
    [S,W]x[W,W] dots per cross layer per token — the reference gets the
    same reuse from HF past_key_value caching (eff_bert.py:283-295)."""
    from ..ops.attention import project_kv

    fusion = cfg["fusion_layer"]
    head_dim = cfg["hidden_size"] // cfg["num_attention_heads"]
    out = []
    for i in range(fusion, cfg["num_hidden_layers"]):
        lp = params["layers"][i]
        if lp.get("crossattention") is None:
            out.append(None)
            continue
        nh = _num_heads(lp["crossattention"], head_dim)
        out.append(project_kv(lp["crossattention"], encoder_hidden,
                              num_heads=nh, dtype=dtype))
    return out


def init_bert_cache(
    params: dict, cfg: TextConfig, batch: int, max_len: int, mode: str = "multi_modal", dtype=jnp.float32
) -> list:
    """Fixed-size decode cache, one entry per layer run in `mode`."""
    fusion = cfg["fusion_layer"]
    n = cfg["num_hidden_layers"]
    lo = fusion if mode == "fusion" else 0
    head_dim = cfg["hidden_size"] // cfg["num_attention_heads"]
    caches = []
    for i in range(lo, n):
        nh = _num_heads(params["layers"][i]["attention"], head_dim)
        caches.append({"self": init_decode_cache(batch, nh, max_len, head_dim, dtype)})
    return caches


# ---------------------------------------------------------------------------
# Heads / losses
# ---------------------------------------------------------------------------


def mlm_head_apply(params: dict, h: Array, cfg: TextConfig, *, dtype=None) -> Array:
    x = dense(params["transform"]["dense"], h, dtype=dtype)
    x = ACT2FN[cfg.get("hidden_act", "gelu")](x)
    x = layer_norm(params["transform"]["ln"], x, eps=cfg.get("layer_norm_eps", 1e-12))
    return dense(params["decoder"], x, dtype=dtype)


def gather_seq_out_by_pos(seq: Array, pos: Array) -> Array:
    """xbert.py gather_seq_out_by_pos: [B,T,D],[B,M] -> [B,M,D]."""
    return jnp.take_along_axis(seq, pos[:, :, None], axis=1)


def cross_entropy_ignore_index(logits: Array, labels: Array, ignore_index: int = -100) -> Array:
    """Mean CE over labels != ignore_index (torch CrossEntropyLoss semantics)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def label_smooth_cross_entropy(
    logits: Array, labels: Array, *, smoothing: float = 0.1, ignore_index: int = -100,
    reduction: str = "mean",
) -> Array:
    """LabelSmoothSoftmaxCEV1 semantics (xbert.py:1197-1240)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lb_pos = 1.0 - smoothing
    lb_neg = smoothing / num_classes
    nll = -(
        lb_pos * jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        + lb_neg * logp.sum(axis=-1)
    )
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "none":
        return nll
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def lm_loss(
    logits: Array, labels: Array, *, label_smoothing: float = 0.0, reduction: str = "mean"
):
    """Next-token LM loss with shift-by-one (xbert.py:1348-1360).
    reduction='none' returns per-sequence summed loss."""
    shifted = logits[:, :-1]
    labels = labels[:, 1:]
    if label_smoothing > 0:
        per_tok = label_smooth_cross_entropy(
            shifted, labels, smoothing=label_smoothing, reduction="none"
        )
    else:
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(shifted.astype(jnp.float32), axis=-1)
        per_tok = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        per_tok = jnp.where(valid, per_tok, 0.0)
    if reduction == "none":
        return per_tok.sum(axis=1)
    valid = labels != -100
    return per_tok.sum() / jnp.maximum(valid.sum(), 1)
