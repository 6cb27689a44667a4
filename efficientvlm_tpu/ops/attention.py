"""Multi-head attention (self + image-grounded cross) with structured gates.

One implementation serves teacher and student (reference duplicates this 4×:
models/clip_vit.py:77-172, models/xbert.py:218-362, efficient_models/
eff_vit.py, efficient_models/eff_bert.py). Gates:

- head_z (num_heads,): multiplies per-head context before the output
  projection (reference eff_vit.py:194-195, eff_bert.py:354-355);
- head_layer_z scalar: scales the attention output (eff_vit.py:201-202).

Passing None gates compiles to the ungated (teacher) program — the branch
resolves at trace time, so gating with None is free under XLA.

Supports a fixed-size functional KV cache for jittable autoregressive
decoding (replacing the reference's Python-level `past_key_value` tuple
growth, eff_bert.py:291-295) and a Pallas fused-attention fast path.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .basic import dense, init_dense

Array = jax.Array

NEG_INF = -1e9  # additive-bias masking value (f32)


def init_attention(key, d_model: int, num_heads: int, *, kv_width: Optional[int] = None):
    """Params for one attention block. kv_width != d_model for cross-attn
    into the vision tower (reference xbert.py:235-240 encoder_width)."""
    kq, kk, kv, ko = jax.random.split(key, 4)
    kv_width = kv_width or d_model
    return {
        "q": init_dense(kq, d_model, d_model),
        "k": init_dense(kk, kv_width, d_model),
        "v": init_dense(kv, kv_width, d_model),
        "out": init_dense(ko, d_model, d_model),
    }


def make_attention_bias(mask: Array, dtype=jnp.float32) -> Array:
    """[B, Tk] or [B, Tq, Tk] boolean/0-1 mask -> additive bias [B,1,*,Tk]."""
    mask = mask.astype(jnp.float32)
    if mask.ndim == 2:
        bias = (1.0 - mask)[:, None, None, :] * NEG_INF
    elif mask.ndim == 3:
        bias = (1.0 - mask)[:, None, :, :] * NEG_INF
    else:
        raise ValueError(f"mask ndim {mask.ndim}")
    return bias.astype(dtype)


def causal_bias(q_len: int, k_len: int, *, offset: Array | int = 0, dtype=jnp.float32) -> Array:
    """Causal additive bias [1,1,q_len,k_len]; offset = number of cached
    positions preceding the current query block."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0) + offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    allowed = k_pos <= q_pos
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]


def _split_heads(x: Array, num_heads: int) -> Array:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def multi_head_attention(
    params,
    x_q: Array,
    x_kv: Optional[Array] = None,
    *,
    num_heads: int,
    bias: Optional[Array] = None,
    head_z: Optional[Array] = None,
    head_layer_z: Optional[Array] = None,
    output_probs: bool = False,
    dropout_rate: float = 0.0,
    rng: Optional[Array] = None,
    train: bool = False,
    dtype=None,
    cache: Optional[dict] = None,
    precomputed_kv: Optional[dict] = None,
    kv_groups: int = 1,
    impl: str = "xla",
):
    """Returns (attn_output [B,Tq,D], probs [B,H,Tq,Tk] or None, new_cache).

    cache: {"k": [B,H,L,dh], "v": [B,H,L,dh], "index": int32} — fixed-size
    ring-free decode cache; new keys/values are written at `index` and
    attention spans the first index+Tq positions (bias must mask the rest —
    use `decode_bias`).

    precomputed_kv: {"k": [Bk,H,S,dh], "v": ...} — already-projected keys/
    values for cross-attention whose source (image embeds) is constant
    across decode steps; skips the k/v projections entirely (the reference
    caches cross K/V the same way via HF past_key_value, eff_bert.py:283-295
    — without this, every decode step repays two [S,W]x[W,W] dots per cross
    layer). Mutually exclusive with `cache`.

    kv_groups=G > 1 declares grouped K/V: the K/V batch `Bk` is 1/G of the
    query batch `Bq` (query rows grouped CONTIGUOUSLY, i.e. the layout
    `jnp.repeat(x, G, axis=0)` would produce): every group of G = Bq//Bk
    query rows attends to ONE shared K/V — beam-expanded decode (all beams
    of an image share its image tokens) and k-tiled answer ranking never
    materialize or re-read repeated K/V. At caption decode shapes (64 img
    x 3 beams x 577 keys) the repeated cross K/V is ~1 GB of HBM reads per
    decode step; sharing cuts it 3x. The flag is EXPLICIT so an accidental
    batch mismatch stays a loud shape error rather than silently pairing
    query row q with kv row q//G.
    """
    if cache is not None and (kv_groups > 1 or precomputed_kv is not None):
        # a decode cache combined with grouped or precomputed K/V would
        # silently skip the cache update (stale K/V) or write cross K/V into
        # self-attn slots — reject loudly per the module contract
        raise ValueError(
            "cache is mutually exclusive with kv_groups>1 and precomputed_kv")
    self_attn = x_kv is None
    if self_attn:
        x_kv = x_q

    q = _split_heads(dense(params["q"], x_q, dtype=dtype), num_heads)
    if precomputed_kv is not None:
        k, v = precomputed_kv["k"], precomputed_kv["v"]
    else:
        k = _split_heads(dense(params["k"], x_kv, dtype=dtype), num_heads)
        v = _split_heads(dense(params["v"], x_kv, dtype=dtype), num_heads)
    if kv_groups > 1:
        # Cross-attention with a SHARED source: x_kv/precomputed_kv rows
        # divide the query rows (beam-expanded decode, k_test-tiled rerank
        # and answer scoring). Projecting from the unexpanded source and
        # broadcasting here skips (G-1)/G of the K/V projection FLOPs — in
        # the retrieval i2t rerank the cross K/V projections over the
        # repeated image rows are ~2/3 of the fusion-stack FLOPs.
        if k.shape[0] * kv_groups != q.shape[0]:
            raise ValueError(
                f"kv_groups={kv_groups}: query batch {q.shape[0]} != "
                f"{kv_groups} * kv batch {k.shape[0]}")
        out, probs = _grouped_kv_attention(
            params, q, k, v, bias=bias, head_z=head_z,
            head_layer_z=head_layer_z, output_probs=output_probs,
            dropout_rate=dropout_rate, rng=rng, train=train, dtype=dtype,
            impl=impl,
        )
        return out, probs, cache
    if k.shape[0] != q.shape[0]:
        raise ValueError(
            f"query batch {q.shape[0]} != kv batch {k.shape[0]} — pass "
            f"kv_groups={q.shape[0] // max(k.shape[0], 1)} if the kv rows "
            f"are intentionally shared across contiguous query groups")

    new_cache = cache
    if cache is not None:
        idx = cache["index"]
        ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, 0, idx, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, 0, idx, 0))
        k, v = ck, cv
        new_cache = {"k": ck, "v": cv, "index": idx + x_q.shape[1]}

    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)

    if (impl == "pallas" and not output_probs and cache is None
            and not (train and dropout_rate > 0.0)):
        from .pallas_attention import flash_attention

        ctx = flash_attention(q * scale, k, v, bias=bias)
        probs = None
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs_d = probs
        if train and dropout_rate > 0.0 and rng is not None:
            keep = 1.0 - dropout_rate
            probs_d = probs * jax.random.bernoulli(rng, keep, probs.shape) / keep
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs_d.astype(v.dtype), v)

    if head_z is not None:
        ctx = ctx * head_z.reshape(1, -1, 1, 1).astype(ctx.dtype)

    out = dense(params["out"], _merge_heads(ctx), dtype=dtype)
    if head_layer_z is not None:
        out = out * jnp.asarray(head_layer_z, dtype=out.dtype)

    return out, (probs if output_probs else None), new_cache


def _grouped_kv_attention(
    params,
    q: Array,                # [Bk*G, H, Tq, dh] — groups contiguous
    k: Array,                # [Bk, H, S, dh]
    v: Array,                # [Bk, H, S, dh]
    *,
    bias: Optional[Array] = None,
    head_z: Optional[Array] = None,
    head_layer_z: Optional[Array] = None,
    output_probs: bool = False,
    dropout_rate: float = 0.0,
    rng: Optional[Array] = None,
    train: bool = False,
    dtype=None,
    impl: str = "xla",
):
    """Attention where G contiguous query rows share one K/V row (see
    multi_head_attention's grouped-K/V contract). The einsum batches over
    (Bk, H) and broadcasts K/V across the G dim, so XLA reads each K/V tile
    once per group instead of G times — no repeated materialization."""
    bq, h, tq, dh = q.shape
    bk, _, s, _ = k.shape
    if bq % bk != 0:
        raise ValueError(f"grouped K/V: query batch {bq} not a multiple of kv batch {bk}")
    g = bq // bk
    scale = 1.0 / math.sqrt(dh)

    # the kernel takes a per-GROUP key vector; per-query-row biases (a
    # beam-expanded mask) and matrix biases fall back to the einsum
    bias_is_group_vector = bias is None or (
        bias.ndim == 4 and bias.shape[2] == 1 and bias.shape[0] in (1, bk))
    use_flash = False
    if (impl in ("pallas", "fused") and not output_probs
            and not (train and dropout_rate > 0.0) and bias_is_group_vector
            and g * tq >= 256):  # decode steps (G*1 rows) stay XLA: the
        # fold still undershoots a row block and the pad loses
        from .pallas_fused_mha import lane_pad_efficient

        # same lane economics as the fused layer kernel: 577 keys (+11%
        # pad) win, 197 (+30%) lose to the XLA einsum
        use_flash = lane_pad_efficient(s)
    if use_flash:
        # the XLA grouped einsum materializes [Bk, G, H, Tq, S] f32 scores
        # in HBM between the two dots — at rerank shapes (1024 rows x 40 x
        # 577) that's the dominant bandwidth cost and what capped the eval
        # rerank at 0.21 MFU (VERDICT r4 #4); the kernel keeps each group's
        # scores in VMEM and reads K/V once per (batch, head)
        from .pallas_attention import flash_attention_grouped

        ctx = flash_attention_grouped(q * scale, k, v, kv_groups=g, bias=bias)
        if head_z is not None:
            ctx = ctx * head_z.reshape(1, -1, 1, 1).astype(ctx.dtype)
        out = dense(params["out"], _merge_heads(ctx), dtype=dtype)
        if head_layer_z is not None:
            out = out * jnp.asarray(head_layer_z, dtype=out.dtype)
        return out, None

    qg = q.reshape(bk, g, h, tq, dh)
    scores = jnp.einsum("bghqd,bhkd->bghqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        if bias.shape[0] == bq:       # per-query-row bias [Bq,1|H,Tq|1,S]
            bias = bias.reshape((bk, g) + bias.shape[1:])
        elif bias.shape[0] in (1, bk):  # shared / per-kv-row bias
            bias = bias[:, None]
        else:
            raise ValueError(f"grouped K/V: bias batch {bias.shape[0]} "
                             f"matches neither query ({bq}) nor kv ({bk}) batch")
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    probs_d = probs
    if train and dropout_rate > 0.0 and rng is not None:
        keep = 1.0 - dropout_rate
        probs_d = probs * jax.random.bernoulli(rng, keep, probs.shape) / keep
    ctx = jnp.einsum("bghqk,bhkd->bghqd", probs_d.astype(v.dtype), v)
    ctx = ctx.reshape(bq, h, tq, dh)
    if head_z is not None:
        ctx = ctx * head_z.reshape(1, -1, 1, 1).astype(ctx.dtype)
    out = dense(params["out"], _merge_heads(ctx), dtype=dtype)
    if head_layer_z is not None:
        out = out * jnp.asarray(head_layer_z, dtype=out.dtype)
    return out, (probs.reshape(bq, h, tq, s) if output_probs else None)


def project_kv(params, x_kv: Array, *, num_heads: int, dtype=None) -> dict:
    """Project keys/values once for `multi_head_attention(precomputed_kv=)`
    — identical math to the in-call projections."""
    return {
        "k": _split_heads(dense(params["k"], x_kv, dtype=dtype), num_heads),
        "v": _split_heads(dense(params["v"], x_kv, dtype=dtype), num_heads),
    }


def init_decode_cache(batch: int, num_heads: int, max_len: int, head_dim: int, dtype=jnp.float32) -> dict:
    return {
        "k": jnp.zeros((batch, num_heads, max_len, head_dim), dtype),
        "v": jnp.zeros((batch, num_heads, max_len, head_dim), dtype),
        "index": jnp.array(0, jnp.int32),
    }


def decode_bias(max_len: int, index: Array, q_len: int = 1, dtype=jnp.float32) -> Array:
    """Bias for cached decode: positions < index+q_len are visible, causally
    within the query block."""
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, max_len), 1)
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, max_len), 0) + index
    allowed = k_pos <= q_pos
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]
