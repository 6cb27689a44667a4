"""Swin Transformer — alternative vision encoder (reference
models/swin_transformer.py, Swin-B): windowed self-attention with relative
position bias, shifted windows on odd blocks, patch merging between stages.

TPU notes: window partition/reverse are pure reshapes/transposes (XLA
fuses them); the shifted-window mask is a compile-time constant; relative
position bias indexes a learned table with a static index map. Output is
the final-stage token sequence (no CLS — X-VLM takes token 0 of an
avg-pooled prepend, reference uses the raw sequence; we prepend mean-pool
as the [CLS] surrogate like X-VLM's swin path).
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.basic import dense, gelu, init_dense, init_layer_norm, layer_norm

Array = jax.Array


def swin_config(
    *, image_res: int = 224, patch_size: int = 4, embed_dim: int = 128,
    depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window_size: int = 7,
    mlp_ratio: float = 4.0,
) -> Config:
    return Config(dict(
        image_res=image_res, patch_size=patch_size, embed_dim=embed_dim,
        depths=list(depths), num_heads=list(num_heads), window_size=window_size,
        mlp_ratio=mlp_ratio,
        vision_width=embed_dim * 2 ** (len(depths) - 1),
    ))


def _rel_pos_index(window: int, table_window: int | None = None) -> np.ndarray:
    """Indices into a (2*table_window-1)^2 bias table for a `window`-sized
    attention window. table_window > window = the clamped-window case
    (resolution smaller than the configured window): relative offsets only
    span ±(window-1), so they address the central sub-block of the full
    table."""
    tw = table_window or window
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (tw - 1)
    return (rel[..., 0] * (2 * tw - 1) + rel[..., 1]).astype(np.int32)


def init_swin(key: Array, cfg: Config) -> dict:
    e = cfg["embed_dim"]
    p = cfg["patch_size"]
    w = cfg["window_size"]
    keys = iter(jax.random.split(key, 4 + sum(cfg["depths"]) * 8 + len(cfg["depths"])))
    params: dict = {
        "patch_embed": {
            "kernel": jax.random.normal(next(keys), (p, p, 3, e)) * 0.02,
            "bias": jnp.zeros((e,)),
        },
        "patch_norm": init_layer_norm(e),
        "stages": [],
        "norm": init_layer_norm(cfg["vision_width"]),
    }
    dim = e
    for si, (depth, nh) in enumerate(zip(cfg["depths"], cfg["num_heads"])):
        stage: dict = {"blocks": []}
        for bi in range(depth):
            stage["blocks"].append({
                "ln1": init_layer_norm(dim),
                "qkv": init_dense(next(keys), dim, dim * 3),
                "proj": init_dense(next(keys), dim, dim),
                "rel_bias": jax.random.normal(next(keys), ((2 * w - 1) ** 2, nh)) * 0.02,
                "ln2": init_layer_norm(dim),
                "fc1": init_dense(next(keys), dim, int(dim * cfg["mlp_ratio"])),
                "fc2": init_dense(next(keys), int(dim * cfg["mlp_ratio"]), dim),
            })
        if si < len(cfg["depths"]) - 1:
            stage["downsample"] = {
                "reduction": init_dense(next(keys), 4 * dim, 2 * dim, bias=False),
                "norm": init_layer_norm(4 * dim),
            }
            dim *= 2
        params["stages"].append(stage)
    return params


def _window_partition(x: Array, w: int) -> Array:
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(wins: Array, w: int, h: int, wd: int) -> Array:
    b = wins.shape[0] // ((h // w) * (wd // w))
    x = wins.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def _shift_mask(h: int, wd: int, w: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: -100 between different regions."""
    img = np.zeros((1, h, wd, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    # pure-numpy window partition: this mask is a compile-time constant and
    # must not trace (swin_apply may run under jit)
    wins = (
        img.reshape(1, h // w, w, wd // w, w, 1)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, w * w)
    )
    mask = (wins[:, None, :] - wins[:, :, None]) != 0
    return np.where(mask, -100.0, 0.0).astype(np.float32)


def _window_attention(bp: dict, x: Array, nh: int, w: int, mask: Optional[np.ndarray], dtype,
                      table_window: int | None = None) -> Array:
    nw, n, c = x.shape
    qkv = dense(bp["qkv"], x, dtype=dtype).reshape(nw, n, 3, nh, c // nh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scale = (c // nh) ** -0.5
    attn = jnp.einsum("whnd,whmd->whnm", q * scale, k, preferred_element_type=jnp.float32)
    bias = bp["rel_bias"][jnp.asarray(_rel_pos_index(w, table_window)).reshape(-1)]
    bias = bias.reshape(n, n, nh).transpose(2, 0, 1)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nm = mask.shape[0]
        attn = attn.reshape(nw // nm, nm, nh, n, n) + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(nw, nh, n, n)
    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("whnm,whmd->whnd", probs, v).transpose(0, 2, 1, 3).reshape(nw, n, c)
    return dense(bp["proj"], out, dtype=dtype)


def swin_apply(params: dict, images: Array, cfg: Config, *, dtype=None, **_ignored) -> dict:
    """[B,H,W,3] -> dict(last_hidden [B, 1+N, vision_width]) with a
    mean-pool token prepended as the CLS surrogate."""
    p = cfg["patch_size"]
    w = cfg["window_size"]
    x = jax.lax.conv_general_dilated(
        images.astype(dtype) if dtype is not None else images,
        params["patch_embed"]["kernel"].astype(dtype) if dtype is not None else params["patch_embed"]["kernel"],
        (p, p), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(dtype or jnp.float32)
    b, gh, gw, c = x.shape
    x = layer_norm(params["patch_norm"], x.reshape(b, gh * gw, c), eps=1e-5).reshape(b, gh, gw, c)

    for si, stage in enumerate(params["stages"]):
        nh = cfg["num_heads"][si]
        # reference SwinTransformerBlock.__init__ (swin_transformer.py:
        # 195-199): when the window covers the whole grid, clamp it to the
        # resolution and disable shifting (a roll would only permute tokens
        # within the single window). Applies per STAGE since resolution
        # halves at each patch merging.
        w_eff = min(w, gh, gw)
        for bi, bp in enumerate(stage["blocks"]):
            shift = 0 if (bi % 2 == 0 or min(gh, gw) <= w) else w_eff // 2
            res = x
            h_ = layer_norm(bp["ln1"], x, eps=1e-5)
            if shift:
                h_ = jnp.roll(h_, (-shift, -shift), axis=(1, 2))
                mask = _shift_mask(gh, gw, w_eff, shift)
            else:
                mask = None
            wins = _window_partition(h_, w_eff)
            wins = _window_attention(bp, wins, nh, w_eff, mask, dtype,
                                     table_window=w if w_eff < w else None)
            h_ = _window_reverse(wins, w_eff, gh, gw)
            if shift:
                h_ = jnp.roll(h_, (shift, shift), axis=(1, 2))
            x = res + h_
            res = x
            h_ = layer_norm(bp["ln2"], x, eps=1e-5)
            h_ = dense(bp["fc2"], gelu(dense(bp["fc1"], h_, dtype=dtype)), dtype=dtype)
            x = res + h_
        if "downsample" in stage:
            x0 = x[:, 0::2, 0::2]
            x1 = x[:, 1::2, 0::2]
            x2 = x[:, 0::2, 1::2]
            x3 = x[:, 1::2, 1::2]
            x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
            x = layer_norm(stage["downsample"]["norm"], x, eps=1e-5)
            x = dense(stage["downsample"]["reduction"], x, dtype=dtype)
            gh, gw = gh // 2, gw // 2

    c = x.shape[-1]
    seq = layer_norm(params["norm"], x.reshape(b, gh * gw, c), eps=1e-5)
    cls = seq.mean(axis=1, keepdims=True)
    return {"last_hidden": jnp.concatenate([cls, seq], axis=1), "hidden_states": None, "attentions": None}
