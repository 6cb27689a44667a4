"""Pallas fused attention kernel (TPU).

Fuses QK^T -> bias add -> softmax -> PV into one VMEM-resident kernel, so
the [B,H,Tq,Tk] score tensor never round-trips HBM — the main bandwidth
saving at X-VLM's sequence lengths (197..901 vision tokens, 40 text).

Design: grid (B, H, Tq/BLOCK_Q); each program holds one query block and the
FULL K/V for that (batch, head) in VMEM (Tk<=1024 at 480px: K+V ~= 0.5 MB in
bf16 — comfortably inside the ~16 MB VMEM), computing the whole softmax row
exactly (no online rescaling needed). Falls back to interpret mode off-TPU
so tests exercise the same code path.

Not used for cached decode (q_len==1 steps are bandwidth-trivial) or when
attention probs are needed for KD (output_attentions path keeps the jnp
implementation).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_Q = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0, 0]  # [BQ, dh]
    k = k_ref[0, 0]  # [Tk, dh]
    v = v_ref[0, 0]  # [Tk, dh]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, Tk]
    if bias_ref is not None:
        scores = scores + bias_ref[0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / s).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_attention_padded(q, k, v, bias, *, interpret: bool):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    grid = (b, h, tq // BLOCK_Q)

    in_specs = [
        pl.BlockSpec((1, 1, BLOCK_Q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, tk, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, tk, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, BLOCK_Q, tk), lambda bi, hi, qi: (bi, qi, 0)))
        args.append(bias)
        kernel = _attn_kernel
    else:
        kernel = lambda qr, kr, vr, orf: _attn_kernel(qr, kr, vr, None, orf)

    flops = 2 * b * h * tq * tk * dh * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, BLOCK_Q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q.size * 4 + k.size * 4 * 2, transcendentals=b * h * tq * tk
        ),
        interpret=interpret,
    )(*args)


def flash_attention(
    q: Array, k: Array, v: Array, *, bias: Optional[Array] = None
) -> Array:
    """q [B,H,Tq,dh] (already scaled), k/v [B,H,Tk,dh],
    bias additive [B or 1, 1, Tq, Tk]. Returns [B,H,Tq,dh]."""
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    tq_p = _round_up(max(tq, 8), BLOCK_Q)
    tk_p = _round_up(max(tk, 8), LANE)

    interpret = jax.devices()[0].platform != "tpu"

    pad_q = tq_p - tq
    pad_k = tk_p - tk
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))

    bias3 = None
    if bias is not None or pad_k:
        if bias is None:
            bias3 = jnp.zeros((1, tq, tk), jnp.float32)
        else:
            bias3 = jnp.broadcast_to(
                bias.astype(jnp.float32), (bias.shape[0], max(bias.shape[1], 1), tq, tk)
            )[:, 0]  # [B,Tq,Tk] (per-head biases unsupported on this path)
        bias3 = jnp.pad(bias3, ((0, 0), (0, pad_q), (0, pad_k)), constant_values=-1e9)
        if bias3.shape[0] == 1 and b > 1:
            bias3 = jnp.broadcast_to(bias3, (b, tq_p, tk_p))

    out = _flash_attention_padded(q, k, v, bias3, interpret=interpret)
    return out[:, :, :tq]
