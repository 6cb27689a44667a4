"""Pallas fused attention kernel (TPU).

Fuses QK^T -> bias add -> softmax -> PV into one VMEM-resident kernel, so
the [B,H,Tq,Tk] score tensor never round-trips HBM — the main bandwidth
saving at X-VLM's sequence lengths (197..901 vision tokens, 40 text).

Design: grid (B, H, Tq/BLOCK_Q); each program holds one query block and the
FULL K/V for that (batch, head) in VMEM (Tk<=1024 at 480px: K+V ~= 0.5 MB in
bf16 — comfortably inside the ~16 MB VMEM), computing the whole softmax row
exactly (no online rescaling needed). Mosaic keeps K/V resident across the
fastest-varying q-block grid dim (their index map is q-invariant).

Bias handling: padding masks are [B,Tk] VECTORS — materializing a padded
[B,Tq,Tk] matrix costs ~50 MB of HBM traffic at B=32/T=640 and erases the
fusion win, so the kernel takes a per-key vector bias and only falls back
to a full matrix for genuinely 2-D masks (region local-attention).

Falls back to interpret mode off-TPU so tests exercise the same code path.
Not used for cached decode (q_len==1 steps) or when attention probs are
needed for KD (output_attentions keeps the jnp implementation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_Q = 256
LANE = 128
NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_vec(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """bias_ref: [1, Tk] additive vector (padding/key mask)."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[0, 0].astype(jnp.float32)[None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / s).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _kernel_mat(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """bias_ref: [1, BQ, Tk] full additive matrix."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / s).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "vector_bias"))
def _flash_attention_padded(q, k, v, bias, *, vector_bias: bool, interpret: bool):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    block_q = min(BLOCK_Q, tq)
    grid = (b, h, tq // block_q)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, tk, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, tk, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
    ]
    if vector_bias:
        in_specs.append(pl.BlockSpec((1, 1, tk), lambda bi, hi, qi: (bi, 0, 0)))
        kernel = _kernel_vec
    else:
        in_specs.append(pl.BlockSpec((1, block_q, tk), lambda bi, hi, qi: (bi, qi, 0)))
        kernel = _kernel_mat

    flops = 4 * b * h * tq * tk * dh
    bytes_acc = (q.size + k.size + v.size) * q.dtype.itemsize + q.size * q.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=b * h * tq * tk
        ),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("block_r", "interpret", "useful_flops"))
def _flash_attention_grouped_padded(q, k, v, bias, *, block_r: int, interpret: bool,
                                    useful_flops: int):
    """Grouped-K/V flash attention over GROUP-FOLDED queries:
    q [Bk, H, R, dh] where R = G*Tq_p — every query row of a group shares
    that group's K/V, so the fold turns G tiny [Tq, Tk] attentions into
    R/block_r well-shaped [block_r, Tk] ones. Grid (Bk, H, R/block_r) with
    the row-block dim fastest-varying: the K/V block's index map is
    invariant across it, so Mosaic keeps each (batch, head) K/V resident
    in VMEM — one HBM read per K/V tile per head, like the grouped einsum,
    but the scores never round-trip HBM (the bandwidth sink that held the
    k_test rerank at 0.21 MFU: a [rows*k, H, 40, 577] f32 score tensor is
    ~850 MB per fusion layer). A first cut kept the [Bq, H, Tq, dh] layout
    and gridded (Bk, H, G): 36864 steps of [48, 640] tiles ran at 8% MFU —
    the fold is what makes the kernel MXU-shaped (trace-measured).
    bias: [Bk, 1, Tk] additive key vector, shared by the whole group."""
    bk, h, r, dh = q.shape
    tk = k.shape[2]
    grid = (bk, h, r // block_r)

    q_idx = lambda bi, hi, ri: (bi, hi, ri, 0)
    in_specs = [
        pl.BlockSpec((1, 1, block_r, dh), q_idx),
        pl.BlockSpec((1, 1, tk, dh), lambda bi, hi, ri: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, tk, dh), lambda bi, hi, ri: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, tk), lambda bi, hi, ri: (bi, 0, 0)),
    ]

    bytes_acc = (2 * q.size + (k.size + v.size)) * q.dtype.itemsize
    return pl.pallas_call(
        _kernel_vec,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_r, dh), q_idx),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            # UNPADDED model flops (caller-computed): the padded count would
            # inflate downstream cost-analysis MFU vs the XLA einsum path
            flops=useful_flops, bytes_accessed=bytes_acc,
            transcendentals=bk * h * r * tk
        ),
        interpret=interpret,
    )(q, k, v, bias)


def flash_attention_grouped(
    q: Array, k: Array, v: Array, *, kv_groups: int,
    bias: Optional[Array] = None,
) -> Array:
    """Grouped-K/V flash attention (see _flash_attention_grouped_padded).
    q [Bk*G, H, Tq, dh] (already scaled, groups contiguous), k/v
    [Bk, H, Tk, dh]; bias is an additive KEY VECTOR [1 | Bk, 1, 1, Tk] or
    None — a per-GROUP vector, shared by all G query rows of the group
    (per-query-row or matrix biases don't occur on the grouped
    cross-attention paths; callers fall back to the XLA einsum for those).
    Returns [Bk*G, H, Tq, dh]."""
    bq, h, tq, dh = q.shape
    bk, _, tk, _ = k.shape
    g = kv_groups
    if bq != bk * g:
        raise ValueError(f"flash grouped: query batch {bq} != {g} * kv batch {bk}")
    tq_p = _round_up(max(tq, 8), 8)
    tk_p = _round_up(max(tk, 8), LANE)

    interpret = jax.devices()[0].platform != "tpu"

    pad_q = tq_p - tq
    pad_k = tk_p - tk
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))

    # fold the group into the row dim: [Bk*G, H, Tq_p, dh] -> [Bk, H, R, dh]
    # (one transposed copy each way — ~0.4% of the traffic the fold saves)
    r_rows = g * tq_p
    qf = q.reshape(bk, g, h, tq_p, dh).transpose(0, 2, 1, 3, 4).reshape(bk, h, r_rows, dh)
    block_r = min(BLOCK_Q, r_rows)
    pad_r = _round_up(r_rows, block_r) - r_rows
    if pad_r:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, pad_r), (0, 0)))

    if bias is None:
        vb = jnp.zeros((bk, tk), jnp.float32)
    else:
        vb = bias[:, 0, 0, :].astype(jnp.float32)
        if vb.shape[0] == 1:
            vb = jnp.broadcast_to(vb, (bk, tk))
        elif vb.shape[0] != bk:
            raise ValueError(f"flash grouped: bias batch {vb.shape[0]} != kv batch {bk}")
    vb = jnp.pad(vb, ((0, 0), (0, pad_k)), constant_values=NEG)

    out = _flash_attention_grouped_padded(
        qf, k, v, vb[:, None, :], block_r=block_r, interpret=interpret,
        useful_flops=4 * bq * h * tq * tk * dh)
    if pad_r:
        out = out[:, :, :r_rows]
    out = out.reshape(bk, h, g, tq_p, dh).transpose(0, 2, 1, 3, 4).reshape(bq, h, tq_p, dh)
    return out[:, :, :tq] if pad_q else out


def flash_attention(
    q: Array, k: Array, v: Array, *, bias: Optional[Array] = None
) -> Array:
    """q [B,H,Tq,dh] (already scaled), k/v [B,H,Tk,dh].
    bias: additive, [B or 1, 1, 1, Tk] (padding vector — fast path) or
    [B or 1, 1, Tq, Tk] (full matrix). Returns [B,H,Tq,dh]."""
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    block_q = min(BLOCK_Q, _round_up(max(tq, 8), 8))
    tq_p = _round_up(max(tq, 8), min(block_q, BLOCK_Q))
    tk_p = _round_up(max(tk, 8), LANE)

    interpret = jax.devices()[0].platform != "tpu"

    pad_q = tq_p - tq
    pad_k = tk_p - tk
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))

    vector_bias = bias is None or (bias.ndim == 4 and bias.shape[2] == 1)
    if vector_bias:
        if bias is None:
            vb = jnp.zeros((b, tk), jnp.float32)
        else:
            vb = jnp.broadcast_to(bias[:, 0, 0, :].astype(jnp.float32), (b, tk))
        vb = jnp.pad(vb, ((0, 0), (0, pad_k)), constant_values=NEG)
        bias_arg = vb[:, None, :]
    else:
        mb = jnp.broadcast_to(bias[:, 0].astype(jnp.float32), (b, tq, tk))
        bias_arg = jnp.pad(mb, ((0, 0), (0, pad_q), (0, pad_k)), constant_values=NEG)

    out = _flash_attention_padded(q, k, v, bias_arg, vector_bias=vector_bias, interpret=interpret)
    return out[:, :, :tq] if pad_q else out
