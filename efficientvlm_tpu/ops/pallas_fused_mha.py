"""Fully-fused multi-head self-attention layer kernel:
hidden -> QKV projections -> attention -> head gating -> out projection,
all in one VMEM-resident Pallas program (the SURVEY §7 north-star
"fused QKV+attention+gating" kernel).

Motivation: the standalone attention kernel still round-trips q/k/v through
HBM (3x 28 MB at B=32/T=577/D=768), which is why XLA's fused graph beats it
in-model. This kernel reads the hidden states and weights ONCE per batch
element and writes only the output:

  per grid step (one batch element):
    load hidden [T, D], Wq/Wk/Wv/Wout [D, D], biases     (~5.5 MB bf16)
    for h in heads:                                      (fori, VMEM-resident)
      q = hidden @ Wq[:, h] * scale; k = hidden @ Wk[:, h]; v = ...
      probs = softmax(q k^T + key_bias)
      ctx_h = (probs @ v) * head_z[h]
      out += ctx_h @ Wout[h, :]
    store out [T, D]

VMEM high-water ~8 MB at T=640, D=768 — fits. Per-key padding/attention
mask rides a [T] vector. Residual add / LayerNorm stay outside (XLA fuses
elementwise into the kernel boundary cheaply).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128
NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Kernel win threshold on 128-lane KEY padding. The attention dots compute
# on lane-padded keys, so at k_len=197 (224px ViT) the kernel does +30%
# masked work and at k_len=40 (text tower) 3.2x — measured (teacher fwd
# b16/224px ablation, scripts/bench_kd_step.py --phase ablate): fused 17.66
# vs XLA 14.67 ms even without probs taps. At k_len=577 (384px) padding is
# +11% and the kernel wins +28%. Dispatchers call lane_pad_efficient(k_len)
# and fall back to XLA when padding would eat the fusion saving.
MAX_LANE_PAD = 1.15


def lane_pad_efficient(k_len: int) -> bool:
    return (_round_up(max(int(k_len), 1), LANE) / max(int(k_len), 1)) <= MAX_LANE_PAD


def _fused_kernel(num_heads: int, head_dim: int, scale: float, t_rows: int,
                  emit_probs: bool = False):
    # Mosaic requires dynamic-slice starts that are provably multiples of
    # the 128 lane width; head_dim=64 slices are not, so the loop walks
    # lane-aligned GROUPS of heads and splits them with static slices.
    # t_rows < T: queries only need sublane-aligned ROWS, while keys/values
    # need the full lane-padded length — at short sequences (text tower
    # T=40 -> keys padded to 128, queries only to 16) this cuts the
    # query-side matmul work ~3x.
    heads_per_group = max(1, LANE // head_dim)
    if num_heads % heads_per_group != 0:
        heads_per_group = num_heads  # single group (static start 0)
    group_width = heads_per_group * head_dim
    num_groups = num_heads // heads_per_group

    def kernel(h_ref, wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref, bv_ref,
               bias_ref, gate_ref, o_ref, *rest):
        # rest = (probs_ref, acc_ref) when emit_probs else (acc_ref,)
        probs_ref = rest[0] if emit_probs else None
        acc_ref = rest[-1]
        hidden = h_ref[0]  # [T, D] (lane-padded length)
        # query rows (sublane-padded length); keep a literal no-op when not
        # trimming — Mosaic rejects even a full-range slice as a matmul lhs
        # at narrow model widths
        rows = hidden if t_rows == hidden.shape[0] else hidden[:t_rows]
        key_bias = bias_ref[0, 0].astype(jnp.float32)  # [T]

        def group_body(gi, _):
            # gi is a static Python int (unrolled loop) -> static slices,
            # no Mosaic alignment proof needed for any head_dim.
            # q/k/v kept in the input dtype (bf16): halves the VMEM
            # temporaries (the 16MB scoped limit is tight at T=640/D=768)
            # while the score matmul still accumulates in f32 on the MXU.
            sl = pl.ds(gi * group_width, group_width)
            qg = (jax.lax.dot_general(
                rows, wq_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bq_ref[0, sl].astype(jnp.float32)).astype(hidden.dtype)
            kg = (jax.lax.dot_general(
                hidden, wk_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bk_ref[0, sl].astype(jnp.float32)).astype(hidden.dtype)
            vg = (jax.lax.dot_general(
                hidden, wv_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv_ref[0, sl].astype(jnp.float32)).astype(hidden.dtype)
            wog = wo_ref[sl, :]

            ctx_parts = []
            for s in range(heads_per_group):  # static sub-slices
                q = qg[:, s * head_dim:(s + 1) * head_dim]
                k = kg[:, s * head_dim:(s + 1) * head_dim]
                v = vg[:, s * head_dim:(s + 1) * head_dim]
                scores = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + key_bias[None, :]
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                probs_f32 = e / jnp.sum(e, axis=-1, keepdims=True)
                if emit_probs:
                    # KD taps (GeneralDistill.py:60-82) read the pre-gate
                    # softmax maps; head index is a static unroll constant
                    probs_ref[0, gi * heads_per_group + s] = probs_f32
                probs = probs_f32.astype(hidden.dtype)
                ctx = jax.lax.dot_general(
                    probs, v.astype(hidden.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gate = gate_ref[0, gi * heads_per_group + s]  # SMEM scalar
                ctx_parts.append(ctx * gate)
            ctx_g = jnp.concatenate(ctx_parts, axis=1)  # [t_rows, group_width]
            out_g = jax.lax.dot_general(
                ctx_g.astype(hidden.dtype), wog, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:, :] = acc_ref[:, :] + out_g
            return 0

        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        for gi in range(num_groups):  # static unroll (<= 6 groups)
            group_body(gi, 0)
        o_ref[0] = acc_ref[:, :].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "head_dim", "t_rows",
                                             "interpret", "emit_probs"))
def _fused_mha_padded(hidden, wq, wk, wv, wo, bq, bk, bv, key_bias, gates, *,
                      num_heads: int, head_dim: int, t_rows: int, interpret: bool,
                      emit_probs: bool = False):
    b, t, d = hidden.shape
    a = wq.shape[1]  # attention width — num_heads*head_dim, < d after pruning
    assert a == num_heads * head_dim, (a, num_heads, head_dim)
    scale = head_dim ** -0.5
    grid = (b,)
    kernel = _fused_kernel(num_heads, head_dim, scale, t_rows, emit_probs)
    out_specs = pl.BlockSpec((1, t_rows, d), lambda bi: (bi, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, t_rows, d), hidden.dtype)
    if emit_probs:
        out_specs = [out_specs,
                     pl.BlockSpec((1, num_heads, t_rows, t), lambda bi: (bi, 0, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, num_heads, t_rows, t), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((d, a), lambda bi: (0, 0)),
            pl.BlockSpec((d, a), lambda bi: (0, 0)),
            pl.BlockSpec((d, a), lambda bi: (0, 0)),
            pl.BlockSpec((a, d), lambda bi: (0, 0)),
            pl.BlockSpec((1, a), lambda bi: (0, 0)),
            pl.BlockSpec((1, a), lambda bi: (0, 0)),
            pl.BlockSpec((1, a), lambda bi: (0, 0)),
            pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, num_heads), lambda bi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((t_rows, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # unrolled per-head temporaries can exceed the 16MB default
            # scoped limit at small pruned widths; v5e has headroom
            vmem_limit_bytes=64 * 1024 * 1024 if emit_probs else 32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * d * a * 4 + 4 * b * num_heads * t * t * head_dim,
            bytes_accessed=(hidden.size * 2 + 4 * d * a) * hidden.dtype.itemsize
            + (4 * b * num_heads * t_rows * t if emit_probs else 0),
            transcendentals=b * num_heads * t * t,
        ),
        interpret=interpret,
    )(hidden, wq, wk, wv, wo, bq, bk, bv, key_bias, gates)


def _fused_cross_kernel(num_heads: int, head_dim: int, scale: float,
                        emit_probs: bool = False):
    """Cross-attention variant: queries from the text hidden states, keys/
    values from the encoder (image) sequence — the ITM-rescore / fusion
    hot path (Eff_Retrieval.py:285-319 reranks k_test pairs through it)."""
    heads_per_group = max(1, LANE // head_dim)
    if num_heads % heads_per_group != 0:
        heads_per_group = num_heads
    group_width = heads_per_group * head_dim
    num_groups = num_heads // heads_per_group

    def kernel(h_ref, e_ref, wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref,
               bv_ref, bias_ref, gate_ref, o_ref, *rest):
        probs_ref = rest[0] if emit_probs else None
        acc_ref = rest[-1]
        hidden = h_ref[0]  # [T, D]
        enc = e_ref[0]     # [S, De]
        key_bias = bias_ref[0, 0].astype(jnp.float32)  # [S]

        def group_body(gi):
            sl = pl.ds(gi * group_width, group_width)
            qg = (jax.lax.dot_general(
                hidden, wq_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bq_ref[0, sl].astype(jnp.float32)).astype(hidden.dtype)
            kg = (jax.lax.dot_general(
                enc, wk_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bk_ref[0, sl].astype(jnp.float32)).astype(enc.dtype)
            vg = (jax.lax.dot_general(
                enc, wv_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv_ref[0, sl].astype(jnp.float32)).astype(enc.dtype)
            wog = wo_ref[sl, :]
            ctx_parts = []
            for s in range(heads_per_group):
                q = qg[:, s * head_dim:(s + 1) * head_dim]
                k = kg[:, s * head_dim:(s + 1) * head_dim]
                v = vg[:, s * head_dim:(s + 1) * head_dim]
                scores = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + key_bias[None, :]
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                probs_f32 = e / jnp.sum(e, axis=-1, keepdims=True)
                if emit_probs:
                    probs_ref[0, gi * heads_per_group + s] = probs_f32
                probs = probs_f32.astype(hidden.dtype)
                ctx = jax.lax.dot_general(
                    probs, v.astype(hidden.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gate = gate_ref[0, gi * heads_per_group + s]
                ctx_parts.append(ctx * gate)
            ctx_g = jnp.concatenate(ctx_parts, axis=1)
            out_g = jax.lax.dot_general(
                ctx_g.astype(hidden.dtype), wog, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:, :] = acc_ref[:, :] + out_g

        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        for gi in range(num_groups):
            group_body(gi)
        o_ref[0] = acc_ref[:, :].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "head_dim", "interpret",
                                             "emit_probs"))
def _fused_cross_padded(hidden, enc, wq, wk, wv, wo, bq, bk, bv, key_bias, gates, *,
                        num_heads: int, head_dim: int, interpret: bool,
                        emit_probs: bool = False):
    b, t, d = hidden.shape
    s = enc.shape[1]
    de = enc.shape[2]
    a = wq.shape[1]
    assert a == num_heads * head_dim, (a, num_heads, head_dim)
    scale = head_dim ** -0.5
    kernel = _fused_cross_kernel(num_heads, head_dim, scale, emit_probs)
    out_specs = pl.BlockSpec((1, t, d), lambda bi: (bi, 0, 0))
    out_shape = jax.ShapeDtypeStruct(hidden.shape, hidden.dtype)
    if emit_probs:
        out_specs = [out_specs,
                     pl.BlockSpec((1, num_heads, t, s), lambda bi: (bi, 0, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, num_heads, t, s), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, s, de), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((d, a), lambda bi: (0, 0)),
            pl.BlockSpec((de, a), lambda bi: (0, 0)),
            pl.BlockSpec((de, a), lambda bi: (0, 0)),
            pl.BlockSpec((a, d), lambda bi: (0, 0)),
            pl.BlockSpec((1, a), lambda bi: (0, 0)),
            pl.BlockSpec((1, a), lambda bi: (0, 0)),
            pl.BlockSpec((1, a), lambda bi: (0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, num_heads), lambda bi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((t, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024 if emit_probs else 32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * d * a + 4 * b * s * de * a + 4 * b * num_heads * t * s * head_dim,
            bytes_accessed=(hidden.size + enc.size + t * d + 2 * d * a + 2 * de * a) * hidden.dtype.itemsize,
            transcendentals=b * num_heads * t * s,
        ),
        interpret=interpret,
    )(hidden, enc, wq, wk, wv, wo, bq, bk, bv, key_bias, gates)


def _cross_call(params, hidden, encoder_hidden, kb2, gates1,
                num_heads: int, return_probs: bool):
    """Pad + kernel + trim for cross-attention. kb2: UNPADDED [B, S] f32."""
    b, t, d = hidden.shape
    s = encoder_hidden.shape[1]
    head_dim = params["q"]["kernel"].shape[1] // num_heads
    # rows (queries) pad to the sublane tile, cols (keys) to the lane width;
    # at narrow model widths (d < one lane — tiny test configs) Mosaic
    # rejects short-row matmul lhs, so pad rows to the lane width there too
    row_tile = (16 if hidden.dtype == jnp.bfloat16 else 8) if d >= LANE else LANE
    t_p = _round_up(max(t, 8), row_tile)
    s_p = _round_up(max(s, 8), LANE)
    x = jnp.pad(hidden, ((0, 0), (0, t_p - t), (0, 0))) if t_p != t else hidden
    e = (jnp.pad(encoder_hidden, ((0, 0), (0, s_p - s), (0, 0)))
         if s_p != s else encoder_hidden)
    kb = jnp.pad(kb2, ((0, 0), (0, s_p - s)), constant_values=NEG)[:, None, :]
    gates = gates1.reshape(1, num_heads)

    interpret = jax.devices()[0].platform != "tpu"
    dt = x.dtype
    e = e.astype(dt)
    res = _fused_cross_padded(
        x, e,
        params["q"]["kernel"].astype(dt), params["k"]["kernel"].astype(dt),
        params["v"]["kernel"].astype(dt), params["out"]["kernel"].astype(dt),
        params["q"]["bias"].reshape(1, -1), params["k"]["bias"].reshape(1, -1),
        params["v"]["bias"].reshape(1, -1),
        kb, gates, num_heads=num_heads, head_dim=head_dim, interpret=interpret,
        emit_probs=return_probs,
    )
    out, probs = res if return_probs else (res, None)
    out = out[:, :t] if t_p != t else out
    out = out + params["out"]["bias"].astype(out.dtype)
    if return_probs:
        return out, probs[:, :, :t, :s]
    return out


@functools.lru_cache(maxsize=None)
def _dv_cross(num_heads: int, return_probs: bool):
    """Differentiable fused cross-attention (see _dv_self)."""
    from .attention import multi_head_attention

    def ref(params, hidden, enc, kb2, gates1):
        bias = kb2[:, None, None, :]
        out, probs, _ = multi_head_attention(
            params, hidden, enc, num_heads=num_heads, bias=bias, head_z=gates1,
            output_probs=True, dtype=hidden.dtype,
        )
        return (out, probs) if return_probs else out

    def impl(params, hidden, enc, kb2, gates1):
        return _cross_call(params, hidden, enc, kb2, gates1, num_heads, return_probs)

    f = jax.custom_vjp(impl)

    def fwd(params, hidden, enc, kb2, gates1):
        return impl(params, hidden, enc, kb2, gates1), (params, hidden, enc, kb2, gates1)

    def bwd(res, ct):
        _, vjp = jax.vjp(ref, *res)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


def fused_cross_attention(
    params: dict,
    hidden: Array,
    encoder_hidden: Array,
    *,
    num_heads: int,
    mask: Optional[Array] = None,
    key_bias: Optional[Array] = None,
    head_z: Optional[Array] = None,
    return_probs: bool = False,
    differentiable: bool = False,
):
    """Fused cross-attention over params {'q','k','v','out'} — queries from
    hidden [B,T,D], keys/values from encoder_hidden [B,S,De]; mask [B,S]
    (1=attend) or key_bias [B,S] additive; head_z [num_heads] or None.
    Equivalent to multi_head_attention(params, hidden, encoder_hidden, ...)
    [0] without dropout. Supports pruned rectangular projection widths.
    differentiable=True: custom_vjp with XLA-recompute backward."""
    b = hidden.shape[0]
    s = encoder_hidden.shape[1]
    if key_bias is not None:
        kb2 = jnp.broadcast_to(key_bias.astype(jnp.float32), (b, s))
    elif mask is None:
        kb2 = jnp.zeros((b, s), jnp.float32)
    else:
        kb2 = (1.0 - mask.astype(jnp.float32)) * NEG
    gates1 = (jnp.ones((num_heads,), jnp.float32) if head_z is None
              else head_z.astype(jnp.float32).reshape(num_heads))
    if differentiable:
        return _dv_cross(num_heads, return_probs)(params, hidden, encoder_hidden, kb2, gates1)
    return _cross_call(params, hidden, encoder_hidden, kb2, gates1, num_heads, return_probs)


def _self_call(params, hidden, kb2, gates1, num_heads: int, return_probs: bool):
    """Pad + kernel + trim for self-attention. kb2: UNPADDED [B, T] f32
    additive key bias; gates1: [H] f32."""
    b, t, d = hidden.shape
    head_dim = params["q"]["kernel"].shape[1] // num_heads
    t_p = _round_up(max(t, 8), LANE)
    # row trimming only at lane-wide models: Mosaic rejects the sliced-rows
    # matmul ("Bad lhs type") when the model dim is narrower than one lane
    # (tiny test configs); production widths are >= 256
    if d >= LANE:
        t_rows = min(t_p, _round_up(max(t, 8), 16 if hidden.dtype == jnp.bfloat16 else 8))
    else:
        t_rows = t_p
    pad_t = t_p - t
    x = jnp.pad(hidden, ((0, 0), (0, pad_t), (0, 0))) if pad_t else hidden
    kb = jnp.pad(kb2, ((0, 0), (0, pad_t)), constant_values=NEG)[:, None, :]
    gates = gates1.reshape(1, num_heads)

    interpret = jax.devices()[0].platform != "tpu"
    dt = x.dtype
    res = _fused_mha_padded(
        x,
        params["q"]["kernel"].astype(dt), params["k"]["kernel"].astype(dt),
        params["v"]["kernel"].astype(dt), params["out"]["kernel"].astype(dt),
        params["q"]["bias"].reshape(1, -1), params["k"]["bias"].reshape(1, -1),
        params["v"]["bias"].reshape(1, -1),
        kb, gates, num_heads=num_heads, head_dim=head_dim, t_rows=t_rows,
        interpret=interpret, emit_probs=return_probs,
    )
    out, probs = res if return_probs else (res, None)
    out = out[:, :t] if out.shape[1] != t else out
    out = out + params["out"]["bias"].astype(out.dtype)
    if return_probs:
        # pre-gate softmax maps, padded rows/cols trimmed — matches the XLA
        # path's f32 probs [B, H, Tq, Tk] (ops/attention.py:128-131)
        return out, probs[:, :, :t, :t]
    return out


@functools.lru_cache(maxsize=None)
def _dv_self(num_heads: int, return_probs: bool):
    """Differentiable fused self-attention: forward runs the Pallas kernel,
    backward recomputes via the XLA reference (ops/attention.py) and takes
    its VJP — the flash-attention-style remat trade that lets TRAINING
    forwards (student KD, dropout-free configs) fuse too. Cotangents flow
    through both outputs (the KD attention loss differentiates probs)."""
    from .attention import multi_head_attention

    def ref(params, hidden, kb2, gates1):
        bias = kb2[:, None, None, :]
        out, probs, _ = multi_head_attention(
            params, hidden, num_heads=num_heads, bias=bias, head_z=gates1,
            output_probs=True, dtype=hidden.dtype,
        )
        return (out, probs) if return_probs else out

    def impl(params, hidden, kb2, gates1):
        return _self_call(params, hidden, kb2, gates1, num_heads, return_probs)

    f = jax.custom_vjp(impl)

    def fwd(params, hidden, kb2, gates1):
        return impl(params, hidden, kb2, gates1), (params, hidden, kb2, gates1)

    def bwd(res, ct):
        _, vjp = jax.vjp(ref, *res)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


def fused_self_attention(
    params: dict,
    hidden: Array,
    *,
    num_heads: int,
    mask: Optional[Array] = None,
    key_bias: Optional[Array] = None,
    head_z: Optional[Array] = None,
    return_probs: bool = False,
    differentiable: bool = False,
):
    """Fused self-attention layer over attention params {'q','k','v','out'}
    (each {'kernel','bias'}); hidden [B,T,D]; mask [B,T] (1=attend) or
    key_bias [B,T] additive; head_z [num_heads] or None. Equivalent to
    multi_head_attention(...)[0] for self-attention without dropout.

    Supports RECTANGULAR projections (q kernel [D, A], A = num_heads *
    head_dim < D) — the physically-pruned export's layer shapes.

    Padding is asymmetric: keys/values (and the score columns) need the
    128-lane pad; query ROWS only need the sublane tile, so short
    sequences don't pay a 128-row quadratic pad.

    differentiable=True wraps the kernel in a custom_vjp whose backward
    recomputes the XLA reference — use on training forwards."""
    b, t, d = hidden.shape
    if key_bias is not None:
        kb2 = jnp.broadcast_to(key_bias.astype(jnp.float32), (b, t))
    elif mask is None:
        kb2 = jnp.zeros((b, t), jnp.float32)
    else:
        kb2 = (1.0 - mask.astype(jnp.float32)) * NEG
    gates1 = (jnp.ones((num_heads,), jnp.float32) if head_z is None
              else head_z.astype(jnp.float32).reshape(num_heads))
    if differentiable:
        return _dv_self(num_heads, return_probs)(params, hidden, kb2, gates1)
    return _self_call(params, hidden, kb2, gates1, num_heads, return_probs)


# ---------------------------------------------------------------------------
# Grouped-K/V fused cross-attention layer (the k_test rerank hot path)
# ---------------------------------------------------------------------------


def _fused_cross_grouped_kernel(num_heads: int, head_dim: int, scale: float,
                                ln_eps=None):
    """Grouped variant of _fused_cross_kernel: G contiguous query rows share
    one encoder row. Grid (Bk, row_blocks) over GROUP-FOLDED queries
    [Bk, G*T_p, D]; each image's K/V are projected ONCE into VMEM scratch
    at its first row block and stay resident for the remaining blocks
    (pl.when(ri == 0)), so neither the K/V projections nor the [R, S]
    scores ever touch HBM. Replaces, for the rerank chunk, the chain
    q-split copy -> grouped einsum (850 MB f32 scores/layer) -> merge copy
    that held eval reranking at 0.21 MFU (VERDICT r4 #4)."""
    heads_per_group = max(1, LANE // head_dim)
    if num_heads % heads_per_group != 0:
        heads_per_group = num_heads
    group_width = heads_per_group * head_dim
    num_groups = num_heads // heads_per_group

    def kernel(h_ref, e_ref, wq_ref, wk_ref, wv_ref, wo_ref, bq_ref, bk_ref,
               bv_ref, bias_ref, gate_ref, ob_ref, gamma_ref, beta_ref,
               o_ref, k_scr, v_scr, acc_ref):
        ri = pl.program_id(1)

        @pl.when(ri == 0)
        def _project_kv():
            enc = e_ref[0]  # [S, De]
            k_scr[:, :] = (jax.lax.dot_general(
                enc, wk_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bk_ref[0, :].astype(jnp.float32)).astype(k_scr.dtype)
            v_scr[:, :] = (jax.lax.dot_general(
                enc, wv_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv_ref[0, :].astype(jnp.float32)).astype(v_scr.dtype)

        hidden = h_ref[0]  # [R, D] — R folded query rows of this image
        key_bias = bias_ref[0, 0].astype(jnp.float32)  # [S]

        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        for gi in range(num_groups):
            sl = pl.ds(gi * group_width, group_width)
            qg = (jax.lax.dot_general(
                hidden, wq_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bq_ref[0, sl].astype(jnp.float32)).astype(hidden.dtype)
            kg = k_scr[:, sl]
            vg = v_scr[:, sl]
            wog = wo_ref[sl, :]
            ctx_parts = []
            for s in range(heads_per_group):
                q = qg[:, s * head_dim:(s + 1) * head_dim]
                k = kg[:, s * head_dim:(s + 1) * head_dim]
                v = vg[:, s * head_dim:(s + 1) * head_dim]
                scores = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + key_bias[None, :]
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(hidden.dtype)
                ctx = jax.lax.dot_general(
                    probs, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gate = gate_ref[0, gi * heads_per_group + s]
                ctx_parts.append(ctx * gate)
            ctx_g = jnp.concatenate(ctx_parts, axis=1)
            acc_ref[:, :] = acc_ref[:, :] + jax.lax.dot_general(
                ctx_g.astype(hidden.dtype), wog, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out = acc_ref[:, :] + ob_ref[0, :].astype(jnp.float32)
        if ln_eps is not None:
            # residual + post-LN epilogue (ops/basic.layer_norm semantics:
            # f32 mean/var over D, scale+shift, cast back) — saves the
            # separate [Bq*T, D] residual/convert/reduce round-trip XLA
            # would run between this layer's attention and its LayerNorm
            y = hidden.astype(jnp.float32) + out
            mean = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
            out = ((y - mean) * jax.lax.rsqrt(var + ln_eps)
                   * gamma_ref[0, :].astype(jnp.float32)
                   + beta_ref[0, :].astype(jnp.float32))
        o_ref[0] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "head_dim",
                                             "block_rows", "interpret",
                                             "useful_flops", "ln_eps"))
def _fused_cross_grouped_padded(hidden, enc, wq, wk, wv, wo, bq, bk_, bv,
                                key_bias, gates, ob, gamma, beta, *,
                                num_heads: int,
                                head_dim: int, block_rows: int, interpret: bool,
                                useful_flops: int, ln_eps):
    """hidden: [Bk, R, D] group-folded padded queries (R % block_rows == 0);
    enc: [Bk, S_p, De]; key_bias: [Bk, 1, S_p]."""
    bk, r, d = hidden.shape
    s, de = enc.shape[1], enc.shape[2]
    a = wq.shape[1]
    assert a == num_heads * head_dim, (a, num_heads, head_dim)
    scale = head_dim ** -0.5
    kernel = _fused_cross_grouped_kernel(num_heads, head_dim, scale, ln_eps)
    return pl.pallas_call(
        kernel,
        grid=(bk, r // block_rows),
        in_specs=[
            pl.BlockSpec((1, block_rows, d), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, s, de), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((d, a), lambda bi, ri: (0, 0)),
            pl.BlockSpec((de, a), lambda bi, ri: (0, 0)),
            pl.BlockSpec((de, a), lambda bi, ri: (0, 0)),
            pl.BlockSpec((a, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, a), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, a), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, a), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, ri: (bi, 0, 0)),
            pl.BlockSpec((1, num_heads), lambda bi, ri: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, d), lambda bi, ri: (bi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct(hidden.shape, hidden.dtype),
        scratch_shapes=[
            pltpu.VMEM((s, a), hidden.dtype),   # K, projected once per image
            pltpu.VMEM((s, a), hidden.dtype),   # V
            pltpu.VMEM((block_rows, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the K/V scratch carries state across the row-block dim
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # UNPADDED model flops (caller-computed): padded counts would
            # inflate downstream cost-analysis MFU vs the XLA einsum path
            flops=useful_flops,
            bytes_accessed=(2 * hidden.size + enc.size + 4 * d * a) * hidden.dtype.itemsize,
            transcendentals=bk * num_heads * r * s,
        ),
        interpret=interpret,
    )(hidden, enc, wq, wk, wv, wo, bq, bk_, bv, key_bias, gates, ob, gamma, beta)


def fused_cross_attention_grouped(
    params: dict,
    hidden: Array,
    encoder_hidden: Array,
    *,
    num_heads: int,
    kv_groups: int,
    mask: Optional[Array] = None,
    key_bias: Optional[Array] = None,
    head_z: Optional[Array] = None,
    ln_params: Optional[dict] = None,
    ln_eps: float = 1e-12,
):
    """Fused cross-attention layer with grouped K/V: queries from hidden
    [Bk*G, T, D] (groups contiguous), keys/values from encoder_hidden
    [Bk, S, De] — every group of G query rows shares its image's K/V,
    projected once in VMEM. mask/key_bias: per-IMAGE [Bk, S]. Equivalent to
    multi_head_attention(..., kv_groups=G)[0] without dropout/probs.
    With ln_params {'scale','bias'} the kernel also applies the bert
    layer's residual + post-LayerNorm epilogue (returns
    layer_norm(hidden + attn_out)) — one fewer full-activation HBM
    round-trip per fusion layer. Eval-path only (no custom_vjp: the
    rerank/decode callers don't differentiate); training grouped
    cross-attention stays on XLA."""
    b, t, d = hidden.shape
    bk, s, de = encoder_hidden.shape
    g = kv_groups
    if b != bk * g:
        raise ValueError(f"fused grouped cross: query batch {b} != {g} * kv batch {bk}")
    if key_bias is not None:
        kb2 = jnp.broadcast_to(key_bias.astype(jnp.float32), (bk, s))
    elif mask is None:
        kb2 = jnp.zeros((bk, s), jnp.float32)
    else:
        kb2 = (1.0 - mask.astype(jnp.float32)) * NEG
    gates1 = (jnp.ones((num_heads,), jnp.float32) if head_z is None
              else head_z.astype(jnp.float32).reshape(1, num_heads))
    if gates1.ndim == 1:
        gates1 = gates1.reshape(1, num_heads)

    head_dim = params["q"]["kernel"].shape[1] // num_heads
    row_tile = (16 if hidden.dtype == jnp.bfloat16 else 8) if d >= LANE else LANE
    t_p = _round_up(max(t, 8), row_tile)
    s_p = _round_up(max(s, 8), LANE)
    x = jnp.pad(hidden, ((0, 0), (0, t_p - t), (0, 0))) if t_p != t else hidden
    e = (jnp.pad(encoder_hidden, ((0, 0), (0, s_p - s), (0, 0)))
         if s_p != s else encoder_hidden)
    kb = jnp.pad(kb2, ((0, 0), (0, s_p - s)), constant_values=NEG)[:, None, :]

    # group fold is a FREE reshape (contiguous leading-dim split) — no
    # transposed copies, unlike folding a head-split [B,H,T,dh] layout
    r_rows = g * t_p
    xf = x.reshape(bk, r_rows, d)
    block_rows = r_rows
    for cand in (512, 384, 256, 128):
        if r_rows % cand == 0:
            block_rows = cand
            break
    interpret = jax.devices()[0].platform != "tpu"
    dt = x.dtype
    a_w = params["q"]["kernel"].shape[1]
    useful_flops = (
        2 * b * t * d * a_w * 2          # q + out projections, real rows
        + 4 * bk * s * de * a_w          # K/V projections, once per image
        + 4 * b * t * s * a_w            # QK^T + PV over real q rows/keys
    )
    if ln_params is not None:
        gamma = ln_params["scale"].reshape(1, -1)
        beta = ln_params["bias"].reshape(1, -1)
        eps_arg = float(ln_eps)
    else:
        gamma = jnp.ones((1, d), jnp.float32)
        beta = jnp.zeros((1, d), jnp.float32)
        eps_arg = None
    out = _fused_cross_grouped_padded(
        xf, e.astype(dt),
        params["q"]["kernel"].astype(dt), params["k"]["kernel"].astype(dt),
        params["v"]["kernel"].astype(dt), params["out"]["kernel"].astype(dt),
        params["q"]["bias"].reshape(1, -1), params["k"]["bias"].reshape(1, -1),
        params["v"]["bias"].reshape(1, -1),
        kb, gates1, params["out"]["bias"].reshape(1, -1), gamma, beta,
        num_heads=num_heads, head_dim=head_dim,
        block_rows=block_rows, interpret=interpret, useful_flops=useful_flops,
        ln_eps=eps_arg,
    )
    out = out.reshape(b, t_p, d)
    return out[:, :t] if t_p != t else out
