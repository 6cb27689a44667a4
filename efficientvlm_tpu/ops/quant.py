"""Post-training int8 quantization for inference serving.

A capability the reference lacks entirely (its inference story is fp16
autocast at best): int8 weights halve checkpoint size and HBM weight
traffic, and v5e MXUs execute s8 x s8 -> s32 natively.

Two modes, both symmetric per-output-channel:
- ``w8`` (default): weight-only — int8 weights dequantized into the matmul
  (XLA fuses the convert into the dot's operand read, so weights stream
  from HBM at 1 byte/param). Compute speed == bf16; numerics near-bf16
  because activations stay in bf16. Best for bandwidth-bound decode and
  for halving served-model footprint at zero throughput cost.
- ``w8a8``: weights int8, activations dynamically per-row (per-token)
  int8 at run time; the matmul runs s8 x s8 -> s32 on the MXU.

Why w8 is the default (measured, v5e-1, scripts/bench_int8_probe.py at
[9232, 768] x [768, 768], chained on-device): bf16 97.8 TFLOP/s; raw
s8->s32 dot 124.2 (1.27x — the XLA int8 MXU path is real but nowhere near
the nominal 2x at these widths); w8a8 with dynamic bf16-pipeline
activation quant 114.6 (+17% over bf16); with the original f32 pipeline
104.2 (+6%). Since w8a8 params also force attention off the fused-MHA
kernel (+28% at 384px eval shapes, models/bert.py use_fused), end-to-end
w8a8 LOSES to the fused bf16 path (BENCH_r03: 925 vs 1723 pairs/s) — an
honest int8 "speedup" story at X-VLM widths does not exist, so w8a8 is
kept only as an opt-in (it still halves weight bytes and may win on
future hardware / larger widths).

Format: ``quantize_params`` rewrites every eligible dense-param dict
``{"kernel": f32[(d_in, d_out)], "bias"?}`` into
``{"kernel_q8" | "kernel_q8a8": int8, "scale": f32[(d_out,)], "bias"?}``
— the mode rides in the KEY NAME so the pytree STRUCTURE (not an array
leaf that would turn into a tracer under jit) selects the lowering.
``ops.basic.dense`` recognizes the format transparently, so every
XLA-impl forward (attention projections, FFNs, heads — the whole
retrieval eval unit of reference Eff_Retrieval.py:216-332) runs
quantized without model changes. LayerNorm, embeddings, the patch-embed
conv, and small heads stay float.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_dense(p: dict, *, mode: str = "w8") -> dict:
    """Per-output-channel symmetric int8 quantization of one dense param."""
    assert mode in ("w8", "w8a8"), mode
    k = p["kernel"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=0)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out = {
        ("kernel_q8a8" if mode == "w8a8" else "kernel_q8"): kq,
        "scale": scale.astype(jnp.float32),
    }
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_params(params, *, mode: str = "w8", min_dim: int = 256):
    """Walk a param pytree, quantizing every eligible 2-D dense kernel.

    min_dim guards tiny heads (e.g. the 2-class ITM output) where
    quantization noise is proportionally largest and the matmul is free.
    """

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2 \
                    and min(node["kernel"].shape) >= min_dim:
                return quantize_dense(node, mode=mode)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def is_quantized(p: dict) -> bool:
    return "kernel_q8" in p or "kernel_q8a8" in p


def dense_quantized(params: dict, x: Array, *, dtype=None) -> Array:
    """Apply a quantized dense param dict. Called from ops.basic.dense."""
    out_dtype = dtype or (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                          else jnp.float32)
    if "kernel_q8a8" in params:
        # bf16 quant pipeline: the abs-max reduction and round/clip passes
        # over the activations are bandwidth-bound; running them in f32
        # costs ~11% of the whole GEMM (probe: 104.2 vs 114.6 TFLOP/s)
        kq, w_scale = params["kernel_q8a8"], params["scale"]
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if x2.dtype == jnp.float32:
            x2 = x2.astype(jnp.bfloat16)
        amax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
        x_scale = jnp.maximum(amax, jnp.asarray(1e-6, x2.dtype)) / 127.0
        xq = jnp.clip(jnp.round(x2 / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, kq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * x_scale.astype(jnp.float32) * w_scale[None, :]
        y = y.reshape(*lead, -1).astype(out_dtype)
    else:  # w8: dequantize into the dot (weights stream int8 from HBM)
        kq, w_scale = params["kernel_q8"], params["scale"]
        w = kq.astype(out_dtype) * w_scale.astype(out_dtype)[None, :]
        y = x.astype(out_dtype) @ w
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def quantized_bytes(params) -> dict:
    """Parameter-storage accounting: quantized vs float32 bytes."""
    q = f = 0
    for leaf in jax.tree.leaves(params):
        n = leaf.size * leaf.dtype.itemsize
        q += n
        f += leaf.size * 4 if leaf.dtype == jnp.int8 else n
    return {"quantized_bytes": int(q), "float32_bytes": int(f)}
