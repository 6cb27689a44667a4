"""Basic functional NN ops over explicit parameter pytrees.

TPU-first conventions:
- Dense kernels are stored (in_features, out_features) — XLA's natural matmul
  layout (torch checkpoints are transposed at import time).
- Compute dtype is an argument (`dtype`), parameters stay float32: this is
  the native-bf16 replacement for the reference's Apex AMP O1/O2
  (reference accelerators/apex_ddp_accelerator.py:80-85).
- LayerNorm always computes statistics in float32 for stability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Initializers (checkpoints normally override these; used for from-scratch
# heads, mirroring BERT's trunc-normal(0.02) init)
# ---------------------------------------------------------------------------


def init_dense(key: Array, d_in: int, d_out: int, *, bias: bool = True, stddev: float = 0.02):
    kkey, _ = jax.random.split(key)
    p = {"kernel": jax.random.truncated_normal(kkey, -2.0, 2.0, (d_in, d_out)) * stddev}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def init_layer_norm(d: int):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def init_embedding(key: Array, n: int, d: int, stddev: float = 0.02):
    return {"embedding": jax.random.truncated_normal(key, -2.0, 2.0, (n, d)) * stddev}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------


def dense(params, x: Array, *, dtype=None) -> Array:
    if "kernel" not in params:  # int8-quantized format (ops/quant.py)
        from efficientvlm_tpu.ops.quant import dense_quantized

        return dense_quantized(params, x, dtype=dtype)
    kernel = params["kernel"]
    if dtype is not None:
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
    y = x @ kernel
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def layer_norm(params, x: Array, *, eps: float = 1e-12) -> Array:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def embedding_lookup(params, ids: Array, *, dtype=None) -> Array:
    emb = params["embedding"]
    if dtype is not None:
        emb = emb.astype(dtype)
    return jnp.take(emb, ids, axis=0)


def quick_gelu(x: Array) -> Array:
    """CLIP's quick_gelu: x * sigmoid(1.702 x) (reference config hidden_act)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {
    "gelu": gelu,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
}


def dropout(x: Array, rate: float, *, rng: Array | None, train: bool) -> Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def uniform_layers(layers) -> bool:
    """True when every per-layer param dict has the same tree-of-shapes —
    the lax.scan-over-layers precondition. Physically-pruned exports carry
    per-layer widths, so scanning must fall back to the unrolled loop."""
    if len(layers) <= 1:
        return True
    import jax

    def shapes(layer):
        return jax.tree.map(lambda x: getattr(x, "shape", None), layer)

    s0 = shapes(layers[0])
    return all(shapes(l) == s0 for l in layers[1:])
