"""Pallas fused patch-embed kernel (TPU).

Fuses the ViT input stage — patch-conv matmul + bias + positional-embedding
add + pre-LayerNorm (reference models/clip_vit.py:343-367, our
models/vit.py:187-199) — into one VMEM-resident kernel, the last un-fused
encoder stage (SURVEY §2.8 kernel targets). Under XLA this stage is a conv
-> HBM write -> concat -> add -> LN read/write chain; fusing it removes two
full [B, Np, D] HBM round-trips and runs the conv as a straight MXU matmul
over pre-extracted patch pixels.

Decomposition:
- XLA prolog: reshape+transpose images [B,H,W,3] -> patch matrix
  [B, Np, P*P*3] (pure layout, fuses into the producer) and pad Np / K to
  tile multiples.
- kernel: grid (B, Np/R); each program computes Y = X @ W + bias + pos for
  an R-row patch block, then LayerNorm(gamma, beta) in f32 — one pass, out
  in compute dtype.
- XLA epilog: the CLS row (ln(cls + pos[0]), [B, 1, D]) is computed in XLA
  (LN is per-row, so the split is exact) and concatenated.

Falls back to interpret mode off-TPU so tests exercise the same code path.
Requires D % 128 == 0 (lane width); callers fall back to the XLA path
otherwise (models/vit.py:use_fused guard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128
BLOCK_R = 256  # patch rows per program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w_ref, b_ref, pos_ref, g_ref, beta_ref, o_ref, *, eps: float):
    x = x_ref[0]
    y = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = y + b_ref[0].astype(jnp.float32)[None, :] + pos_ref[:].astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    c = y - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    o_ref[0] = (
        c * jax.lax.rsqrt(var + eps) * g_ref[0].astype(jnp.float32)[None, :]
        + beta_ref[0].astype(jnp.float32)[None, :]
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "interpret"))
def _patch_embed_padded(xp, w, bias, pos, gamma, beta, *, eps: float,
                        interpret: bool):
    b, np_p, k = xp.shape
    d = w.shape[1]
    block_r = min(BLOCK_R, np_p)
    grid = (b, np_p // block_r)
    flops = 2 * b * np_p * k * d
    bytes_acc = xp.size * xp.dtype.itemsize + w.size * w.dtype.itemsize \
        + b * np_p * d * xp.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_r, k), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((k, d), lambda bi, ri: (0, 0)),  # grid-invariant
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((block_r, d), lambda bi, ri: (ri, 0)),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_r, d), lambda bi, ri: (bi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_p, d), xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0),
        interpret=interpret,
    )(xp, w, bias, pos, gamma, beta)


def supported(vision_width: int) -> bool:
    return vision_width % LANE == 0


def _reference(xp, w, bias, pos, gamma, beta, *, eps: float):
    """Pure-jnp twin of _patch_embed_padded (same f32 math) — the
    custom_vjp backward differentiates THIS, so the train path gets exact
    XLA gradients while the forward runs the kernel (the same
    kernel-forward / XLA-recompute-backward pattern as pallas_fused_mha)."""
    y = jax.lax.dot_general(
        xp.astype(jnp.float32), w.astype(jnp.float32),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32)[None] + pos.astype(jnp.float32)[None]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    c = y - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    out = (c * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)[None]
           + beta.astype(jnp.float32)[None])
    return out.astype(xp.dtype)


@functools.lru_cache(maxsize=None)
def _diff_embed(eps: float, interpret: bool):
    @jax.custom_vjp
    def op(xp, w, bias, pos, gamma, beta):
        return _patch_embed_padded(xp, w, bias, pos, gamma, beta,
                                   eps=eps, interpret=interpret)

    def fwd(*args):
        return op(*args), args

    def bwd(res, ct):
        _, vjp = jax.vjp(functools.partial(_reference, eps=eps), *res)
        return vjp(ct)

    op.defvjp(fwd, bwd)
    return op


def fused_patch_embed(params: dict, images: Array, *, patch_size: int,
                      vision_width: int, eps: float = 1e-5, dtype=None) -> Array:
    """images [B, H, W, 3] -> pre-LN'd hidden [B, 1+Np, D] (CLS first),
    numerically matching the XLA stage in models/vit.py:187-199."""
    p, d = patch_size, vision_width
    if dtype is None:
        dtype = images.dtype if jnp.issubdtype(images.dtype, jnp.floating) \
            else jnp.float32
    b, hh, ww, c = images.shape
    hp, wp = hh // p, ww // p
    n_patches = hp * wp
    k = p * p * c

    # prolog: im2col as pure layout — [B,Hp,P,Wp,P,C] -> [B,Hp,Wp,P,P,C];
    # (ph, pw, c) flattening matches the HWIO conv kernel's (H, W, I) order
    x = images.astype(dtype).reshape(b, hp, p, wp, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, n_patches, k)
    w = params["patch_embed"]["kernel"].astype(dtype).reshape(k, d)

    k_p = _round_up(k, LANE)
    block_r = min(BLOCK_R, _round_up(n_patches, 8))
    np_p = _round_up(n_patches, block_r)
    if k_p != k:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, k_p - k)))
        w = jnp.pad(w, ((0, k_p - k), (0, 0)))
    if np_p != n_patches:
        x = jnp.pad(x, ((0, 0), (0, np_p - n_patches), (0, 0)))

    bias = params["patch_embed"].get("bias")
    bias = (jnp.zeros((d,), jnp.float32) if bias is None else bias)[None, :]
    pos = params["pos_embed"]["embedding"]  # [1+Np(+...), D]; row 0 = CLS
    pos_rows = pos[1 : 1 + n_patches].astype(jnp.float32)
    if np_p != n_patches:
        pos_rows = jnp.pad(pos_rows, ((0, np_p - n_patches), (0, 0)))
    gamma = params["pre_ln"]["scale"][None, :]
    beta = params["pre_ln"]["bias"][None, :]

    interpret = jax.devices()[0].platform != "tpu"
    out = _diff_embed(eps, interpret)(
        x, w, bias.astype(jnp.float32), pos_rows,
        gamma.astype(jnp.float32), beta.astype(jnp.float32))[:, :n_patches]

    # epilog: CLS row through the identical math (LN is per-row => exact)
    cls = (params["class_embedding"].astype(jnp.float32)
           + pos[0].astype(jnp.float32))[None, None, :]
    mean = jnp.mean(cls, axis=-1, keepdims=True)
    cvar = jnp.mean((cls - mean) ** 2, axis=-1, keepdims=True)
    cls = ((cls - mean) * jax.lax.rsqrt(cvar + eps)
           * params["pre_ln"]["scale"].astype(jnp.float32)
           + params["pre_ln"]["bias"].astype(jnp.float32)).astype(out.dtype)
    return jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), out], axis=1)
