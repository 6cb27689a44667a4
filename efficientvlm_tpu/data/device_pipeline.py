"""Device-side (in-XLA-graph) image preprocessing.

North-star replacement for the reference's host-side PIL/torchvision
pipeline (dataset/__init__.py:21-61): the host only decodes JPEG -> uint8;
random-resized-crop, horizontal flip, a RandAugment subset, and CLIP
normalization compile into the training graph, so (a) host->device traffic
is uint8 (4x smaller than f32), and (b) augmentation runs on the MXU/VPU
overlapped with the train step.

All randomness from explicit PRNG keys; per-sample op selection via
lax.switch over a fixed op set (SURVEY §7 hard-part 5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .transforms import CLIP_MEAN, CLIP_STD

Array = jax.Array


def _resize(img: Array, size: Tuple[int, int]) -> Array:
    return jax.image.resize(img, (*size, img.shape[-1]), method="bicubic")


def random_resized_crop(rng: Array, img: Array, out_res: int, *, scale=(0.5, 1.0), ratio=(0.75, 4.0 / 3.0)) -> Array:
    """Single-sample [H,W,3] float -> [out_res,out_res,3]. torchvision
    semantics with one sampled box (XLA-friendly: no retry loop; a clipped
    box replaces rejection sampling)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = h * w * jax.random.uniform(k1, minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k2, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 8, w).astype(jnp.int32)
    ch = jnp.clip(jnp.sqrt(area / aspect), 8, h).astype(jnp.int32)
    x0 = jax.random.randint(k3, (), 0, jnp.maximum(w - cw, 1))
    y0 = jax.random.randint(k4, (), 0, jnp.maximum(h - ch, 1))
    # gather-based crop+resize with dynamic box but static output shape
    ys = y0 + (jnp.arange(out_res) * ch) // out_res
    xs = x0 + (jnp.arange(out_res) * cw) // out_res
    cropped = img[ys][:, xs]  # nearest within box; then bicubic smooth
    return _resize(cropped, (out_res, out_res))


def random_hflip(rng: Array, img: Array) -> Array:
    return jax.lax.cond(
        jax.random.bernoulli(rng), lambda x: x[:, ::-1], lambda x: x, img
    )


# -- RandAugment: the FULL reference op table (dataset/randaugment.py
# func_dict/arg_dict — Identity/AutoContrast/Equalize/Rotate/Solarize/
# Color/Contrast/Brightness/Sharpness/ShearX/ShearY/TranslateX/TranslateY/
# Posterize; fill=128, translate_const=10, MAX_LEVEL=10).
# Every op is a closure over the STATIC level (m/10); the only traced
# randomness inside an op is the sign scalar (rotate/shear/translate flip
# sign with p=0.5, like the reference's level negation). ---------------------

FILL = 128.0


def _blend(a: Array, b: Array, factor) -> Array:
    return jnp.clip(a + (b - a) * factor, 0.0, 255.0)


def _affine_sample(img: Array, a, b, c, d, e, f) -> Array:
    """PIL-style inverse affine: out(x, y) = img(a*x + b*y + c, d*x + e*y + f),
    bilinear, out-of-bounds filled with 128 (reference fill)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    gx = a * xs + b * ys + c
    gy = d * xs + e * ys + f
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
        return jnp.where(inside[..., None], v, FILL)

    out = (tap(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
           + tap(y0, x0 + 1) * (wx * (1 - wy))[..., None]
           + tap(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
           + tap(y0 + 1, x0 + 1) * (wx * wy)[..., None])
    return out


def make_randaug_ops(level: float):
    """Build the 14-op table at static magnitude level = m / MAX_LEVEL.
    Each op: (img [H,W,3] float 0..255, sign ∈ {-1,+1}) -> img."""
    enh = 0.1 + 1.8 * level           # enhance factor (arg_dict enhance)
    shear = 0.3 * level               # shear_level_to_args
    trans = 10.0 * level              # translate_const=10
    deg = 30.0 * level                # rotate_level_to_args
    solarize_thresh = 256.0 * level   # solarize_level_to_args
    posterize_bits = int(4 * level)   # posterize_level_to_args

    def identity(img, sign):
        return img

    def autocontrast(img, sign):
        lo = jnp.min(img, axis=(0, 1), keepdims=True)
        hi = jnp.max(img, axis=(0, 1), keepdims=True)
        scale = 255.0 / jnp.maximum(hi - lo, 1.0)
        return jnp.clip((img - lo) * scale, 0.0, 255.0)

    def equalize(img, sign):
        # PIL ImageOps.equalize (reference equalize_func): per channel,
        # step = (pixels - last nonzero bin) // 255; lut = running sum of
        # (step//2, hist[:-1]) // step
        def tune(ch):
            ch_i = jnp.clip(ch, 0, 255).astype(jnp.int32)
            hist = jnp.bincount(ch_i.reshape(-1), length=256).astype(jnp.int32)
            nz = hist > 0
            last_nz = jnp.argmax(jnp.where(nz, jnp.arange(256), -1))
            step = (hist.sum() - hist[last_nz]) // 255
            n = jnp.concatenate([jnp.asarray([step // 2]), hist[:-1]])
            table = jnp.clip(jnp.cumsum(n) // jnp.maximum(step, 1), 0, 255)
            return jnp.where(step == 0, ch, table[ch_i].astype(ch.dtype))

        return jnp.stack([tune(img[..., i]) for i in range(img.shape[-1])], axis=-1)

    def rotate(img, sign):
        # rotate about the center by sign*deg (PIL rotate; inverse map)
        h, w = img.shape[0], img.shape[1]
        th = jnp.deg2rad(sign * deg)
        cos, sin = jnp.cos(th), jnp.sin(th)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        # src = R(-th) @ (out - c) + c
        return _affine_sample(
            img, cos, sin, cx - cos * cx - sin * cy,
            -sin, cos, cy + sin * cx - cos * cy,
        )

    def solarize(img, sign):
        return jnp.where(img >= solarize_thresh, 255.0 - img, img)

    def color(img, sign):
        gray = jnp.mean(img, axis=-1, keepdims=True)
        return _blend(gray, img, enh)

    def contrast(img, sign):
        mean = jnp.mean(img, axis=(0, 1), keepdims=True)
        return _blend(mean, img, enh)

    def brightness(img, sign):
        return _blend(jnp.zeros_like(img), img, enh)

    def sharpness(img, sign):
        kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
        smoothed = jax.lax.conv_general_dilated(
            img[None].transpose(0, 3, 1, 2),
            jnp.tile(kernel[None, None], (img.shape[-1], 1, 1, 1)),
            (1, 1), "SAME", feature_group_count=img.shape[-1],
        ).transpose(0, 2, 3, 1)[0]
        return _blend(smoothed, img, enh)

    def shear_x(img, sign):
        return _affine_sample(img, 1.0, sign * shear, 0.0, 0.0, 1.0, 0.0)

    def shear_y(img, sign):
        return _affine_sample(img, 1.0, 0.0, 0.0, sign * shear, 1.0, 0.0)

    def translate_x(img, sign):
        return _affine_sample(img, 1.0, 0.0, sign * trans, 0.0, 1.0, 0.0)

    def translate_y(img, sign):
        return _affine_sample(img, 1.0, 0.0, 0.0, 0.0, 1.0, sign * trans)

    def posterize(img, sign):
        mask = (255 >> (8 - posterize_bits) << (8 - posterize_bits)) if posterize_bits > 0 else 0
        return (jnp.clip(img, 0, 255).astype(jnp.int32) & mask).astype(img.dtype)

    return [identity, autocontrast, equalize, rotate, solarize, color,
            contrast, brightness, sharpness, shear_x, shear_y,
            translate_x, translate_y, posterize]


def cutout(rng: Array, img: Array, pad_size: int) -> Array:
    """Reference cutout_func (available but not in the default aug list):
    a pad_size square at a uniform center replaced with the fill value."""
    h, w = img.shape[0], img.shape[1]
    k1, k2 = jax.random.split(rng)
    cy = jax.random.randint(k1, (), 0, h)
    cx = jax.random.randint(k2, (), 0, w)
    half = pad_size // 2
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = ((ys >= cy - half) & (ys < cy + half)
              & (xs >= cx - half) & (xs < cx + half))
    return jnp.where(inside[..., None], FILL, img)


def randaugment(rng: Array, img: Array, *, n: int = 2, m: int = 7) -> Array:
    """Apply n randomly-chosen ops from the full 14-op reference table at
    magnitude m (0..10); per-sample op selection via lax.switch."""
    ops = make_randaug_ops(m / 10.0)
    for _ in range(n):
        krng, srng, rng = jax.random.split(rng, 3)
        op_idx = jax.random.randint(krng, (), 0, len(ops))
        sign = jnp.where(jax.random.bernoulli(srng), 1.0, -1.0)
        img = jax.lax.switch(op_idx, ops, img, sign)
    return img


def preprocess_train(rng: Array, pixels_uint8: Array, out_res: int, *, scale=(0.5, 1.0),
                     hflip: bool = True, randaug: bool = True) -> Array:
    """[B,H,W,3] uint8 -> [B,out_res,out_res,3] normalized f32, all on device."""

    def one(rng, img):
        img = img.astype(jnp.float32)
        k1, k2, k3 = jax.random.split(rng, 3)
        img = random_resized_crop(k1, img, out_res, scale=scale)
        if hflip:
            img = random_hflip(k2, img)
        if randaug:
            img = randaugment(k3, img)
        return (img / 255.0 - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)

    rngs = jax.random.split(rng, pixels_uint8.shape[0])
    return jax.vmap(one)(rngs, pixels_uint8)


def preprocess_eval(pixels_uint8: Array, out_res: int) -> Array:
    imgs = pixels_uint8.astype(jnp.float32)
    imgs = jax.vmap(lambda im: _resize(im, (out_res, out_res)))(imgs)
    return (imgs / 255.0 - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
