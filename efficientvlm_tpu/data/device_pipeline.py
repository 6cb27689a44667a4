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


# -- RandAugment subset (color ops; geometry handled by the crop) -----------


def _blend(a: Array, b: Array, factor: Array) -> Array:
    return jnp.clip(a + (b - a) * factor, 0.0, 255.0)


def op_identity(img: Array, _: Array) -> Array:
    return img


def op_brightness(img: Array, v: Array) -> Array:
    return _blend(jnp.zeros_like(img), img, v)


def op_contrast(img: Array, v: Array) -> Array:
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    return _blend(mean, img, v)


def op_color(img: Array, v: Array) -> Array:
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return _blend(gray, img, v)


def op_autocontrast(img: Array, _: Array) -> Array:
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    return jnp.clip((img - lo) * scale, 0.0, 255.0)


def op_sharpness(img: Array, v: Array) -> Array:
    kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.tile(kernel[None, None], (img.shape[-1], 1, 1, 1)),
        (1, 1), "SAME", feature_group_count=img.shape[-1],
    ).transpose(0, 2, 3, 1)[0]
    return _blend(smoothed, img, v)


def op_solarize(img: Array, v: Array) -> Array:
    thresh = 256.0 - v * 128.0
    return jnp.where(img >= thresh, 255.0 - img, img)


RANDAUG_OPS = [op_identity, op_autocontrast, op_brightness, op_sharpness, op_contrast, op_color, op_solarize]


def randaugment(rng: Array, img: Array, *, n: int = 2, m: int = 7) -> Array:
    """Apply n randomly-chosen color ops at magnitude m (0..10)."""
    level = m / 10.0
    for i in range(n):
        krng, vrng, rng = jax.random.split(rng, 3)
        op_idx = jax.random.randint(krng, (), 0, len(RANDAUG_OPS))
        sign = jnp.where(jax.random.bernoulli(vrng), 1.0, -1.0)
        v = 1.0 + sign * 0.9 * level  # enhancement factor in [0.1, 1.9]
        img = jax.lax.switch(op_idx, RANDAUG_OPS, img, v)
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
