"""Host-side image transforms (PIL + numpy) with CLIP normalization.

Mirrors the reference torchvision stacks (dataset/__init__.py:19-61):
pretrain = RandomResizedCrop(scale 0.2-1.0, bicubic) + HFlip + RandAugment
(2,7); train = same with scale 0.5-1.0; test = Resize bicubic.

Output layout is NHWC float32 (TPU-native; the reference emits NCHW) —
normalization can also run on-device (`normalize_in_graph`) so only uint8
pixels cross the host->device boundary at 1/4 the bytes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from .randaugment import RandomAugment

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8/float HWC [0,255] -> normalized float32 HWC."""
    x = np.asarray(img, np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def normalize_in_graph(pixels):
    """Same normalization as an on-device op (uint8 NHWC -> f32 NHWC)."""
    import jax.numpy as jnp

    x = pixels.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def random_resized_crop(
    rng: np.random.Generator,
    img: Image.Image,
    size: int,
    *,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Image.Image:
    """torchvision RandomResizedCrop semantics, bicubic."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            return img.resize((size, size), Image.BICUBIC, box=(x0, y0, x0 + cw, y0 + ch))
    # fallback: center crop
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x0, y0 = (w - cw) // 2, (h - ch) // 2
    return img.resize((size, size), Image.BICUBIC, box=(x0, y0, x0 + cw, y0 + ch))


class ImageTransform:
    """Composable transform pipeline matching the reference presets."""

    def __init__(
        self,
        image_res: int,
        *,
        mode: str = "train",
        scale: Optional[Tuple[float, float]] = None,
        hflip: bool = True,
        randaug: bool = True,
        randaug_ops: Optional[list] = None,
        seed: Optional[int] = None,
        native_decode: bool = False,
    ):
        self.image_res = image_res
        self.mode = mode
        self.native_decode = native_decode
        self.hflip = hflip
        self.scale = scale or ((0.2, 1.0) if mode == "pretrain" else (0.5, 1.0))
        self.rng = np.random.default_rng(seed)
        self.randaug = None
        if randaug and mode != "test":
            self.randaug = RandomAugment(2, 7, augs=randaug_ops, rng=self.rng)

    @classmethod
    def pretrain(cls, image_res: int, seed=None):
        return cls(image_res, mode="pretrain", seed=seed)

    @classmethod
    def train(cls, image_res: int, seed=None):
        return cls(image_res, mode="train", seed=seed)

    @classmethod
    def train_wohflip(cls, image_res: int, seed=None):
        return cls(image_res, mode="train", hflip=False, seed=seed)

    @classmethod
    def box(cls, image_res: int, seed=None):
        """No geometry (bbox-safe): RandAugment color ops only."""
        return cls(
            image_res, mode="box", hflip=False, seed=seed,
            randaug_ops=["Identity", "AutoContrast", "Equalize", "Brightness", "Sharpness"],
        )

    @classmethod
    def test(cls, image_res: int, native_decode: bool = False):
        """Eval protocol transform. Default is the exact reference protocol
        (full PIL decode + BICUBIC resize); `native_decode=True` opts into
        the 2-4x-faster libjpeg DCT-scaled decode + bilinear finish, which
        is a documented approximation (mean pixel diff ~1e-2 normalized) —
        config key `native_eval_decode` in the drivers."""
        return cls(image_res, mode="test", hflip=False, randaug=False,
                   native_decode=native_decode)

    @classmethod
    def uint8(cls, image_res: int, margin: float = 1.15):
        """Device-preprocess mode: host does decode + resize to a slightly
        larger fixed size ONLY; crop/flip/RandAugment/normalize run in-graph
        (data/device_pipeline.preprocess_train). Output uint8 — 4x less
        host->device traffic than f32 (BASELINE north star)."""
        return cls(int(image_res * margin), mode="uint8", hflip=False, randaug=False)

    @property
    def native_decode_size(self) -> Optional[int]:
        """Square decode target for modes whose first op is a plain
        (aspect-distorting) Resize((res, res)). uint8 device-preprocess
        always qualifies (train augmentation follows in-graph, the
        approximation washes out); test mode only when explicitly opted in
        (`native_decode=True`) — eval metrics default to the exact PIL
        BICUBIC protocol. Crop-based train modes return None: they need
        the full-resolution source for RandomResizedCrop statistics."""
        if self.mode == "uint8" or (self.mode == "test" and self.native_decode):
            return self.image_res
        return None

    def from_decoded(self, arr: np.ndarray) -> np.ndarray:
        """Finish the pipeline on an already decoded+resized uint8 HWC
        array (the native JPEG path, data/fastjpeg.py)."""
        if self.mode == "uint8":
            return np.asarray(arr, np.uint8)
        return normalize(arr)  # test mode: no randaug/flip

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = img.convert("RGB")
        if self.mode == "uint8":
            img = img.resize((self.image_res, self.image_res), Image.BICUBIC)
            return np.asarray(img, np.uint8)
        if self.mode == "test":
            img = img.resize((self.image_res, self.image_res), Image.BICUBIC)
        elif self.mode == "box":
            pass  # caller already cropped; keep geometry
        else:
            img = random_resized_crop(self.rng, img, self.image_res, scale=self.scale)
            if self.hflip and self.rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if self.randaug is not None:
            img = self.randaug(img)
        return normalize(img)
