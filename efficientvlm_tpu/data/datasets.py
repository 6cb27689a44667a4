"""Task datasets + loaders (host side, numpy out, NHWC).

Mirrors the reference dataset layer (dataset/*.py) over PIL/numpy with no
torch dependency. Fine-tune datasets return raw strings (drivers tokenize,
as in the reference); pretrain streams tokenize+mask inline.
"""

from __future__ import annotations

import base64
import io
import json
import math
import os
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageFile

from .jsonl import ShardedJsonlDataset
from .masking import TextMaskingGenerator
from .transforms import ImageTransform
from .utils import pre_caption, pre_question

ImageFile.LOAD_TRUNCATED_IMAGES = True
Image.MAX_IMAGE_PIXELS = None


def open_image(ann_value: str, *, is_path: bool, image_root: str = "") -> Image.Image:
    if is_path:
        return Image.open(os.path.join(image_root, ann_value)).convert("RGB")
    return Image.open(io.BytesIO(base64.b64decode(ann_value))).convert("RGB")



def load_transformed(transform, ann_value: str, *, is_path: bool, image_root: str = ""):
    """Decode + transform in one step. When the transform's first PIL op is
    a plain square Resize (test / uint8 device-preprocess modes), JPEGs take
    the native libjpeg DCT-scaled decode (data/fastjpeg.py, csrc/) —
    2-4x faster per core and GIL-free; everything else falls back to the
    PIL path unchanged."""
    size = getattr(transform, "native_decode_size", None)
    if size:
        try:
            if is_path:
                with open(os.path.join(image_root, ann_value), "rb") as f:
                    data = f.read()
            else:
                data = base64.b64decode(ann_value)
            if data[:2] == b"\xff\xd8":  # JPEG magic
                from .fastjpeg import decode_resize

                return transform.from_decoded(decode_resize(data, size, size))
        except Exception:
            pass  # corrupt/odd file: the PIL path raises the real error
    return transform(open_image(ann_value, is_path=is_path, image_root=image_root))


def load_ann(ann_file) -> List[dict]:
    files = ann_file if isinstance(ann_file, (list, tuple)) else [ann_file]
    ann: List[dict] = []
    for f in files:
        ann += json.load(open(f))
    return ann


class SimpleLoader:
    """Minimal batched loader over a map-style dataset: per-epoch shuffle,
    rank sharding (DistributedSampler semantics, dataset/__init__.py:171-176),
    numpy default collate."""

    def __init__(
        self,
        dataset,
        *,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        rank: int = 0,
        world_size: int = 1,
        seed: int = 42,
        collate_fn: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.epoch = 0
        self.collate_fn = collate_fn or default_collate

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        if self.world_size > 1:
            # pad to make divisible, then take every world_size-th
            total = int(math.ceil(n / self.world_size)) * self.world_size
            idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.rank :: self.world_size]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else int(math.ceil(n / self.batch_size))

    def __iter__(self) -> Iterator:
        idx = self._indices()
        end = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        for i in range(0, end, self.batch_size):
            samples = [self.dataset[int(j)] for j in idx[i : i + self.batch_size]]
            yield self.collate_fn(samples)


def default_collate(samples: Sequence):
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(default_collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (int, np.integer)):
        return np.asarray(samples, np.int64)
    if isinstance(first, (float, np.floating)):
        return np.asarray(samples, np.float32)
    return list(samples)


# ---------------------------------------------------------------------------
# Retrieval (dataset/retrieval_dataset.py)
# ---------------------------------------------------------------------------


class RetrievalTrainDataset:
    def __init__(self, ann_file, transform: ImageTransform, image_root: str, max_words: int = 30):
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.max_words = max_words
        self.img_ids: Dict = {}
        n = 0
        for ann in self.ann:
            if ann["image_id"] not in self.img_ids:
                self.img_ids[ann["image_id"]] = n
                n += 1

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        ann = self.ann[index]
        return (
            load_transformed(self.transform, ann["image"], is_path=True,
                             image_root=self.image_root),
            pre_caption(ann["caption"], self.max_words),
            self.img_ids[ann["image_id"]],
        )


class RetrievalEvalDataset:
    def __init__(self, ann_file, transform: ImageTransform, image_root: str, max_words: int = 30):
        self.ann = json.load(open(ann_file))
        self.transform = transform
        self.image_root = image_root
        self.text: List[str] = []
        self.image: List[str] = []
        self.txt2img: Dict[int, int] = {}
        self.img2txt: Dict[int, List[int]] = {}
        txt_id = 0
        for img_id, ann in enumerate(self.ann):
            self.image.append(ann["image"])
            self.img2txt[img_id] = []
            for caption in ann["caption"]:
                self.text.append(pre_caption(caption, max_words))
                self.img2txt[img_id].append(txt_id)
                self.txt2img[txt_id] = img_id
                txt_id += 1

    def __len__(self):
        return len(self.image)

    def __getitem__(self, index):
        return load_transformed(
            self.transform, self.ann[index]["image"], is_path=True,
            image_root=self.image_root), index


# ---------------------------------------------------------------------------
# VQA (dataset/vqa_dataset.py)
# ---------------------------------------------------------------------------


class VQADataset:
    def __init__(
        self, ann_file, transform: ImageTransform, vqa_root: str, vg_root: str = "",
        split: str = "train", max_ques_words: int = 30, answer_list: str = "",
        eos_token: str = "[SEP]", seed: Optional[int] = None,
    ):
        self.split = split
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.vqa_root = vqa_root
        self.vg_root = vg_root
        self.max_ques_words = 50 if split == "test" else max_ques_words
        self.eos_token = eos_token
        self.careful_hflip = True
        self.rng = np.random.default_rng(seed)
        if split == "test" and answer_list:
            self.answer_list = json.load(open(answer_list))

    def __len__(self):
        return len(self.ann)

    def _image_path(self, ann):
        d = ann.get("dataset", "vqa")
        root = {"vqa": self.vqa_root, "vg": self.vg_root, "gqa": ""}[d]
        return os.path.join(root, ann["image"]) if root else ann["image"]

    @staticmethod
    def _left_or_right_in(question, answer):
        def f(s):
            return "left" in s or "right" in s

        if f(question):
            return True
        answers = answer if isinstance(answer, list) else [answer]
        return any(f(a) for a in answers)

    def __getitem__(self, index):
        ann = self.ann[index]
        image = Image.open(self._image_path(ann)).convert("RGB")
        if self.split != "test" and self.rng.random() < 0.5:
            if not (self.careful_hflip and self._left_or_right_in(ann["question"], ann.get("answer", ""))):
                image = image.transpose(Image.FLIP_LEFT_RIGHT)
        pixels = self.transform(image)
        if self.split == "test":
            return pixels, pre_question(ann["question"], self.max_ques_words), ann["question_id"]

        question = pre_question(ann["question"], self.max_ques_words)
        if ann.get("dataset") == "vg":
            answers, weights = [ann["answer"]], [0.5]
        else:
            answer_weight: Dict[str, float] = {}
            for a in ann["answer"]:
                answer_weight[a] = answer_weight.get(a, 0) + 1 / len(ann["answer"])
            answers = list(answer_weight.keys())
            weights = list(answer_weight.values())
        answers = [a + self.eos_token for a in answers]
        return pixels, question, answers, weights


def vqa_collate(samples, *, pad_multiple: int = 8, n_shards: int = 1):
    """Flattens per-question answer lists; returns the static-shape gather
    index `k_index` mapping each answer row to its question (replacing the
    reference's per-question replication loop, dataset/__init__.py:160-168).

    The flattened answer count is padded up to a multiple of `pad_multiple`
    with zero-weight copies of the first answer, so jitted train steps see
    a small fixed set of shapes instead of recompiling per batch.

    With n_shards > 1 (data-parallel training) questions are split into
    n_shards contiguous groups, each group's answers flattened and padded to
    a COMMON per-shard length, and k_index made LOCAL to the group — so
    sharding every array on the leading axis gives each device a
    self-consistent (questions, answers, k_index) block."""
    images, questions, answer_lists, weight_lists = zip(*samples)
    if n_shards <= 1:
        answers, weights, k_index = [], [], []
        for qi, (ans, ws) in enumerate(zip(answer_lists, weight_lists)):
            answers += ans
            weights += ws
            k_index += [qi] * len(ans)
        if pad_multiple > 1:
            pad = (-len(answers)) % pad_multiple
            answers += [answers[0]] * pad
            weights += [0.0] * pad
            k_index += [0] * pad
        return (
            np.stack(images),
            list(questions),
            list(answers),
            np.asarray(weights, np.float32),
            np.asarray(k_index, np.int64),
        )
    assert len(samples) % n_shards == 0, (len(samples), n_shards)
    per = len(samples) // n_shards
    groups = []
    for s in range(n_shards):
        ans_s, w_s, k_s = [], [], []
        for qi in range(per):
            ans = answer_lists[s * per + qi]
            ws = weight_lists[s * per + qi]
            ans_s += ans
            w_s += ws
            k_s += [qi] * len(ans)
        groups.append((ans_s, w_s, k_s))
    shard_len = max(len(g[0]) for g in groups)
    if pad_multiple > 1:
        shard_len += (-shard_len) % pad_multiple
    answers, weights, k_index = [], [], []
    for ans_s, w_s, k_s in groups:
        pad = shard_len - len(ans_s)
        answers += ans_s + [ans_s[0]] * pad
        weights += w_s + [0.0] * pad
        k_index += k_s + [0] * pad
    return (
        np.stack(images),
        list(questions),
        list(answers),
        np.asarray(weights, np.float32),
        np.asarray(k_index, np.int64),
    )


# ---------------------------------------------------------------------------
# NLVR2 (dataset/nlvr_dataset.py)
# ---------------------------------------------------------------------------


class NLVRDataset:
    def __init__(self, ann_file, transform: ImageTransform, image_root: str, max_words: int = 30):
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.max_words = max_words

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        ann = self.ann[index]
        image0 = load_transformed(self.transform, ann["images"][0], is_path=True,
                                  image_root=self.image_root)
        image1 = load_transformed(self.transform, ann["images"][1], is_path=True,
                                  image_root=self.image_root)
        label = 1 if ann["label"] == "True" or ann["label"] is True else 0
        sentence = pre_caption(ann["sentence"], self.max_words)
        return image0, image1, sentence, label


# ---------------------------------------------------------------------------
# Captioning (dataset/captioning_dataset.py)
# ---------------------------------------------------------------------------


class CaptioningTrainDataset:
    def __init__(self, ann_file, transform: ImageTransform, image_root: str,
                 prompt: str = "a picture of ", max_words: int = 30):
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.prompt = prompt
        self.max_words = max_words
        self.img_ids: Dict = {}
        n = 0
        for ann in self.ann:
            if ann["image_id"] not in self.img_ids:
                self.img_ids[ann["image_id"]] = n
                n += 1

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        ann = self.ann[index]
        pixels = load_transformed(self.transform, ann["image"], is_path=True,
                                  image_root=self.image_root)
        caption = self.prompt + pre_caption(ann["caption"], self.max_words)
        return pixels, caption, self.img_ids[ann["image_id"]]


class CaptioningSCSTDataset:
    """SCST train set (reference coco_karpathy_train_scst,
    dataset/captioning_dataset.py:63-110): one row per annotation, but the
    target is n_gts ground-truth captions sampled from the image's full
    caption map (no prompt prefix — rewards compare raw captions)."""

    def __init__(self, ann_file, transform: ImageTransform, image_root: str,
                 max_words: int = 30, n_gts: int = 5, seed: int = 42):
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.max_words = max_words
        self.n_gts = n_gts
        self.rng = np.random.default_rng(seed)
        self.captions_by_image: Dict = {}
        for ann in self.ann:
            self.captions_by_image.setdefault(ann["image"], []).append(
                pre_caption(ann["caption"], max_words))

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        ann = self.ann[index]
        pixels = load_transformed(self.transform, ann["image"], is_path=True,
                                  image_root=self.image_root)
        gts = self.captions_by_image[ann["image"]]
        if len(gts) >= self.n_gts:
            pick = self.rng.choice(len(gts), self.n_gts, replace=False)
        else:
            pick = self.rng.choice(len(gts), self.n_gts, replace=True)
        return pixels, [gts[i] for i in pick]


def scst_collate(samples):
    images, gt_lists = zip(*samples)
    return np.stack(images), list(gt_lists)


class CaptioningEvalDataset:
    def __init__(self, ann_file, transform: ImageTransform, image_root: str):
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        ann = self.ann[index]
        img_id = ann["image"].split("/")[-1].strip(".jpg").split("_")[-1]
        return load_transformed(self.transform, ann["image"], is_path=True,
                                image_root=self.image_root), int(img_id)


# ---------------------------------------------------------------------------
# Grounding (dataset/grounding_dataset.py, vestigial parity)
# ---------------------------------------------------------------------------


class GroundingDataset:
    """Weakly-supervised grounding pairs (reference grounding_dataset,
    dataset/grounding_dataset.py:17-54): train mode yields a DENSE per-image
    index (same image -> same idx, the ITC idx-aware soft-label key);
    eval mode yields the ref_id for grounding_eval_mask."""

    def __init__(self, ann_file, transform: ImageTransform, image_root: str,
                 max_words: int = 30, mode: str = "train"):
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.max_words = max_words
        self.mode = mode
        if mode == "train":
            self.img_ids = {}
            for ann in self.ann:
                img_id = ann["image"].split("/")[-1]
                if img_id not in self.img_ids:
                    self.img_ids[img_id] = len(self.img_ids)

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        ann = self.ann[index]
        image = open_image(ann["image"], is_path=True, image_root=self.image_root)
        caption = pre_caption(ann["text"], self.max_words)
        if self.mode == "train":
            return (self.transform(image), caption,
                    self.img_ids[ann["image"].split("/")[-1]])
        return self.transform(image), caption, ann["ref_id"]


class GroundingBboxDataset:
    """Bbox-supervised grounding (reference grounding_dataset_bbox,
    dataset/grounding_dataset.py:56-147) with CALLER-SUPPLIED boxes: each
    annotation carries {'image','text','bbox':[x,y,w,h] pixels,'ref_id'}
    instead of going through the REFER api. Train mode random-crops around
    the box, careful-hflips (skip when the caption mentions left/right),
    and emits cxcywh targets normalized to image_res."""

    def __init__(self, ann_file, transform: ImageTransform, image_root: str,
                 image_res: int = 384, max_words: int = 30, mode: str = "train",
                 careful_hflip: bool = True, seed: int = 42):
        self.ann = load_ann(ann_file)
        self.transform = transform
        self.image_root = image_root
        self.image_res = image_res
        self.max_words = max_words
        self.mode = mode
        self.careful_hflip = careful_hflip
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        import math

        ann = self.ann[index]
        image = open_image(ann["image"], is_path=True, image_root=self.image_root)
        caption = pre_caption(ann["text"], self.max_words)
        if self.mode != "train":
            W, H = image.size
            return self.transform(image), caption, ann["ref_id"], W, H

        W, H = image.size
        x, y, w, h = (float(v) for v in ann["bbox"])
        rng = self.rng
        x0 = int(rng.integers(0, max(1, math.floor(x) + 1)))
        y0 = int(rng.integers(0, max(1, math.floor(y) + 1)))
        x1 = int(rng.integers(min(math.ceil(x + w), W), W + 1))
        y1 = int(rng.integers(min(math.ceil(y + h), H), H + 1))
        image = image.crop((x0, y0, x1, y1))
        W, H = image.size
        do_hflip = False
        if rng.random() < 0.5 and not (
            self.careful_hflip and ("left" in caption or "right" in caption)
        ):
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
            do_hflip = True
        image = image.resize((self.image_res, self.image_res), Image.BICUBIC)
        pixels = self.transform(image)
        x, y = x - x0, y - y0
        if do_hflip:
            x = (W - x) - w
        sx, sy = self.image_res / W, self.image_res / H
        x, w, y, h = x * sx, w * sx, y * sy, h * sy
        target = np.asarray([
            (x + w / 2) / self.image_res, (y + h / 2) / self.image_res,
            w / self.image_res, h / self.image_res,
        ], np.float32)
        return pixels, caption, target


# ---------------------------------------------------------------------------
# Pretrain streams (dataset/pretrain_dataset.py)
# ---------------------------------------------------------------------------


class PretrainImageTextDataset:
    """Image-text JSONL stream with inline tokenize + MLM masking
    (ImageTextJsonDataset, pretrain_dataset.py:140-281). Yields fixed-length
    numpy samples; broken records skipped."""

    def __init__(
        self, config, data_path, tokenizer, *, rank: int = 0, world_size: int = 1,
        shuffle: bool = True, repeat: bool = True, transform: Optional[ImageTransform] = None,
        seed: int = 42,
    ):
        images_cfg = config["images"]
        self.image_key = images_cfg.get("image_key", "binary")
        self.is_image_rpath = images_cfg.get("is_image_rpath", False)
        self.caption_key = images_cfg.get("caption_key", "caption")
        self.batch_size = images_cfg.get("batch_size", 128)
        self.tokenizer = tokenizer
        self.max_tokens = config.get("max_tokens", 40)
        self.max_words = config.get("max_words", 40)
        self.max_masks = config.get("max_masks", 8)
        self.transform = transform or ImageTransform.pretrain(config.get("image_res", 224), seed=seed)
        self.stream = ShardedJsonlDataset(
            data_path, rank=rank, world_size=world_size, shuffle=shuffle,
            repeat=repeat, seed=seed,
        )
        self.mask_generator = TextMaskingGenerator(
            tokenizer, config.get("mask_prob", 0.25), self.max_masks,
            config.get("skipgram_prb", 0.2), config.get("skipgram_size", 3),
            config.get("mask_whole_word", True), seed=seed,
        )
        self.cls_token = tokenizer.cls_token
        self.rng = np.random.default_rng(seed)

    def preprocess_text(self, text: str):
        """tokenize + mask + pad (pretrain_dataset.py:233-269 semantics)."""
        tok = self.tokenizer
        tokens = [self.cls_token] + tok.tokenize(pre_caption(text, self.max_words))
        tokens = tokens[: self.max_tokens]
        tokens_masked, masked_pos = self.mask_generator(list(tokens))
        text_ids = tok.convert_tokens_to_ids(tokens)
        text_ids_masked = tok.convert_tokens_to_ids(tokens_masked)
        masked_ids = [text_ids[p] for p in masked_pos]

        pad = tok.pad_token_id
        n = len(text_ids)
        text_atts = [1] * n + [0] * (self.max_tokens - n)
        text_ids = text_ids + [pad] * (self.max_tokens - n)
        text_ids_masked = text_ids_masked + [pad] * (self.max_tokens - n)
        mp = list(masked_pos)[: self.max_masks]
        mi = list(masked_ids)[: self.max_masks]
        n_mask = len(mp)
        mp = mp + [0] * (self.max_masks - n_mask)
        mi = mi + [-100] * (self.max_masks - n_mask)
        return (
            np.asarray(text_ids, np.int32),
            np.asarray(text_atts, np.int32),
            np.asarray(text_ids_masked, np.int32),
            np.asarray(mp, np.int32),
            np.asarray(mi, np.int32),
        )

    def __iter__(self):
        for ann in self.stream:
            try:
                # uint8/test transforms take the native JPEG decode
                # (device_preprocess GD configs); others the PIL path
                pixels = load_transformed(
                    self.transform, ann[self.image_key], is_path=self.is_image_rpath)
                caption = ann[self.caption_key]
                if isinstance(caption, list):
                    caption = caption[int(self.rng.integers(0, len(caption)))]
                yield (pixels,) + self.preprocess_text(caption)
            except Exception as e:
                print(f"### encounter broken data: {e}")

    def batches(self):
        buf: List = []
        for sample in self:
            buf.append(sample)
            if len(buf) == self.batch_size:
                cols = list(zip(*buf))
                yield {
                    "image": np.stack(cols[0]),
                    "text_ids": np.stack(cols[1]),
                    "text_atts": np.stack(cols[2]),
                    "text_ids_masked": np.stack(cols[3]),
                    "masked_pos": np.stack(cols[4]),
                    "masked_ids": np.stack(cols[5]),
                }
                buf = []


class RegionTextDataset(PretrainImageTextDataset):
    """Region/bbox stream (RegionTextJsonDataset, pretrain_dataset.py:284-526):
    random crop containing a sampled element, per-region patch-level
    image_atts ([CLS] always on), cxcywh targets; grouped batches flattened
    with idx_to_group_img and pad-by-resample to a fixed batch size."""

    def __init__(self, config, data_path, tokenizer, **kw):
        super().__init__(config, data_path, tokenizer, **kw)
        regions_cfg = config["regions"]
        self.image_key = regions_cfg.get("image_key", "binary")
        self.is_image_rpath = regions_cfg.get("is_image_rpath", False)
        self.batch_size = regions_cfg.get("batch_size", 128)
        self.max_regions = regions_cfg.get("max_regions", 5)
        self.min_perc_in_image = regions_cfg.get("min_perc_in_image", 0.5)
        self.careful_hflip = regions_cfg.get("careful_hflip", False)
        self.image_res = config.get("image_res", 224)
        self.patch_size = config.get("patch_size", 16)
        self.num_patch = self.image_res // self.patch_size
        self.transform = ImageTransform.box(self.image_res, seed=kw.get("seed", 42))

    def get_image_attns(self, x, y, w, h) -> np.ndarray:
        ps, npch = self.patch_size, self.num_patch
        x_min = min(math.floor(x / ps), npch - 1)
        x_max = max(x_min + 1, min(math.ceil((x + w) / ps), npch))
        y_min = min(math.floor(y / ps), npch - 1)
        y_max = max(y_min + 1, min(math.ceil((y + h) / ps), npch))
        atts = np.zeros(1 + npch * npch, np.int32)
        atts[0] = 1
        for j in range(x_min, x_max):
            for i in range(y_min, y_max):
                atts[npch * i + j + 1] = 1
        return atts

    def __iter__(self):
        rng = self.rng
        for ann in self.stream:
            try:
                image = open_image(ann[self.image_key], is_path=self.is_image_rpath)
                W, H = image.size
                elem = ann["elems"][int(rng.integers(0, len(ann["elems"])))]
                x, y, w, h = (int(v) for v in elem["bb"])
                assert x >= 0 and y >= 0 and x + w <= W and y + h <= H and w > 0 and h > 0

                x0 = int(rng.integers(0, max(1, math.floor(x) + 1)))
                y0 = int(rng.integers(0, max(1, math.floor(y) + 1)))
                x1 = int(rng.integers(min(math.ceil(x + w), W), W + 1))
                y1 = int(rng.integers(min(math.ceil(y + h), H), H + 1))
                image = image.crop((x0, y0, x1, y1))
                W, H = image.size
                image = image.resize((self.image_res, self.image_res), Image.BICUBIC)
                pixels = self.transform(image)
                sx, sy = self.image_res / W, self.image_res / H

                samples = []
                # whole-image caption first (pretrain_dataset.py:396-414)
                if "caption" in ann:
                    cap = ann["caption"]
                    cap = cap[int(rng.integers(0, len(cap)))] if isinstance(cap, list) else cap
                    t = self.preprocess_text(cap)
                    atts = np.ones(1 + self.num_patch**2, np.int32)
                    bbox = np.asarray([0.5, 0.5, 1.0, 1.0], np.float32)
                    samples.append(t + (atts, bbox, 1))
                n_elems = self.max_regions - len(samples)
                for elem in ann["elems"][:n_elems]:
                    ex, ey, ew, eh = (float(v) for v in elem["bb"])
                    # portion inside the crop
                    ix0, iy0 = max(ex, x0), max(ey, y0)
                    ix1, iy1 = min(ex + ew, x1), min(ey + eh, y1)
                    if ix1 <= ix0 or iy1 <= iy0:
                        continue
                    if (ix1 - ix0) * (iy1 - iy0) / (ew * eh) < self.min_perc_in_image:
                        continue
                    rx, ry = (ix0 - x0) * sx, (iy0 - y0) * sy
                    rw, rh = (ix1 - ix0) * sx, (iy1 - iy0) * sy
                    cap = elem["caption"]
                    cap = cap[int(rng.integers(0, len(cap)))] if isinstance(cap, list) else cap
                    if "attributes" in elem:
                        cap = elem["attributes"] + " " + cap
                    t = self.preprocess_text(cap)
                    atts = self.get_image_attns(rx, ry, rw, rh)
                    bbox = np.asarray(
                        [(rx + rw / 2) / self.image_res, (ry + rh / 2) / self.image_res,
                         rw / self.image_res, rh / self.image_res], np.float32)
                    samples.append(t + (atts, bbox, 0))
                if samples:
                    yield pixels, samples
            except Exception as e:
                print(f"### encounter broken data: {e}")

    def batches(self, max_images: int = 48, n_shards: int = 1):
        """Grouped fixed-size batches with idx_to_group_img
        (collate_fn, pretrain_dataset.py:478-526).

        With n_shards > 1 (data-parallel training) the batch is built as
        n_shards independent sub-blocks concatenated along axis 0 — each
        block's idx_to_group_img indexes its OWN image block — so sharding
        every array on the leading axis hands each device a self-consistent
        grouped sub-batch."""
        assert max_images % n_shards == 0 and self.batch_size % n_shards == 0, (
            max_images, self.batch_size, n_shards)
        imgs_per_shard = max_images // n_shards
        texts_per_shard = self.batch_size // n_shards
        rng = self.rng
        blocks: List[dict] = []
        images: List = []
        flat: List = []
        group: List[int] = []
        for pixels, samples in self:
            img_idx = len(images)
            images.append(pixels)
            for s in samples:
                flat.append(s)
                group.append(img_idx)
            if len(images) >= imgs_per_shard:
                n = len(flat)
                if n >= texts_per_shard:
                    keep = rng.choice(n, texts_per_shard, replace=False)
                else:
                    keep = np.concatenate([
                        np.arange(n), rng.choice(n, texts_per_shard - n, replace=True)
                    ])
                cols = list(zip(*[flat[i] for i in keep]))
                blocks.append({
                    "image": np.stack(images),
                    "idx_to_group_img": np.asarray([group[i] for i in keep], np.int32),
                    "text_ids": np.stack(cols[0]),
                    "text_atts": np.stack(cols[1]),
                    "text_ids_masked": np.stack(cols[2]),
                    "masked_pos": np.stack(cols[3]),
                    "masked_ids": np.stack(cols[4]),
                    "image_atts": np.stack(cols[5]),
                    "target_bbox": np.stack(cols[6]),
                    "is_image": np.asarray(cols[7], np.int32),
                })
                images, flat, group = [], [], []
                if len(blocks) == n_shards:
                    yield {
                        k: np.concatenate([b[k] for b in blocks], axis=0)
                        for k in blocks[0]
                    }
                    blocks = []
