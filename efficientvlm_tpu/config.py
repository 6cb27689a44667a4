"""Config system: YAML task configs + JSON tower configs with CLI overrides.

Mirrors the reference's three-tier config (argparse CLI / ruamel-yaml task
configs / JSON vision configs + HF BertConfig JSON) — see reference
Eff_Retrieval.py:388-403, run.py:201-241, utils/__init__.py:317-320
(AttrDict) — over a single typed `Config` mapping with attribute access.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

import yaml


class Config(dict):
    """dict with attribute access (reference AttrDict, utils/__init__.py:317)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Mapping) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    @classmethod
    def from_dict(cls, d: Mapping) -> "Config":
        return cls._wrap(dict(d))

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def load_yaml(path: str) -> Config:
    with open(path) as f:
        return Config.from_dict(yaml.safe_load(f))


def load_json(path: str) -> Config:
    with open(path) as f:
        return Config.from_dict(json.load(f))


def read_json(path: str) -> Config:
    """Parity alias for reference utils.read_json (utils/__init__.py:416)."""
    return load_json(path)


# ---------------------------------------------------------------------------
# Model configs (typed views over the YAML/JSON keys the reference uses)
# ---------------------------------------------------------------------------


class VisionConfig(Config):
    """Keys of configs/config_clipvit*.json (reference)."""

    DEFAULTS = dict(
        vision_width=768,
        patch_size=16,
        hidden_act="quick_gelu",
        num_attention_heads=12,
        attention_dropout=0.0,
        intermediate_size=3072,
        num_hidden_layers=12,
        local_attn_depth=0,
        image_res=224,
    )

    @classmethod
    def create(cls, **kw) -> "VisionConfig":
        cfg = dict(cls.DEFAULTS)
        cfg.update(kw)
        return cls(cfg)

    @property
    def num_patches(self) -> int:
        return (self["image_res"] // self["patch_size"]) ** 2


class TextConfig(Config):
    """BERT-base config keys + X-VLM fusion_layer / encoder_width.

    fusion_layer = num_hidden_layers // 2 (reference models/xvlm.py:200);
    cross-attention K/V width = encoder_width (vision width), reference
    xbert.py:235-240.
    """

    DEFAULTS = dict(
        vocab_size=30522,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        hidden_act="gelu",
        hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1,
        max_position_embeddings=512,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        pad_token_id=0,
        encoder_width=768,
        fusion_layer=6,
    )

    @classmethod
    def create(cls, **kw) -> "TextConfig":
        cfg = dict(cls.DEFAULTS)
        cfg.update(kw)
        if "fusion_layer" not in kw:
            cfg["fusion_layer"] = cfg["num_hidden_layers"] // 2
        return cls(cfg)

    @classmethod
    def from_bert_json(cls, path: str, **overrides) -> "TextConfig":
        raw = load_json(path)
        keep = {k: raw[k] for k in cls.DEFAULTS if k in raw}
        keep.update(overrides)
        return cls.create(**keep)


def load_task_config(yaml_path: str, repo_root: str | None = None) -> Config:
    """Load a task YAML and resolve its vision/text sub-configs.

    Mirrors how drivers combine configs (reference Eff_Retrieval.py:388-403):
    the YAML points at a vision_config JSON and a text_encoder dir containing
    an HF config.json.
    """
    cfg = load_yaml(yaml_path)
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(yaml_path)))

    if "vision_config" in cfg:
        vpath = cfg["vision_config"]
        if not os.path.isabs(vpath):
            vpath = os.path.join(root, vpath)
        if os.path.exists(vpath):
            vision = load_json(vpath)
            cfg["vision"] = VisionConfig.create(
                image_res=cfg.get("image_res", 224), **vision
            )

    text_layers = cfg.get("text_num_hidden_layers", 12)
    text_kw = dict(num_hidden_layers=text_layers)
    if "vision" in cfg:
        text_kw["encoder_width"] = cfg["vision"]["vision_width"]
    text_cfg_path = cfg.get("text_config")
    if text_cfg_path and os.path.exists(os.path.join(root, text_cfg_path)):
        cfg["text"] = TextConfig.from_bert_json(
            os.path.join(root, text_cfg_path), **text_kw
        )
    else:
        cfg["text"] = TextConfig.create(**text_kw)

    # optional explicit teacher tower configs (teacher defaults to 12L/12L
    # at production scale, GeneralDistill.py:483-490; tests/tiny runs
    # override via teacher_vision_config / teacher_text_config)
    tv_path = cfg.get("teacher_vision_config")
    if tv_path:
        tv_path = tv_path if os.path.isabs(tv_path) else os.path.join(root, tv_path)
        cfg["teacher_vision"] = VisionConfig.create(
            image_res=cfg.get("image_res", 224), **load_json(tv_path)
        )
    tt_path = cfg.get("teacher_text_config")
    if tt_path:
        tt_path = tt_path if os.path.isabs(tt_path) else os.path.join(root, tt_path)
        tkw = dict(num_hidden_layers=cfg.get("teacher_text_num_hidden_layers", 12))
        if "teacher_vision" in cfg:
            tkw["encoder_width"] = cfg["teacher_vision"]["vision_width"]
        cfg["teacher_text"] = TextConfig.from_bert_json(tt_path, **tkw)
    return cfg
