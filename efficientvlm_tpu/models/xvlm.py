"""X-VLM composite base: vision + text towers, projections, heads, losses.

Functional re-design of the reference XVLMBase (models/xvlm.py:280-612 and
efficient_models/xvlm.py:211-569 collapsed into one gated core):

- get_contrastive_loss: global-batch ITC over `lax.all_gather` on the data
  mesh axis (replacing the custom AllGather autograd fn, models/xvlm.py:55-75,
  446-447), with idx-aware soft labels (457-465);
- get_matching_loss: ITM with hard negatives sampled from the softmax of the
  similarity matrix — vectorized `jax.random.categorical` replacing the
  per-sample torch.multinomial Python loop (models/xvlm.py:491-509);
- get_mlm_loss over masked positions; predict_bbox + L1/GIoU loss
  (models/xvlm.py:566-612).

Gates arrive as a `zs` dict (keys mirroring the reference L0 module output:
vision_head_z [Lv,H], vision_intermediate_z [Lv,I], text_head_z [Lt,H],
text_intermediate_z [Lt,I], cross_head_z [Lc,2,H], cross_intermediate_z
[Lc,I]); zs=None (or missing keys) compiles the dense teacher program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import Config, TextConfig, VisionConfig
from ..ops.basic import dense, init_dense, init_layer_norm, layer_norm, gelu
from . import bert as B
from . import vit as V
from .box_ops import box_cxcywh_to_xyxy, generalized_box_iou

Array = jax.Array


def init_mlp_head(key: Array, d_in: int, d_out: int) -> dict:
    """2-layer MLP head with mid LayerNorm (reference build_mlp,
    models/xvlm.py:117-124)."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_dense(k1, d_in, d_in * 2),
        "ln": init_layer_norm(d_in * 2),
        "fc2": init_dense(k2, d_in * 2, d_out),
    }


def mlp_head_apply(params: dict, x: Array, *, dtype=None) -> Array:
    x = dense(params["fc1"], x, dtype=dtype)
    x = layer_norm(params["ln"], x)
    x = gelu(x)
    return dense(params["fc2"], x, dtype=dtype)


def init_xvlm(
    key: Array,
    vision_cfg: VisionConfig = None,
    text_cfg: TextConfig = None,
    *,
    embed_dim: int = 256,
    temp: float = 0.07,
    with_bbox_head: bool = False,
    with_mlm_head: bool = True,
    vision_init=None,
) -> dict:
    keys = jax.random.split(key, 8)
    vision_init = vision_init or V.init_vit
    params = {
        "vision": vision_init(keys[0], vision_cfg),
        "text": B.init_bert(keys[1], text_cfg, with_mlm_head=with_mlm_head),
        "vision_proj": init_dense(keys[2], vision_cfg["vision_width"], embed_dim),
        "text_proj": init_dense(keys[3], text_cfg["hidden_size"], embed_dim),
        "temp": jnp.array(temp, jnp.float32),
        "itm_head": init_mlp_head(keys[4], text_cfg["hidden_size"], 2),
    }
    if with_bbox_head:
        params["bbox_head"] = init_mlp_head(keys[5], text_cfg["hidden_size"], 4)
    return params


def split_zs(zs: Optional[dict]):
    """zs dict -> (vision gates, text/cross gates) kwargs."""
    if zs is None:
        return {}, {}
    vision = {
        "head_z": zs.get("vision_head_z"),
        "mlp_z": zs.get("vision_intermediate_z"),
    }
    if "vision_head_layer_z" in zs:
        vision["head_layer_z"] = zs.get("vision_head_layer_z")
    text = {
        "text_head_z": zs.get("text_head_z"),
        "cross_head_z": zs.get("cross_head_z"),
        "text_mlp_z": zs.get("text_intermediate_z"),
        "cross_mlp_z": zs.get("cross_intermediate_z"),
    }
    return vision, text


def vision_encoder_dispatch(config: Optional[Config]):
    """CLIP-ViT (default) / Swin / DeiT switch (reference
    build_vision_encoder, models/xvlm.py:94-172: use_clip_vit / use_swin
    config keys; the gated student path supports clip-vit only, like the
    reference efficient_models/xvlm.py:130-131).
    Returns (init_fn(key, cfg), apply_fn(params, images, cfg, **kw))."""
    config = config or {}
    if config.get("use_swin"):
        from .swin import init_swin, swin_apply

        return init_swin, swin_apply
    if config.get("use_deit"):
        from .deit import deit_apply, init_deit

        return init_deit, deit_apply
    return V.init_vit, V.vit_apply


class XVLM:
    """Thin stateless namespace bundling configs; all methods are pure
    functions of (params, inputs)."""

    def __init__(self, vision_cfg: VisionConfig, text_cfg: TextConfig, config: Optional[Config] = None):
        self.vision_cfg = vision_cfg
        self.text_cfg = text_cfg
        self.config = config or Config()
        self.embed_dim = self.config.get("embed_dim", 256)
        self.vision_init, self.vision_apply = vision_encoder_dispatch(self.config)

    def init(self, key: Array, **kw) -> dict:
        # jit the whole init: eager per-tensor PRNG dispatch takes minutes
        # at production size (hundreds of tiny ops); one compiled program
        # takes seconds.
        import functools

        fn = functools.partial(
            init_xvlm, vision_cfg=self.vision_cfg, text_cfg=self.text_cfg,
            embed_dim=self.embed_dim, temp=self.config.get("temp", 0.07),
            vision_init=self.vision_init, **kw,
        )
        return jax.jit(fn)(key)

    # -- encoders -----------------------------------------------------------

    def get_vision_embeds(
        self, params, image, *, idx_to_group_img=None, image_atts=None, zs=None,
        output_attentions=False, output_hidden_states=False, train=False, rng=None,
        dtype=None, impl="xla",
    ):
        """reference models/xvlm.py:331-364. Returns (embeds, atts[, extra])."""
        vz, _ = split_zs(zs)
        kw = dict(
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states,
            train=train, rng=rng, dtype=dtype, impl=impl, **vz,
        )
        if self.vision_apply is V.vit_apply:
            kw.update(idx_to_group_img=idx_to_group_img, image_atts=image_atts)
        out = self.vision_apply(params["vision"], image, self.vision_cfg, **kw)
        embeds = out["last_hidden"]
        if idx_to_group_img is None:
            atts = jnp.ones(embeds.shape[:2], jnp.int32)
            return embeds, atts, out
        # region batch: per-region patch masks + full-attention embeds
        atts = image_atts.astype(jnp.int32)
        full = out["full_atts_hidden"]
        full_atts = jnp.ones(full.shape[:2], jnp.int32)
        return (embeds, atts, full, full_atts, out)

    def get_text_embeds(
        self, params, text_ids, text_atts, *, zs=None, output_attentions=False,
        output_hidden_states=False, train=False, rng=None, dtype=None, impl="xla",
    ):
        """mode='text' (reference models/xvlm.py:366-376)."""
        _, tz = split_zs(zs)
        return B.bert_apply(
            params["text"], text_ids, self.text_cfg, attention_mask=text_atts,
            mode="text", output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=rng,
            dtype=dtype, impl=impl,
            text_head_z=tz.get("text_head_z"), text_mlp_z=tz.get("text_mlp_z"),
        )

    def get_cross_embeds(
        self, params, image_embeds, image_atts, *, text_embeds, text_atts, zs=None,
        encoder_groups=1, output_attentions=False, output_hidden_states=False,
        train=False, rng=None, dtype=None, impl="xla",
    ):
        """mode='fusion' (reference models/xvlm.py:378-424). encoder_groups
        > 1 declares image rows shared by groups of contiguous text rows
        (grouped-K/V attention, e.g. the k_test-tiled i2t rerank)."""
        _, tz = split_zs(zs)
        return B.bert_apply(
            params["text"], None, self.text_cfg, inputs_embeds=text_embeds,
            attention_mask=text_atts, encoder_hidden=image_embeds,
            encoder_attention_mask=image_atts, mode="fusion",
            encoder_groups=encoder_groups,
            output_attentions=output_attentions, output_hidden_states=output_hidden_states,
            train=train, rng=rng, dtype=dtype, impl=impl,
            cross_head_z=tz.get("cross_head_z"), cross_mlp_z=tz.get("cross_mlp_z"),
        )

    def get_features(self, params, image_embeds=None, text_embeds=None, *, dtype=None):
        """CLS projections, L2-normalized (reference models/xvlm.py:426-433)."""
        outs = []
        if image_embeds is not None:
            v = dense(params["vision_proj"], image_embeds[:, 0], dtype=dtype)
            outs.append(v / jnp.linalg.norm(v, axis=-1, keepdims=True))
        if text_embeds is not None:
            t = dense(params["text_proj"], text_embeds[:, 0], dtype=dtype)
            outs.append(t / jnp.linalg.norm(t, axis=-1, keepdims=True))
        return outs[0] if len(outs) == 1 else tuple(outs)

    # -- losses --------------------------------------------------------------

    def get_contrastive_loss(self, params, image_feat, text_feat, *, idx=None, axis_name=None):
        """Global-batch ITC (reference models/xvlm.py:435-467). When
        axis_name is set (inside pjit/shard_map), features are all-gathered
        across the data axis — the JAX-native, differentiable replacement of
        the custom AllGather autograd function."""
        if axis_name is not None:
            image_all = jax.lax.all_gather(image_feat, axis_name, tiled=True)
            text_all = jax.lax.all_gather(text_feat, axis_name, tiled=True)
            if idx is not None:
                idx = jax.lax.all_gather(idx, axis_name, tiled=True)
        else:
            image_all, text_all = image_feat, text_feat

        logits = (image_all @ text_all.T).astype(jnp.float32) / params["temp"]
        bsz = logits.shape[0]
        if idx is None:
            labels_i2t = labels_t2i = jax.nn.one_hot(jnp.arange(bsz), bsz)
        else:
            idx = idx.reshape(-1, 1)
            pos = (idx == idx.T).astype(jnp.float32)
            labels_i2t = labels_t2i = pos / pos.sum(1, keepdims=True)
        loss_i2t = -(jax.nn.log_softmax(logits, axis=1) * labels_i2t).sum(1).mean()
        loss_t2i = -(jax.nn.log_softmax(logits.T, axis=1) * labels_t2i).sum(1).mean()
        return (loss_i2t + loss_t2i) / 2

    def sample_hard_negatives(self, rng, image_feat, text_feat, *, idx=None, temp):
        """Vectorized hard-negative index sampling (replaces the per-sample
        torch.multinomial loop, models/xvlm.py:491-509)."""
        sim_i2t = (image_feat @ text_feat.T).astype(jnp.float32) / temp
        sim_t2i = (text_feat @ image_feat.T).astype(jnp.float32) / temp
        bs = sim_i2t.shape[0]
        if idx is None:
            mask = jnp.eye(bs, dtype=bool)
        else:
            idx = idx.reshape(-1, 1)
            mask = idx == idx.T
        # weights = softmax(sim)+1e-5 with positives zeroed; categorical over
        # log-weights reproduces the multinomial distribution.
        w_i2t = jnp.where(mask, 0.0, jax.nn.softmax(sim_i2t, axis=1) + 1e-5)
        w_t2i = jnp.where(mask, 0.0, jax.nn.softmax(sim_t2i, axis=1) + 1e-5)
        r1, r2 = jax.random.split(rng)
        neg_text_idx = jax.random.categorical(r1, jnp.log(w_i2t + 1e-30), axis=1)
        neg_image_idx = jax.random.categorical(r2, jnp.log(w_t2i + 1e-30), axis=1)
        return neg_image_idx, neg_text_idx

    def get_matching_loss(
        self, params, rng, image_embeds, image_atts, image_feat,
        text_embeds, text_atts, text_feat, *, idx=None, zs=None,
        output_attentions=False, output_hidden_states=False, train=False,
        dtype=None, impl="xla",
    ):
        """ITM with in-batch hard negatives (reference models/xvlm.py:469-542).
        Returns loss or (loss, kd_outputs dict) when output_hidden_states."""
        bs = image_embeds.shape[0]
        neg_image_idx, neg_text_idx = self.sample_hard_negatives(
            rng, jax.lax.stop_gradient(image_feat), jax.lax.stop_gradient(text_feat),
            idx=idx, temp=params["temp"],
        )
        image_embeds_neg = jnp.take(image_embeds, neg_image_idx, axis=0)
        image_atts_neg = jnp.take(image_atts, neg_image_idx, axis=0)
        text_embeds_neg = jnp.take(text_embeds, neg_text_idx, axis=0)
        text_atts_neg = jnp.take(text_atts, neg_text_idx, axis=0)

        text_embeds_all = jnp.concatenate([text_embeds, text_embeds_neg], 0)
        text_atts_all = jnp.concatenate([text_atts, text_atts_neg], 0)
        image_embeds_all = jnp.concatenate([image_embeds_neg, image_embeds], 0)
        image_atts_all = jnp.concatenate([image_atts_neg, image_atts], 0)

        pos = self.get_cross_embeds(
            params, image_embeds, image_atts, text_embeds=text_embeds,
            text_atts=text_atts, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, dtype=dtype, impl=impl,
        )
        neg = self.get_cross_embeds(
            params, image_embeds_all, image_atts_all, text_embeds=text_embeds_all,
            text_atts=text_atts_all, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, dtype=dtype, impl=impl,
        )
        cls = jnp.concatenate([pos["last_hidden"][:, 0], neg["last_hidden"][:, 0]], 0)
        logits = mlp_head_apply(params["itm_head"], cls, dtype=dtype)
        labels = jnp.concatenate([jnp.ones(bs, jnp.int32), jnp.zeros(2 * bs, jnp.int32)])
        loss = B.cross_entropy_ignore_index(logits, labels)
        if not output_hidden_states:
            return loss
        return loss, {
            "pos_hidden_states": pos["hidden_states"],
            "neg_hidden_states": neg["hidden_states"],
            "pos_attentions": pos["attentions"],
            "neg_attentions": neg["attentions"],
            "pos_cross_attentions": pos["cross_attentions"],
            "neg_cross_attentions": neg["cross_attentions"],
            "logits": logits,
        }

    def get_mlm_loss(
        self, params, text_ids_masked, text_atts, image_embeds, image_atts,
        masked_pos, masked_ids, *, zs=None, output_attentions=False,
        output_hidden_states=False, train=False, rng=None, dtype=None, impl="xla",
    ):
        """MLM over multi_modal mode with masked-position gather
        (reference models/xvlm.py:544-564; xbert.py:1560-1614)."""
        _, tz = split_zs(zs)
        out = B.bert_apply(
            params["text"], text_ids_masked, self.text_cfg, attention_mask=text_atts,
            encoder_hidden=image_embeds, encoder_attention_mask=image_atts,
            mode="multi_modal", output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=rng,
            dtype=dtype, impl=impl, **tz,
        )
        gathered = B.gather_seq_out_by_pos(out["last_hidden"], masked_pos)
        logits = B.mlm_head_apply(params["text"]["cls"], gathered, self.text_cfg, dtype=dtype)
        loss = B.cross_entropy_ignore_index(logits, masked_ids)
        if not output_hidden_states:
            return loss
        return loss, {
            "logits": logits,
            "hidden_states": out["hidden_states"],
            "attentions": out["attentions"],
            "cross_attentions": out["cross_attentions"],
        }

    def predict_bbox(
        self, params, image_embeds, text_embeds, text_atts, *, zs=None,
        output_attentions=False, output_hidden_states=False, dtype=None, impl="xla",
    ):
        """reference models/xvlm.py:566-584. Returns coord or (coord, extra)."""
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        out = self.get_cross_embeds(
            params, image_embeds, image_atts, text_embeds=text_embeds,
            text_atts=text_atts, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, dtype=dtype, impl=impl,
        )
        coord = mlp_head_apply(params["bbox_head"], out["last_hidden"][:, 0], dtype=dtype)
        coord = jax.nn.sigmoid(coord.astype(jnp.float32))
        if not output_hidden_states:
            return coord
        return coord, out

    def get_bbox_loss(self, output_coord, target_bbox, *, is_image=None):
        """L1 + GIoU with degenerate-box guard (models/xvlm.py:587-612).

        The reference zeroes the whole GIoU loss batch if ANY box is
        degenerate; jit-compatible equivalent uses a per-batch switch."""
        loss_bbox = jnp.abs(output_coord - target_bbox)

        boxes1 = box_cxcywh_to_xyxy(output_coord)
        boxes2 = box_cxcywh_to_xyxy(target_bbox)
        degen = jnp.logical_or(
            (boxes1[:, 2:] < boxes1[:, :2]).any(), (boxes2[:, 2:] < boxes2[:, :2]).any()
        )
        giou = 1.0 - jnp.diagonal(generalized_box_iou(boxes1, boxes2))
        loss_giou = jnp.where(degen, jnp.zeros_like(giou), giou)

        if is_image is None:
            num_boxes = target_bbox.shape[0]
        else:
            num_boxes = jnp.maximum(jnp.sum(1 - is_image), 1)
            loss_bbox = loss_bbox * (1 - is_image.reshape(-1, 1))
            loss_giou = loss_giou * (1 - is_image)
        return loss_bbox.sum() / num_boxes, loss_giou.sum() / num_boxes
