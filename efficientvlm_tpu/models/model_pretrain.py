"""Pretrain / general-distillation model: ITC + ITM + MLM (+ BBox on region
batches), returning the KD output dict (reference models/model_pretrain.py:11-82).

Teacher and student are both this class (teacher = 12L/12L config, student =
6L/6L; GeneralDistill.py:483-490) — the GD stage has no gates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .xvlm import XVLM

Array = jax.Array

TEMP_CLAMP = (0.001, 0.5)  # models/model_pretrain.py:37


class XVLMForPretrain(XVLM):
    def forward(
        self,
        params: dict,
        image: Array,
        text_ids: Array,
        text_atts: Array,
        *,
        text_ids_masked: Optional[Array] = None,
        masked_pos: Optional[Array] = None,
        masked_ids: Optional[Array] = None,
        image_atts: Optional[Array] = None,
        idx_to_group_img: Optional[Array] = None,
        target_bbox: Optional[Array] = None,
        is_image: Optional[Array] = None,
        ret_bbox_loss: bool = False,
        zs: Optional[dict] = None,
        rng: Optional[Array] = None,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
        axis_name: Optional[str] = None,
        train: bool = False,
        dtype=None,
        impl: str = "xla",
    ) -> dict:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, trng, nrng, mrng = jax.random.split(rng, 4)

        if ret_bbox_loss:
            image_embeds, image_atts_out, image_embeds_fullatts, _, vextra = self.get_vision_embeds(
                params, image, image_atts=image_atts, idx_to_group_img=idx_to_group_img,
                zs=zs, output_attentions=output_attentions,
                output_hidden_states=output_hidden_states, train=train, rng=vrng,
                dtype=dtype, impl=impl,
            )
            image_atts = image_atts_out
        else:
            image_embeds, image_atts, vextra = self.get_vision_embeds(
                params, image, zs=zs, output_attentions=output_attentions,
                output_hidden_states=output_hidden_states, train=train, rng=vrng,
                dtype=dtype, impl=impl,
            )
            image_embeds_fullatts = None

        tout = self.get_text_embeds(
            params, text_ids, text_atts, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=trng,
            dtype=dtype, impl=impl,
        )
        text_embeds = tout["last_hidden"]

        hidden_dict = {
            "image_hidden_states": vextra["hidden_states"],
            "text_hidden_states": tout["hidden_states"],
        }
        attention_dict = {
            "image_attentions": vextra["attentions"],
            "text_attentions": tout["attentions"],
        }
        cross_attention_dict: dict = {}
        logits_dict: dict = {}

        image_feat, text_feat = self.get_features(params, image_embeds, text_embeds, dtype=dtype)
        loss_itc = self.get_contrastive_loss(params, image_feat, text_feat, axis_name=axis_name)

        itm = self.get_matching_loss(
            params, nrng, image_embeds, image_atts, image_feat,
            text_embeds, text_atts, text_feat, zs=zs,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, dtype=dtype, impl=impl,
        )
        if output_hidden_states:
            loss_itm, itm_extra = itm
            hidden_dict["itm_pos_hidden_states"] = itm_extra["pos_hidden_states"]
            hidden_dict["itm_neg_hidden_states"] = itm_extra["neg_hidden_states"]
            attention_dict["itm_pos_attentions"] = itm_extra["pos_attentions"]
            attention_dict["itm_neg_attentions"] = itm_extra["neg_attentions"]
            cross_attention_dict["itm_pos_cross_attentions"] = itm_extra["pos_cross_attentions"]
            cross_attention_dict["itm_neg_cross_attentions"] = itm_extra["neg_cross_attentions"]
            logits_dict["itm_head_logits"] = itm_extra["logits"]
        else:
            loss_itm = itm

        mlm = self.get_mlm_loss(
            params, text_ids_masked, text_atts, image_embeds, image_atts,
            masked_pos, masked_ids, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=mrng,
            dtype=dtype, impl=impl,
        )
        if output_hidden_states:
            loss_mlm, mlm_extra = mlm
            hidden_dict["mlm_hidden_states"] = mlm_extra["hidden_states"]
            attention_dict["mlm_attentions"] = mlm_extra["attentions"]
            cross_attention_dict["mlm_cross_attentions"] = mlm_extra["cross_attentions"]
            logits_dict["mlm_logits"] = mlm_extra["logits"]
        else:
            loss_mlm = mlm

        loss = {"loss_itc": loss_itc, "loss_itm": loss_itm, "loss_mlm": loss_mlm}

        if ret_bbox_loss:
            bbox_out = self.predict_bbox(
                params, image_embeds_fullatts, text_embeds, text_atts, zs=zs,
                output_attentions=output_attentions,
                output_hidden_states=output_hidden_states, dtype=dtype, impl=impl,
            )
            if output_hidden_states:
                output_coord, bbox_extra = bbox_out
                hidden_dict["bbox_hidden_states"] = bbox_extra["hidden_states"]
                attention_dict["bbox_attentions"] = bbox_extra["attentions"]
                cross_attention_dict["bbox_cross_attentions"] = bbox_extra["cross_attentions"]
            else:
                output_coord = bbox_out
            loss_bbox, loss_giou = self.get_bbox_loss(output_coord, target_bbox, is_image=is_image)
            loss["loss_bbox"] = loss_bbox
            loss["loss_giou"] = loss_giou

        return {
            "loss": loss,
            "hidden_dict": hidden_dict,
            "attention_dict": attention_dict,
            "cross_attention_dict": cross_attention_dict,
            "logits_dict": logits_dict,
        }
