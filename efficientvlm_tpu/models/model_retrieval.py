"""Retrieval task model (ITC + ITM), teacher and student in one.

Replaces reference models/model_retrieval.py (teacher) and
efficient_models/model_retrieval.py (student EffXVLMforRetrieval): here the
student is the same forward with a zs dict; the teacher passes zs=None.
KD-output mode returns the same dict layout the reference drivers consume
(hidden_dict / attention_dict / cross_attention_dict / logits_dict).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .xvlm import XVLM

Array = jax.Array


class XVLMForRetrieval(XVLM):
    def forward(
        self,
        params: dict,
        image: Array,
        text_ids: Array,
        text_atts: Array,
        *,
        idx: Optional[Array] = None,
        zs: Optional[dict] = None,
        rng: Optional[Array] = None,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
        axis_name: Optional[str] = None,
        train: bool = False,
        dtype=None,
        impl: str = "xla",
    ):
        """KD mode (output_attentions=True) returns the reference dict
        (efficient_models/model_retrieval.py:25-76); otherwise
        (loss_itc, loss_itm)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, trng, mrng, nrng = jax.random.split(rng, 4)

        vout = self.get_vision_embeds(
            params, image, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=vrng,
            dtype=dtype, impl=impl,
        )
        image_embeds, image_atts, vextra = vout
        tout = self.get_text_embeds(
            params, text_ids, text_atts, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=trng,
            dtype=dtype, impl=impl,
        )
        text_embeds = tout["last_hidden"]

        image_feat, text_feat = self.get_features(params, image_embeds, text_embeds, dtype=dtype)
        loss_itc = self.get_contrastive_loss(params, image_feat, text_feat, idx=idx, axis_name=axis_name)

        itm = self.get_matching_loss(
            params, nrng, image_embeds, image_atts, image_feat,
            text_embeds, text_atts, text_feat, idx=idx, zs=zs,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states,
            train=train, dtype=dtype, impl=impl,
        )
        if not output_hidden_states:
            return loss_itc, itm

        loss_itm, itm_extra = itm
        return {
            "loss": {"loss_itc": loss_itc, "loss_itm": loss_itm},
            "hidden_dict": {
                "image_hidden_states": vextra["hidden_states"],
                "text_hidden_states": tout["hidden_states"],
                "itm_pos_hidden_states": itm_extra["pos_hidden_states"],
                "itm_neg_hidden_states": itm_extra["neg_hidden_states"],
            },
            "attention_dict": {
                "image_attentions": vextra["attentions"],
                "text_attentions": tout["attentions"],
                "itm_pos_attentions": itm_extra["pos_attentions"],
                "itm_neg_attentions": itm_extra["neg_attentions"],
            },
            "cross_attention_dict": {
                "itm_pos_cross_attentions": itm_extra["pos_cross_attentions"],
                "itm_neg_cross_attentions": itm_extra["neg_cross_attentions"],
            },
            "logits_dict": {"itm_head_logits": itm_extra["logits"]},
        }
