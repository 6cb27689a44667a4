"""Visual grounding model (bbox regression from image+text).

Parity port of reference models/model_grounding.py (teacher) and
efficient_models/model_grounding.py:29-111 (student EffXVLMForGrounding) —
vestigial in the reference (no driver wires it up) but present; here it is
fully wired (drivers/grounding.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .xvlm import XVLM

Array = jax.Array


class XVLMForGrounding(XVLM):
    def forward(
        self,
        params: dict,
        image: Array,
        text_ids: Array,
        text_atts: Array,
        *,
        target_bbox: Optional[Array] = None,
        zs: Optional[dict] = None,
        rng: Optional[Array] = None,
        train: bool = True,
        output_attentions: bool = False,
        output_hidden_states: bool = False,
        dtype=None,
        impl: str = "xla",
    ):
        """train=True -> (loss_bbox, loss_giou); else predicted coords
        [B,4] cxcywh in [0,1]."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, trng = jax.random.split(rng)
        image_embeds, _, _ = self.get_vision_embeds(
            params, image, zs=zs, train=train, rng=vrng, dtype=dtype, impl=impl,
        )
        text_embeds = self.get_text_embeds(
            params, text_ids, text_atts, zs=zs, train=train, rng=trng,
            dtype=dtype, impl=impl,
        )["last_hidden"]
        output_coord = self.predict_bbox(
            params, image_embeds, text_embeds, text_atts, zs=zs, dtype=dtype, impl=impl,
        )
        if not train:
            return output_coord
        loss_bbox, loss_giou = self.get_bbox_loss(output_coord, target_bbox)
        return loss_bbox, loss_giou
