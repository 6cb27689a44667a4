"""NLVR2 two-image reasoning model.

Reference design (models/model_nlvr.py, efficient_models/model_nlvr.py):
the text encoder's cross layers are replicated x2 — layer fusion+2i
cross-attends image0, layer fusion+2i+1 cross-attends image1 — and each
pair shares its cross-attention KEY/VALUE weights (share_cross_attention,
ref :253-266; query/output/LNs stay independent).

TPU-native structural tie: the pair-second layer's cross K/V params are
never read — apply always pulls K/V from the pair-first layer, so gradients
accumulate in one place (exactly tied-weight semantics), and the checkpoint
importer duplicates layers on load (ref :159-183).

Both images run through the vision tower as one 2B batch, then split.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config, TextConfig, VisionConfig
from ..ops.attention import make_attention_bias
from . import bert as B
from . import vit as V
from .xvlm import XVLM, init_mlp_head, mlp_head_apply, split_zs

Array = jax.Array


def make_nlvr_text_config(text_cfg: TextConfig) -> TextConfig:
    """text layers + 2x cross layers (ref model_nlvr.py:128-137)."""
    fusion = text_cfg["fusion_layer"]
    n_cross = text_cfg["num_hidden_layers"] - fusion
    kw = {k: text_cfg[k] for k in TextConfig.DEFAULTS if k in text_cfg}
    kw["num_hidden_layers"] = fusion + 2 * n_cross
    kw["fusion_layer"] = fusion
    return TextConfig.create(**kw)


class XVLMForNLVR(XVLM):
    def __init__(self, vision_cfg: VisionConfig, text_cfg: TextConfig, config: Optional[Config] = None):
        nlvr_text_cfg = make_nlvr_text_config(text_cfg)
        super().__init__(vision_cfg, nlvr_text_cfg, config)
        self.base_text_cfg = text_cfg
        self.num_text_layers = text_cfg["fusion_layer"]
        self.num_cross_layers = text_cfg["num_hidden_layers"] - text_cfg["fusion_layer"]

    def init(self, key: Array, *, num_labels: int = 2) -> dict:
        def _init(k):
            k1, k2, k3 = jax.random.split(k, 3)
            return {
                "vision": V.init_vit(k1, self.vision_cfg),
                "text": B.init_bert(k2, self.text_cfg, with_mlm_head=False),
                "cls_head": init_mlp_head(k3, self.text_cfg["hidden_size"], num_labels),
            }

        return jax.jit(_init)(key)

    def _tie_cross_kv(self, params: dict) -> dict:
        """Route pair-second cross K/V reads to the pair-first layer."""
        layers = list(params["text"]["layers"])
        fusion = self.num_text_layers
        for i in range(self.num_cross_layers):
            a, b = fusion + 2 * i, fusion + 2 * i + 1
            lb = dict(layers[b])
            xb = dict(lb["crossattention"])
            xb["k"] = layers[a]["crossattention"]["k"]
            xb["v"] = layers[a]["crossattention"]["v"]
            lb["crossattention"] = xb
            layers[b] = lb
        text = dict(params["text"])
        text["layers"] = layers
        return {**params, "text": text}

    def _nlvr_text_gates(self, zs: Optional[dict]):
        """zs cross_head_z is [2*Lc, 2, H] over the replicated stack."""
        if zs is None:
            return {}
        text_mlp = zs.get("text_intermediate_z")
        cross_mlp = zs.get("cross_intermediate_z")
        return {
            "text_head_z": zs.get("text_head_z"),
            "cross_head_z": zs.get("cross_head_z"),
            "text_mlp_z": text_mlp,
            "cross_mlp_z": cross_mlp,
        }

    def cross_forward(
        self, params, image0_embeds, image0_atts, image1_embeds, image1_atts,
        text_ids, text_atts, *, zs=None, output_attentions=False,
        output_hidden_states=False, train=False, rng=None, dtype=None, impl="xla",
    ):
        """Full multi_modal pass with alternating per-image cross attention
        (ref xbert.py:498-505 list routing)."""
        params = self._tie_cross_kv(params)
        cfg = self.text_cfg
        fusion = self.num_text_layers
        gates = self._nlvr_text_gates(zs)

        h = B.bert_embeddings(params["text"]["embeddings"], text_ids, cfg, train=train, rng=rng, dtype=dtype)
        bias = make_attention_bias(text_atts)
        enc_bias0 = make_attention_bias(image0_atts)
        enc_bias1 = make_attention_bias(image1_atts)

        all_hidden = [] if output_hidden_states else None
        all_probs = [] if output_attentions else None
        all_cross = [] if output_attentions else None
        for i in range(cfg["num_hidden_layers"]):
            if output_hidden_states:
                all_hidden.append(h)
            is_cross = i >= fusion
            if is_cross:
                ci = i - fusion
                use_img1 = ci % 2 == 1
                enc_h, enc_b = (image1_embeds, enc_bias1) if use_img1 else (image0_embeds, enc_bias0)
                shz = gates.get("cross_head_z")
                self_z = shz[ci][0] if shz is not None else None
                cross_z = shz[ci][1] if shz is not None else None
                mz = gates.get("cross_mlp_z")
                mlp_zi = mz[ci // 2] if mz is not None else None
            else:
                enc_h = enc_b = None
                thz = gates.get("text_head_z")
                self_z = thz[i] if thz is not None else None
                cross_z = None
                tm = gates.get("text_mlp_z")
                mlp_zi = tm[i] if tm is not None else None
            lrng = None
            if rng is not None:
                rng, lrng = jax.random.split(rng)
            h, sp, cp, _ = B.bert_layer_apply(
                params["text"]["layers"][i], h, cfg, bias=bias,
                encoder_hidden=enc_h, encoder_bias=enc_b,
                self_head_z=self_z, cross_head_z=cross_z, mlp_z=mlp_zi,
                output_probs=output_attentions, train=train, rng=lrng,
                dtype=dtype, impl=impl,
            )
            if output_attentions:
                all_probs.append(sp)
                if cp is not None:
                    all_cross.append(cp)
        if output_hidden_states:
            all_hidden.append(h)
        return {
            "last_hidden": h,
            "hidden_states": all_hidden,
            "attentions": all_probs,
            "cross_attentions": all_cross,
        }

    def forward(
        self, params, image, text_ids, text_atts, targets, *, zs=None,
        rng=None, train=True, output_attentions=False, output_hidden_states=False,
        dtype=None, impl="xla",
    ):
        """image: [2B,...] (image0 batch then image1 batch,
        ref model_nlvr.py:196-201). Returns loss / prediction / KD dict."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, crng = jax.random.split(rng)
        vz, _ = split_zs(zs)
        vout = V.vit_apply(
            params["vision"], image, self.vision_cfg,
            output_attentions=output_attentions, output_hidden_states=output_hidden_states,
            train=train, rng=vrng, dtype=dtype, impl=impl, **vz,
        )
        image_embeds = vout["last_hidden"]
        bs = targets.shape[0]
        image0_embeds, image1_embeds = image_embeds[:bs], image_embeds[bs:]
        atts0 = jnp.ones(image0_embeds.shape[:2], jnp.int32)
        atts1 = jnp.ones(image1_embeds.shape[:2], jnp.int32)

        out = self.cross_forward(
            params, image0_embeds, atts0, image1_embeds, atts1, text_ids, text_atts,
            zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=crng,
            dtype=dtype, impl=impl,
        )
        prediction = mlp_head_apply(params["cls_head"], out["last_hidden"][:, 0], dtype=dtype)
        loss = B.cross_entropy_ignore_index(prediction, targets) if train else None

        if not output_hidden_states:
            return loss if train else prediction
        return {
            "loss": loss,
            "hidden_dict": {
                "image_hidden_states": vout["hidden_states"],
                "text_hidden_states": out["hidden_states"],
            },
            "attention_dict": {
                "image_attentions": vout["attentions"],
                "text_attentions": out["attentions"],
            },
            "cross_attention_dict": {"cross_attentions": out["cross_attentions"]},
            "logits_dict": {"cls_head_logits": prediction},
        }


class XVLMForNLVRPretraining(XVLMForNLVR):
    """NLVR domain post-pretrain: 3-way text-pair task over the replicated
    cross stack (reference efficient_models/model_nlvr.py:11-123): with
    prob 2/3 pair the image with an in-batch hard negative (label = which
    slot holds the original), else pair it with itself (label 2). The
    per-sample torch.multinomial loop is vectorized with
    jax.random.categorical."""

    def init(self, key: Array, **kw) -> dict:
        from ..ops.basic import init_dense

        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1, num_labels=3)
        params.pop("cls_head")
        # ta_head is a plain Linear in the reference (model_nlvr.py:31)
        params["ta_head"] = init_dense(k2, self.text_cfg["hidden_size"], 3)
        params["vision_proj"] = init_dense(
            k3, self.vision_cfg["vision_width"], self.config.get("embed_dim", 256)
        )
        return params

    def forward_pretrain(self, params, image, text_ids, text_atts, *, rng, zs=None, dtype=None, impl="xla"):
        from ..ops.basic import dense

        vrng, nrng, lrng, srng, crng = jax.random.split(rng, 5)
        vz, _ = split_zs(zs)
        vout = V.vit_apply(params["vision"], image, self.vision_cfg, rng=vrng, dtype=dtype, impl=impl, **vz)
        image_embeds = vout["last_hidden"]
        bs = image_embeds.shape[0]
        atts = jnp.ones(image_embeds.shape[:2], jnp.int32)

        feat = dense(params["vision_proj"], image_embeds[:, 0], dtype=dtype)
        feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
        sim = jax.lax.stop_gradient((feat @ feat.T).astype(jnp.float32)) / 0.07
        weights = jnp.where(jnp.eye(bs, dtype=bool), 0.0, jax.nn.softmax(sim, axis=1) + 1e-5)
        neg_idx = jax.random.categorical(nrng, jnp.log(weights + 1e-30), axis=1)
        labels = jax.random.randint(lrng, (bs,), 0, 3)

        neg_embeds = jnp.take(image_embeds, neg_idx, axis=0)
        lab = labels.reshape(-1, 1, 1)
        img0 = jnp.where(lab == 1, neg_embeds, image_embeds)
        img1 = jnp.where(lab == 0, neg_embeds, image_embeds)

        out = self.cross_forward(
            params, img0, atts, img1, atts, text_ids, text_atts,
            zs=zs, rng=crng, dtype=dtype, impl=impl,
        )
        pred = dense(params["ta_head"], out["last_hidden"][:, 0], dtype=dtype)
        return B.cross_entropy_ignore_index(pred, labels)


def duplicate_cross_layers_for_nlvr(sd: dict, num_text_layers: int) -> dict:
    """Checkpoint remap: replicate multimodal blocks for two images
    (ref efficient_models/model_nlvr.py:159-183), operating on torch-keyed
    text_encoder state dicts ('encoder.layer.N....')."""
    import re

    out = {}
    pat = re.compile(r"(.*encoder\.layer\.)(\d+)(\..*)")
    for k, v in sd.items():
        m = pat.match(k)
        if not m:
            out[k] = v
            continue
        layer_num = int(m.group(2))
        if layer_num >= num_text_layers:
            new0 = (layer_num - num_text_layers) * 2 + num_text_layers
            out[f"{m.group(1)}{new0}{m.group(3)}"] = v
            out[f"{m.group(1)}{new0 + 1}{m.group(3)}"] = v
        else:
            out[k] = v
    return out
