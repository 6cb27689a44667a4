"""Generation task models: captioning (image -> caption) and VQA
(question + image -> answer), teacher/student unified via zs.

Replaces reference models/model_generation.py and
efficient_models/model_generation.py:

- XVLMForCaptioning (ref :61-227): vision encoder + a BertLMHeadModel
  decoder carrying the FULL fusion text config (layers [0,fusion) text-only,
  [fusion,N) cross-attend into the image); prompt tokens masked out of the
  LM loss; label smoothing.
- XVLMForVQA (ref :228-444): question through the fusion text encoder
  (multi_modal over the image), then a separate answer decoder
  (fusion_layer=0 -> every layer cross-attends into the question states);
  train = weighted per-answer LM loss; eval = rank_answer k-way re-ranking,
  implemented as two batched decoder calls (a better fit for TPU than the
  reference's per-question loop).
- XVLMForCrossGeneration (ref :445-583): multimodal translation — source
  text fused with the image conditions a separate-vocab causal decoder.
- TextTranslater (ref :585-716): text-only translation baseline (source
  through the text-mode layers only; no vision tower).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config, TextConfig, VisionConfig
from ..generation import generate_beam, generate_no_beam, make_bert_decode_fn
from ..models import bert as B
from ..models import vit as V
from .xvlm import split_zs

Array = jax.Array


def _decoder_zs(zs: Optional[dict]):
    """VQA decoder gates: decoder_head_z [Ld,2,H] -> cross gates of a
    fusion_layer=0 stack; decoder_intermediate_z -> cross mlp."""
    if zs is None:
        return {}
    return {
        "cross_head_z": zs.get("decoder_head_z"),
        "cross_mlp_z": zs.get("decoder_intermediate_z"),
    }


def _text_stack_zs(zs: Optional[dict]):
    """Full fusion-stack gates (captioning decoder shares the XVLM text
    layout: text_* for [0,fusion), cross_* for the rest)."""
    if zs is None:
        return {}
    return {
        "text_head_z": zs.get("text_head_z"),
        "cross_head_z": zs.get("cross_head_z"),
        "text_mlp_z": zs.get("text_intermediate_z"),
        "cross_mlp_z": zs.get("cross_intermediate_z"),
    }


class XVLMForCaptioning:
    def __init__(self, vision_cfg: VisionConfig, text_cfg: TextConfig, config: Optional[Config] = None):
        self.vision_cfg = vision_cfg
        self.text_cfg = text_cfg
        self.config = config or Config()
        self.label_smoothing = self.config.get("label_smoothing", 0.0)
        self.prompt_length = self.config.get("prompt_length", 2)  # '[CLS] a picture of'

    def init(self, key: Array) -> dict:
        def _init(k):
            k1, k2 = jax.random.split(k)
            return {
                "vision": V.init_vit(k1, self.vision_cfg),
                "text_decoder": B.init_bert(k2, self.text_cfg, with_mlm_head=True),
            }

        return jax.jit(_init)(key)

    def encode_image(self, params, image, *, zs=None, output_attentions=False,
                     output_hidden_states=False, train=False, rng=None, dtype=None, impl="xla"):
        vz, _ = split_zs(zs)
        out = V.vit_apply(
            params["vision"], image, self.vision_cfg,
            output_attentions=output_attentions, output_hidden_states=output_hidden_states,
            train=train, rng=rng, dtype=dtype, impl=impl, **vz,
        )
        atts = jnp.ones(out["last_hidden"].shape[:2], jnp.int32)
        return out["last_hidden"], atts, out

    def forward(
        self, params, image, caption_ids, caption_atts, *,
        pad_token_id: int = 0, prompt_length: Optional[int] = None, zs=None,
        rng=None, output_attentions=False, output_hidden_states=False,
        train=False, dtype=None, impl="xla",
    ):
        """LM loss on captions; prompt + pad positions masked to -100
        (reference model_generation.py:113-116)."""
        prompt_length = prompt_length if prompt_length is not None else self.prompt_length
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, drng = jax.random.split(rng)
        image_embeds, image_atts, vextra = self.encode_image(
            params, image, zs=zs, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=vrng,
            dtype=dtype, impl=impl,
        )
        targets = jnp.where(caption_ids == pad_token_id, -100, caption_ids)
        pos = jnp.arange(caption_ids.shape[1])[None]
        targets = jnp.where(pos < prompt_length, -100, targets)

        out = B.bert_apply(
            params["text_decoder"], caption_ids, self.text_cfg,
            attention_mask=caption_atts, encoder_hidden=image_embeds,
            encoder_attention_mask=image_atts, mode="multi_modal", is_decoder=True,
            output_attentions=output_attentions, output_hidden_states=output_hidden_states,
            train=train, rng=drng, dtype=dtype, impl=impl, **_text_stack_zs(zs),
        )
        logits = B.mlm_head_apply(params["text_decoder"]["cls"], out["last_hidden"], self.text_cfg, dtype=dtype)
        loss = B.lm_loss(logits, targets, label_smoothing=self.label_smoothing)
        if not output_hidden_states:
            return loss
        return {
            "loss": loss,
            "hidden_dict": {
                "image_hidden_states": vextra["hidden_states"],
                "decoder_hidden_states": out["hidden_states"],
            },
            "attention_dict": {
                "image_attentions": vextra["attentions"],
                "decoder_attentions": out["attentions"],
            },
            "cross_attention_dict": {"decoder_cross_attentions": out["cross_attentions"]},
            "logits_dict": {"logits": logits},
        }

    def forward_logits(
        self, params, image, caption_ids, caption_atts, *, zs=None, rng=None,
        dtype=None, impl="xla",
    ) -> Array:
        """Teacher-forced decoder logits [B, L, V] on given token ids — the
        SCST logprob path (one parallel forward instead of the reference's
        per-step logprob accumulation during sampling)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, drng = jax.random.split(rng)
        image_embeds, image_atts, _ = self.encode_image(
            params, image, zs=zs, rng=vrng, dtype=dtype, impl=impl,
        )
        out = B.bert_apply(
            params["text_decoder"], caption_ids, self.text_cfg,
            attention_mask=caption_atts, encoder_hidden=image_embeds,
            encoder_attention_mask=image_atts, mode="multi_modal", is_decoder=True,
            rng=drng, dtype=dtype, impl=impl, **_text_stack_zs(zs),
        )
        return B.mlm_head_apply(params["text_decoder"]["cls"], out["last_hidden"], self.text_cfg, dtype=dtype)

    def generate(
        self, params, image, prompt_ids, *, max_length: int = 30, min_length: int = 10,
        num_beams: int = 1, do_sample: bool = False, top_p: float = 0.9,
        repetition_penalty: float = 1.0, eos_id: int = 102, pad_id: int = 0,
        zs=None, rng=None, dtype=None, impl="xla",
    ) -> Array:
        """Returns token ids [B, max_length] (reference generate,
        model_generation.py:155-227). prompt_ids [B, P] WITHOUT the final
        [SEP] (the reference drops it, :176)."""
        image_embeds, image_atts, _ = self.encode_image(params, image, zs=zs, dtype=dtype, impl=impl)
        bsz = image_embeds.shape[0]
        reps = num_beams if num_beams > 1 else 1
        # encoder states stay UNEXPANDED across beams: all beams of an image
        # share its cross K/V via grouped-K/V attention (ops/attention.py) —
        # the reference repeat_interleaves the image embeds x beams
        # (model_generation.py:420-422) and re-reads K/V per beam every step
        tz = _text_stack_zs(zs)
        decode_fn = make_bert_decode_fn(
            params["text_decoder"], self.text_cfg,
            encoder_hidden=image_embeds, encoder_atts=image_atts,
            dtype=dtype, impl=impl, **tz,
        )
        cache = B.init_bert_cache(
            params["text_decoder"], self.text_cfg, bsz * reps, max_length,
            dtype=dtype or jnp.float32,
        )
        if num_beams > 1:
            return generate_beam(
                decode_fn, cache, prompt_ids, num_beams=num_beams,
                max_length=max_length, min_length=min_length,
                eos_id=eos_id, pad_id=pad_id, repetition_penalty=repetition_penalty,
            )
        tokens, _ = generate_no_beam(
            decode_fn, cache, prompt_ids, max_length=max_length,
            min_length=min_length, eos_id=eos_id, pad_id=pad_id,
            do_sample=do_sample, top_p=top_p,
            repetition_penalty=repetition_penalty, rng=rng,
        )
        return tokens


class XVLMForVQA:
    def __init__(self, vision_cfg: VisionConfig, text_cfg: TextConfig, config: Optional[Config] = None):
        self.vision_cfg = vision_cfg
        self.text_cfg = text_cfg
        self.config = config or Config()
        self.pad_token_id = self.config.get("pad_token_id", 0)
        num_dec = self.config.get(
            "num_dec_layers", text_cfg["num_hidden_layers"] - text_cfg["fusion_layer"]
        )
        # decoder: every layer cross-attends into question states
        # (reference model_generation.py:242-249)
        self.decoder_cfg = TextConfig.create(
            **{**{k: text_cfg[k] for k in TextConfig.DEFAULTS if k in text_cfg},
               "fusion_layer": 0,
               "num_hidden_layers": num_dec,
               "encoder_width": text_cfg["hidden_size"]},
        )

    def init(self, key: Array) -> dict:
        def _init(k):
            k1, k2, k3 = jax.random.split(k, 3)
            return {
                "vision": V.init_vit(k1, self.vision_cfg),
                "text": B.init_bert(k2, self.text_cfg, with_mlm_head=False),
                "text_decoder": B.init_bert(k3, self.decoder_cfg, with_mlm_head=True),
            }

        return jax.jit(_init)(key)

    def encode_question(self, params, image, question_ids, question_atts, *, zs=None,
                        output_attentions=False, output_hidden_states=False, train=False,
                        rng=None, dtype=None, impl="xla"):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, trng = jax.random.split(rng)
        vz, tz = split_zs(zs)
        vout = V.vit_apply(
            params["vision"], image, self.vision_cfg,
            output_attentions=output_attentions, output_hidden_states=output_hidden_states,
            train=train, rng=vrng, dtype=dtype, impl=impl, **vz,
        )
        image_embeds = vout["last_hidden"]
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        qout = B.bert_apply(
            params["text"], question_ids, self.text_cfg, attention_mask=question_atts,
            encoder_hidden=image_embeds, encoder_attention_mask=image_atts,
            mode="multi_modal", output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=trng,
            dtype=dtype, impl=impl,
            text_head_z=tz.get("text_head_z"), cross_head_z=tz.get("cross_head_z"),
            text_mlp_z=tz.get("text_mlp_z"), cross_mlp_z=tz.get("cross_mlp_z"),
        )
        return qout, vout

    def forward_train(
        self, params, image, question_ids, question_atts, answer_ids, answer_atts,
        weights, k: Array, *, zs=None, rng=None, output_attentions=False,
        output_hidden_states=False, train=True, dtype=None, impl="xla",
    ):
        """Weighted answer LM loss (reference model_generation.py:307-372).

        The reference replicates question states n_b times per question
        (variable k list); for static shapes we take `k` as a precomputed
        gather index [num_answers] mapping each answer row to its question
        (built by the collate fn), matching the same semantics."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        qrng, drng = jax.random.split(rng)
        qout, vout = self.encode_question(
            params, image, question_ids, question_atts, zs=zs,
            output_attentions=output_attentions, output_hidden_states=output_hidden_states,
            train=train, rng=qrng, dtype=dtype, impl=impl,
        )
        question_states = jnp.take(qout["last_hidden"], k, axis=0)
        question_atts_rep = jnp.take(question_atts, k, axis=0)
        targets = jnp.where(answer_ids == self.pad_token_id, -100, answer_ids)

        dout = B.bert_apply(
            params["text_decoder"], answer_ids, self.decoder_cfg,
            attention_mask=answer_atts, encoder_hidden=question_states,
            encoder_attention_mask=question_atts_rep, mode="multi_modal",
            is_decoder=True, output_attentions=output_attentions,
            output_hidden_states=output_hidden_states, train=train, rng=drng,
            dtype=dtype, impl=impl, **_decoder_zs(zs),
        )
        logits = B.mlm_head_apply(params["text_decoder"]["cls"], dout["last_hidden"], self.decoder_cfg, dtype=dtype)
        per_answer = B.lm_loss(logits, targets, reduction="none")
        loss = (weights * per_answer).sum() / image.shape[0]
        if not output_hidden_states:
            return loss
        return {
            "loss": loss,
            "hidden_dict": {
                "image_hidden_states": vout["hidden_states"],
                "text_hidden_states": qout["hidden_states"],
                "decoder_hidden_states": dout["hidden_states"],
            },
            "attention_dict": {
                "image_attentions": vout["attentions"],
                "text_attentions": qout["attentions"],
                "decoder_attentions": dout["attentions"],
            },
            "cross_attention_dict": {
                "cross_attentions": qout["cross_attentions"],
                "decoder_cross_attentions": dout["cross_attentions"],
            },
            "logits_dict": {"logits": logits},
        }

    def rank_answer(
        self, params, question_states, question_atts, answer_ids, answer_atts,
        k: int, *, zs=None, dtype=None, impl="xla",
    ):
        """k-way answer re-ranking (reference model_generation.py:385-444):
        two batched decoder calls + chain-rule log-prob sum. The decoder's
        cross K/V over the question states are projected ONCE ([Q, Tq]
        rows); the k-tiled scoring call attends to them via grouped-K/V
        attention (ops/attention.py) — the k(=k_test) candidate rows per
        question share one K/V, never re-projected nor repeat-materialized."""
        num_ques = question_states.shape[0]
        num_ans = answer_ids.shape[0]
        dz = _decoder_zs(zs)

        def dec(ids, atts, enc, enc_atts, cross_kv=None):
            # k-tiled scoring rows share their question's K/V: declare the
            # group size (ids at [Q*k] vs enc at [Q]; contiguous by question)
            out = B.bert_apply(
                params["text_decoder"], ids, self.decoder_cfg, attention_mask=atts,
                encoder_hidden=enc, encoder_attention_mask=enc_atts,
                mode="multi_modal", is_decoder=True, cross_kv=cross_kv,
                encoder_groups=ids.shape[0] // enc.shape[0],
                dtype=dtype, impl=impl, **dz,
            )
            return B.mlm_head_apply(params["text_decoder"]["cls"], out["last_hidden"], self.decoder_cfg, dtype=dtype)

        kv = B.precompute_cross_kv(
            params["text_decoder"], self.decoder_cfg, question_states, dtype=dtype)

        start_ids = jnp.full((num_ques, 1), answer_ids[0, 0], jnp.int32)
        logits = dec(start_ids, None, question_states, question_atts,
                     cross_kv=kv)[:, 0]
        answer_first = answer_ids[:, 1]
        prob_first = jax.nn.softmax(logits.astype(jnp.float32), axis=1)[:, answer_first]
        topk_probs, topk_ids = jax.lax.top_k(prob_first, k)  # [Q, k]

        input_ids = jnp.take(answer_ids, topk_ids.reshape(-1), axis=0)
        input_atts = jnp.take(answer_atts, topk_ids.reshape(-1), axis=0)
        targets = jnp.where(input_ids == self.pad_token_id, -100, input_ids)

        # question states/atts stay at [Q] rows: the [Q*k] scoring rows are
        # grouped contiguously (jnp.take of topk_ids.reshape(-1) orders by
        # question), so grouped-K/V attention shares each question's K/V
        logits = dec(input_ids, input_atts, question_states, question_atts,
                     cross_kv=kv)
        answer_loss = B.lm_loss(logits, targets, reduction="none")  # [Q*k]

        log_probs_sum = jnp.log(topk_probs.reshape(-1)) - answer_loss
        log_probs_sum = log_probs_sum.reshape(num_ques, k)
        probs = jax.nn.softmax(log_probs_sum, axis=-1)
        topk_probs2, rerank_id = jax.lax.top_k(probs, k)
        topk_ids2 = jnp.take_along_axis(topk_ids, rerank_id, axis=1)
        return topk_ids2, topk_probs2

    def forward_eval(self, params, image, question_ids, question_atts, answer_ids,
                     answer_atts, *, k: int, zs=None, dtype=None, impl="xla"):
        qout, _ = self.encode_question(
            params, image, question_ids, question_atts, zs=zs, dtype=dtype, impl=impl
        )
        return self.rank_answer(
            params, qout["last_hidden"], question_atts, answer_ids, answer_atts,
            k, zs=zs, dtype=dtype, impl=impl,
        )


def _make_translation_decoder_cfg(text_cfg: TextConfig, config: Config) -> TextConfig:
    """Decoder over source embeds: fusion_layer=0 (every layer cross-attends),
    num_dec_layers deep, K/V width = text hidden, its OWN target vocab
    (the reference decodes into a chinese-roberta vocab — reference
    models/model_generation.py:461-465)."""
    num_dec = config.get(
        "num_dec_layers", text_cfg["num_hidden_layers"] - text_cfg["fusion_layer"]
    )
    return TextConfig.create(
        **{**{k: text_cfg[k] for k in TextConfig.DEFAULTS if k in text_cfg},
           "fusion_layer": 0,
           "num_hidden_layers": num_dec,
           "encoder_width": text_cfg["hidden_size"],
           "vocab_size": config.get("decoder_vocab_size", text_cfg["vocab_size"])},
    )


class _TranslationBase:
    """Shared train/decode machinery of the two multimodal-translation models
    (reference models/model_generation.py:445-716: XVLMForCrossGeneration /
    TextTranslater differ only in how the source is encoded)."""

    def __init__(self, text_cfg: TextConfig, config: Optional[Config]):
        self.text_cfg = text_cfg
        self.config = config or Config()
        self.label_smoothing = self.config.get("label_smoothing", 0.0)
        self.pad_token_id = self.config.get("pad_token_id", 0)
        self.decoder_cfg = _make_translation_decoder_cfg(text_cfg, self.config)

    # subclasses: encode_source(params, image, text_ids, text_atts, ...) -> (embeds, atts)

    def forward(
        self, params, image, text_ids, text_atts, target_ids, target_atts, *,
        rng=None, train=False, dtype=None, impl="xla",
    ):
        """Target-side LM loss; pad positions AND the BOS token are masked to
        -100 (reference model_generation.py:523-542 / :665-682)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        erng, drng = jax.random.split(rng)
        src_embeds, src_atts = self.encode_source(
            params, image, text_ids, text_atts, train=train, rng=erng,
            dtype=dtype, impl=impl,
        )
        targets = jnp.where(target_ids == self.pad_token_id, -100, target_ids)
        targets = targets.at[:, 0].set(-100)
        out = B.bert_apply(
            params["text_decoder"], target_ids, self.decoder_cfg,
            attention_mask=target_atts, encoder_hidden=src_embeds,
            encoder_attention_mask=src_atts, mode="multi_modal", is_decoder=True,
            train=train, rng=drng, dtype=dtype, impl=impl,
        )
        logits = B.mlm_head_apply(
            params["text_decoder"]["cls"], out["last_hidden"], self.decoder_cfg, dtype=dtype
        )
        return B.lm_loss(logits, targets, label_smoothing=self.label_smoothing)

    def generate(
        self, params, image, text_ids, text_atts, *, bos_id: int = 101,
        eos_id: int = 102, pad_id: int = 0, max_length: int = 40,
        min_length: int = 5, num_beams: int = 1, repetition_penalty: float = 1.0,
        rng=None, dtype=None, impl="xla",
    ) -> Array:
        """Jittable greedy/beam decode over the source embeds (reference
        model_generation.py:544-583 leans on HF generate; ours is the same
        fixed-shape scan the captioning model uses)."""
        src_embeds, src_atts = self.encode_source(
            params, image, text_ids, text_atts, dtype=dtype, impl=impl
        )
        bsz = src_embeds.shape[0]
        reps = num_beams if num_beams > 1 else 1
        # beams share the source cross K/V (grouped-K/V attention) —
        # no repeat-expansion of src states
        decode_fn = make_bert_decode_fn(
            params["text_decoder"], self.decoder_cfg,
            encoder_hidden=src_embeds, encoder_atts=src_atts, dtype=dtype, impl=impl,
        )
        cache = B.init_bert_cache(
            params["text_decoder"], self.decoder_cfg, bsz * reps, max_length,
            dtype=dtype or jnp.float32,
        )
        prompt = jnp.full((bsz, 1), bos_id, jnp.int32)
        if num_beams > 1:
            return generate_beam(
                decode_fn, cache, prompt, num_beams=num_beams,
                max_length=max_length, min_length=min_length, eos_id=eos_id,
                pad_id=pad_id, repetition_penalty=repetition_penalty,
            )
        tokens, _ = generate_no_beam(
            decode_fn, cache, prompt, max_length=max_length, min_length=min_length,
            eos_id=eos_id, pad_id=pad_id, repetition_penalty=repetition_penalty, rng=rng,
        )
        return tokens


class XVLMForCrossGeneration(_TranslationBase):
    """Generation conditioned on CROSS-MODAL embeds (multimodal translation):
    the source text runs the full multi_modal stack grounded in the image,
    and a separate-vocab causal decoder cross-attends into those states
    (reference models/model_generation.py:445-583)."""

    def __init__(self, vision_cfg: VisionConfig, text_cfg: TextConfig,
                 config: Optional[Config] = None):
        super().__init__(text_cfg, config)
        self.vision_cfg = vision_cfg

    def init(self, key: Array) -> dict:
        def _init(k):
            k1, k2, k3 = jax.random.split(k, 3)
            return {
                "vision": V.init_vit(k1, self.vision_cfg),
                "text": B.init_bert(k2, self.text_cfg, with_mlm_head=False),
                "text_decoder": B.init_bert(k3, self.decoder_cfg, with_mlm_head=True),
            }

        return jax.jit(_init)(key)

    def encode_source(self, params, image, text_ids, text_atts, *, train=False,
                      rng=None, dtype=None, impl="xla"):
        """get_cross_embeds with text_ids = full multi_modal encode over the
        image (reference models/xvlm.py:405-422)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vrng, trng = jax.random.split(rng)
        vout = V.vit_apply(
            params["vision"], image, self.vision_cfg, train=train, rng=vrng,
            dtype=dtype, impl=impl,
        )
        image_embeds = vout["last_hidden"]
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        tout = B.bert_apply(
            params["text"], text_ids, self.text_cfg, attention_mask=text_atts,
            encoder_hidden=image_embeds, encoder_attention_mask=image_atts,
            mode="multi_modal", train=train, rng=trng, dtype=dtype, impl=impl,
        )
        return tout["last_hidden"], text_atts


class TextTranslater(_TranslationBase):
    """Text-only translation baseline: the source runs ONLY the text-mode
    layers [0, fusion) — the reference notes its fusion layers stay unused —
    and the decoder cross-attends into those states (reference
    models/model_generation.py:585-716). No vision tower."""

    def __init__(self, text_cfg: TextConfig, config: Optional[Config] = None):
        super().__init__(text_cfg, config)

    def init(self, key: Array) -> dict:
        def _init(k):
            k1, k2 = jax.random.split(k)
            return {
                "text": B.init_bert(k1, self.text_cfg, with_mlm_head=False),
                "text_decoder": B.init_bert(k2, self.decoder_cfg, with_mlm_head=True),
            }

        return jax.jit(_init)(key)

    def encode_source(self, params, image, text_ids, text_atts, *, train=False,
                      rng=None, dtype=None, impl="xla"):
        del image  # parity with the reference signature; unused
        tout = B.bert_apply(
            params["text"], text_ids, self.text_cfg, attention_mask=text_atts,
            mode="text", train=train, rng=rng, dtype=dtype, impl=impl,
        )
        return tout["last_hidden"], text_atts
