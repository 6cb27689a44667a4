"""Task-specific checkpoint remaps: decoder-from-cross-layers (VQA),
encoder->decoder copy (captioning), cross-layer duplication (NLVR)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.models.xvlm import XVLM
from efficientvlm_tpu.train import checkpoint as C


def _mk():
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=50, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=16,
    )
    model = XVLM(vcfg, tcfg, Config({"embed_dim": 16}))
    params = model.init(jax.random.PRNGKey(0))
    sd = C.xvlm_state_dict_from_params(params, fusion_layer=2)
    return params, sd


def _eq(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vqa_decoder_from_cross_layers():
    params, sd = _mk()
    out = C.vqa_params_from_state_dict(
        sd, vision_layers=2, text_layers=4, fusion_layer=2, num_dec_layers=2,
    )
    # decoder layer i == text layer fusion+i (self attention weights)
    for i in range(2):
        _eq(out["text_decoder"]["layers"][i]["attention"]["q"]["kernel"],
            params["text"]["layers"][2 + i]["attention"]["q"]["kernel"])
        _eq(out["text_decoder"]["layers"][i]["crossattention"]["k"]["kernel"],
            params["text"]["layers"][2 + i]["crossattention"]["k"]["kernel"])
    # decoder inherits the MLM head
    _eq(out["text_decoder"]["cls"]["decoder"]["kernel"], params["text"]["cls"]["decoder"]["kernel"])
    # question encoder keeps the full stack
    assert len(out["text"]["layers"]) == 4


def test_vqa_shaped_checkpoint_loads_stored_decoder():
    """A fine-tuned VQA checkpoint carries its own text_decoder.* keys: the
    remap must load THAT decoder, not rebuild it from the cross layers
    (reference load_pretrained(is_eval=True), Eff_VQA.py:311 — --evaluate /
    --load_vqa_pretrain)."""
    params, sd = _mk()
    # synthesize a VQA-shaped checkpoint: decoder weights that differ from
    # every text layer
    marked = {}
    for k, v in sd.items():
        if k.startswith("text_encoder.encoder.layer.2."):
            dk = k.replace("text_encoder.encoder.layer.2.",
                           "text_decoder.bert.encoder.layer.0.")
            marked[dk] = np.asarray(v) + 7.0
        if k.startswith("text_encoder.encoder.layer.3."):
            dk = k.replace("text_encoder.encoder.layer.3.",
                           "text_decoder.bert.encoder.layer.1.")
            marked[dk] = np.asarray(v) + 7.0
        if k.startswith("text_encoder.cls."):
            marked[k.replace("text_encoder.", "text_decoder.")] = np.asarray(v) + 7.0
        if k.startswith("text_encoder.embeddings."):
            marked[k.replace("text_encoder.embeddings.",
                             "text_decoder.bert.embeddings.")] = np.asarray(v)
    out = C.vqa_params_from_state_dict(
        {**sd, **marked}, vision_layers=2, text_layers=4, fusion_layer=2,
        num_dec_layers=2, use_stored_decoder=True,
    )
    _eq(out["text_decoder"]["layers"][0]["attention"]["q"]["kernel"],
        np.asarray(params["text"]["layers"][2]["attention"]["q"]["kernel"]) + 7.0)
    _eq(out["text_decoder"]["layers"][1]["attention"]["q"]["kernel"],
        np.asarray(params["text"]["layers"][3]["attention"]["q"]["kernel"]) + 7.0)
    # without the flag (plain fine-tune) the reference re-derives the
    # decoder from the cross layers even when decoder keys exist
    out2 = C.vqa_params_from_state_dict(
        {**sd, **marked}, vision_layers=2, text_layers=4, fusion_layer=2,
        num_dec_layers=2,
    )
    _eq(out2["text_decoder"]["layers"][0]["attention"]["q"]["kernel"],
        params["text"]["layers"][2]["attention"]["q"]["kernel"])


def test_captioning_decoder_copy():
    params, sd = _mk()
    out = C.captioning_params_from_state_dict(
        sd, vision_layers=2, text_layers=4, fusion_layer=2,
    )
    for i in range(4):
        _eq(out["text_decoder"]["layers"][i]["attention"]["q"]["kernel"],
            params["text"]["layers"][i]["attention"]["q"]["kernel"])
    assert "crossattention" in out["text_decoder"]["layers"][2]


def test_nlvr_duplication_on_load():
    params, sd = _mk()
    out = C.nlvr_params_from_state_dict(
        sd, vision_layers=2, text_layers=4, fusion_layer=2,
    )
    layers = out["text"]["layers"]
    assert len(layers) == 2 + 2 * 2
    # cross layer i duplicated into 2i / 2i+1
    for i in range(2):
        src = params["text"]["layers"][2 + i]
        _eq(layers[2 + 2 * i]["attention"]["q"]["kernel"], src["attention"]["q"]["kernel"])
        _eq(layers[2 + 2 * i + 1]["attention"]["q"]["kernel"], src["attention"]["q"]["kernel"])
        _eq(layers[2 + 2 * i]["crossattention"]["k"]["kernel"], src["crossattention"]["k"]["kernel"])
