"""Multimodal-translation models (reference model_generation.py:445-716):
XVLMForCrossGeneration / TextTranslater forward + generate + the
decoder-from-fusion-layers checkpoint init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.models.model_generation import TextTranslater, XVLMForCrossGeneration
from efficientvlm_tpu.models.xvlm import XVLM
from efficientvlm_tpu.train.checkpoint import (
    crossgen_params_from_state_dict,
    xvlm_state_dict_from_params,
)

VCFG = dict(
    vision_width=24, num_attention_heads=4, intermediate_size=48,
    num_hidden_layers=2, image_res=16, patch_size=8,
)
TCFG = dict(
    vocab_size=40, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
    intermediate_size=64, encoder_width=24, max_position_embeddings=32,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


@pytest.fixture(scope="module")
def batch():
    image = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    src_ids = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 3, 40)
    src_atts = jnp.ones((2, 6), jnp.int32)
    tgt_ids = jax.random.randint(jax.random.PRNGKey(4), (2, 7), 3, 55)
    tgt_ids = tgt_ids.at[:, 0].set(1).at[1, 5:].set(0)  # BOS + padding tail
    tgt_atts = (tgt_ids != 0).astype(jnp.int32)
    return image, src_ids, src_atts, tgt_ids, tgt_atts


def test_cross_generation_forward_and_generate(batch):
    image, src_ids, src_atts, tgt_ids, tgt_atts = batch
    model = XVLMForCrossGeneration(
        VisionConfig.create(**VCFG), TextConfig.create(**TCFG),
        Config({"decoder_vocab_size": 55, "num_dec_layers": 2, "label_smoothing": 0.1}),
    )
    params = model.init(jax.random.PRNGKey(0))
    assert params["text_decoder"]["embeddings"]["word"]["embedding"].shape[0] == 55
    assert len(params["text_decoder"]["layers"]) == 2

    loss, grads = jax.value_and_grad(
        lambda p: model.forward(p, image, src_ids, src_atts, tgt_ids, tgt_atts)
    )(params)
    assert np.isfinite(float(loss))
    # the decoder's cross-attention receives gradient (conditioning is live)
    gnorm = jnp.linalg.norm(
        grads["text_decoder"]["layers"][0]["crossattention"]["k"]["kernel"]
    )
    assert float(gnorm) > 0

    toks = jax.jit(
        lambda p: model.generate(
            p, image, src_ids, src_atts, bos_id=1, eos_id=2, pad_id=0,
            max_length=8, min_length=2, num_beams=2,
        )
    )(params)
    assert toks.shape == (2, 8)
    assert int(jnp.max(toks)) < 55


def test_text_translater_forward_and_generate(batch):
    image, src_ids, src_atts, tgt_ids, tgt_atts = batch
    model = TextTranslater(
        TextConfig.create(**TCFG), Config({"decoder_vocab_size": 55, "num_dec_layers": 2})
    )
    params = model.init(jax.random.PRNGKey(0))
    assert "vision" not in params
    loss = model.forward(params, None, src_ids, src_atts, tgt_ids, tgt_atts)
    assert np.isfinite(float(loss))
    toks = model.generate(params, None, src_ids, src_atts, bos_id=1, eos_id=2,
                          pad_id=0, max_length=8, min_length=2)
    assert toks.shape == (2, 8)


def test_crossgen_checkpoint_init(batch):
    """Decoder layer i initialized from text layer fusion+i; word embeddings
    and cls stay fresh (different target vocab) — reference
    model_generation.py:470-521. Widths matched here so cross K/V copy."""
    vcfg = VisionConfig.create(**{**VCFG, "vision_width": 32, "intermediate_size": 64})
    tcfg = TextConfig.create(**{**TCFG, "encoder_width": 32})
    src = XVLM(vcfg, tcfg, Config({"embed_dim": 8}))
    src_params = src.init(jax.random.PRNGKey(7))
    sd = xvlm_state_dict_from_params(src_params, fusion_layer=tcfg["fusion_layer"])

    model = XVLMForCrossGeneration(
        vcfg, tcfg, Config({"decoder_vocab_size": 55, "num_dec_layers": 2})
    )
    fresh = model.init(jax.random.PRNGKey(1))
    params = crossgen_params_from_state_dict(
        sd, fresh, vision_layers=vcfg["num_hidden_layers"],
        text_layers=tcfg["num_hidden_layers"], fusion_layer=tcfg["fusion_layer"],
        num_dec_layers=2,
    )
    fl = tcfg["fusion_layer"]
    np.testing.assert_allclose(
        np.asarray(params["text_decoder"]["layers"][0]["attention"]["q"]["kernel"]),
        np.asarray(src_params["text"]["layers"][fl]["attention"]["q"]["kernel"]),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(params["text_decoder"]["layers"][1]["crossattention"]["v"]["kernel"]),
        np.asarray(src_params["text"]["layers"][fl + 1]["crossattention"]["v"]["kernel"]),
        rtol=0, atol=0,
    )
    # fresh target-vocab pieces survive the merge
    np.testing.assert_allclose(
        np.asarray(params["text_decoder"]["embeddings"]["word"]["embedding"]),
        np.asarray(fresh["text_decoder"]["embeddings"]["word"]["embedding"]),
        rtol=0, atol=0,
    )
    assert params["text_decoder"]["cls"] is fresh["text_decoder"]["cls"]
    # the loaded tree runs
    image, src_ids, src_atts, tgt_ids, tgt_atts = batch
    loss = model.forward(params, image, src_ids, src_atts, tgt_ids, tgt_atts)
    assert np.isfinite(float(loss))


def test_crossgen_checkpoint_init_width_mismatch():
    """When the checkpoint's cross K/V width differs from the decoder's
    (vision 24 vs text hidden 32), the K/V stay at the fresh init — the
    reference deletes those keys (model_generation.py:491-495)."""
    vcfg = VisionConfig.create(**VCFG)
    tcfg = TextConfig.create(**TCFG)  # encoder_width 24 != hidden 32
    src = XVLM(vcfg, tcfg, Config({"embed_dim": 8}))
    sd = xvlm_state_dict_from_params(
        src.init(jax.random.PRNGKey(7)), fusion_layer=tcfg["fusion_layer"]
    )
    model = XVLMForCrossGeneration(
        vcfg, tcfg, Config({"decoder_vocab_size": 55, "num_dec_layers": 2})
    )
    fresh = model.init(jax.random.PRNGKey(1))
    params = crossgen_params_from_state_dict(
        sd, fresh, vision_layers=vcfg["num_hidden_layers"],
        text_layers=tcfg["num_hidden_layers"], fusion_layer=tcfg["fusion_layer"],
        num_dec_layers=2,
    )
    np.testing.assert_allclose(
        np.asarray(params["text_decoder"]["layers"][0]["crossattention"]["k"]["kernel"]),
        np.asarray(fresh["text_decoder"]["layers"][0]["crossattention"]["k"]["kernel"]),
        rtol=0, atol=0,
    )
