"""Encoder unit tests: shapes, mode equivalence, gates, KV cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models import bert as B
from efficientvlm_tpu.models import vit as V


@pytest.fixture(scope="module")
def vit_setup():
    cfg = VisionConfig.create(
        vision_width=64,
        num_attention_heads=4,
        intermediate_size=128,
        num_hidden_layers=3,
        local_attn_depth=1,
        image_res=32,
        patch_size=8,
    )
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def bert_setup():
    cfg = TextConfig.create(
        vocab_size=100,
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        encoder_width=48,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    params = B.init_bert(jax.random.PRNGKey(1), cfg, with_mlm_head=True)
    return cfg, params


def test_vit_shapes(vit_setup):
    cfg, params = vit_setup
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    out = V.vit_apply(params, imgs, cfg, output_attentions=True, output_hidden_states=True)
    n_tok = (32 // 8) ** 2 + 1
    assert out["last_hidden"].shape == (2, n_tok, 64)
    assert len(out["hidden_states"]) == cfg["num_hidden_layers"] + 1
    assert len(out["attentions"]) == cfg["num_hidden_layers"]
    assert out["attentions"][0].shape == (2, 4, n_tok, n_tok)
    # probs sum to 1
    np.testing.assert_allclose(
        np.asarray(out["attentions"][0].sum(-1)), 1.0, rtol=1e-5
    )


def test_vit_gates_ones_noop(vit_setup):
    cfg, params = vit_setup
    imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    base = V.vit_apply(params, imgs, cfg)["last_hidden"]
    L, H, I = cfg["num_hidden_layers"], 4, 128
    gated = V.vit_apply(
        params,
        imgs,
        cfg,
        head_z=jnp.ones((L, H)),
        head_layer_z=jnp.ones((L,)),
        mlp_z=jnp.ones((L, I)),
    )["last_hidden"]
    np.testing.assert_allclose(np.asarray(base), np.asarray(gated), atol=1e-5)


def test_vit_head_gate_zero_changes(vit_setup):
    cfg, params = vit_setup
    imgs = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    L, H = cfg["num_hidden_layers"], 4
    hz = jnp.ones((L, H)).at[0, 0].set(0.0)
    base = V.vit_apply(params, imgs, cfg)["last_hidden"]
    gated = V.vit_apply(params, imgs, cfg, head_z=hz)["last_hidden"]
    assert not np.allclose(np.asarray(base), np.asarray(gated))


def test_vit_region_grouping(vit_setup):
    cfg, params = vit_setup
    imgs = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    n_tok = (32 // 8) ** 2 + 1
    idx = jnp.array([0, 0, 1])  # 3 regions over 2 images
    atts = jnp.ones((3, n_tok))
    out = V.vit_apply(params, imgs, cfg, idx_to_group_img=idx, image_atts=atts)
    assert out["last_hidden"].shape == (3, n_tok, 64)
    assert out["full_atts_hidden"].shape == (2, n_tok, 64)


def test_bert_mode_equivalence(bert_setup):
    """text-then-fusion must equal one multi_modal pass (xbert.py:558-567)."""
    cfg, params = bert_setup
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 10), 0, 100)
    mask = jnp.ones((2, 10), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(6), (2, 7, 48))
    enc_mask = jnp.ones((2, 7), jnp.int32)

    text_out = B.bert_apply(params, ids, cfg, attention_mask=mask, mode="text")
    fusion_out = B.bert_apply(
        params, None, cfg,
        inputs_embeds=text_out["last_hidden"], attention_mask=mask,
        encoder_hidden=enc, encoder_attention_mask=enc_mask, mode="fusion",
    )
    mm_out = B.bert_apply(
        params, ids, cfg, attention_mask=mask,
        encoder_hidden=enc, encoder_attention_mask=enc_mask, mode="multi_modal",
    )
    np.testing.assert_allclose(
        np.asarray(fusion_out["last_hidden"]),
        np.asarray(mm_out["last_hidden"]),
        atol=1e-5,
    )


def test_bert_cross_gates(bert_setup):
    cfg, params = bert_setup
    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 10), 0, 100)
    mask = jnp.ones((2, 10), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(8), (2, 7, 48))
    enc_mask = jnp.ones((2, 7), jnp.int32)
    Lc, H, I = 2, 4, 128
    ones = dict(
        text_head_z=jnp.ones((2, H)),
        cross_head_z=jnp.ones((Lc, 2, H)),
        text_mlp_z=jnp.ones((2, I)),
        cross_mlp_z=jnp.ones((Lc, I)),
    )
    base = B.bert_apply(
        params, ids, cfg, attention_mask=mask,
        encoder_hidden=enc, encoder_attention_mask=enc_mask,
    )["last_hidden"]
    gated = B.bert_apply(
        params, ids, cfg, attention_mask=mask,
        encoder_hidden=enc, encoder_attention_mask=enc_mask, **ones,
    )["last_hidden"]
    np.testing.assert_allclose(np.asarray(base), np.asarray(gated), atol=1e-5)

    # zero a cross-attn head -> output changes
    chz = jnp.ones((Lc, 2, H)).at[0, 1, 0].set(0.0)
    gated2 = B.bert_apply(
        params, ids, cfg, attention_mask=mask,
        encoder_hidden=enc, encoder_attention_mask=enc_mask,
        cross_head_z=chz,
    )["last_hidden"]
    assert not np.allclose(np.asarray(base), np.asarray(gated2))


def test_decoder_kv_cache_matches_full_forward(bert_setup):
    """Cached one-token-at-a-time decode == full causal forward."""
    cfg, params = bert_setup
    T = 8
    ids = jax.random.randint(jax.random.PRNGKey(9), (2, T), 0, 100)
    enc = jax.random.normal(jax.random.PRNGKey(10), (2, 7, 48))
    enc_mask = jnp.ones((2, 7), jnp.int32)

    full = B.bert_apply(
        params, ids, cfg, attention_mask=jnp.ones((2, T), jnp.int32),
        encoder_hidden=enc, encoder_attention_mask=enc_mask,
        is_decoder=True,
    )["last_hidden"]

    cache = B.init_bert_cache(params, cfg, 2, T)
    outs = []
    for t in range(T):
        step = B.bert_apply(
            params, ids[:, t : t + 1], cfg,
            encoder_hidden=enc, encoder_attention_mask=enc_mask,
            is_decoder=True, cache=cache, position_offset=t,
        )
        cache = step["cache"]
        outs.append(step["last_hidden"])
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=1e-4)


def test_mlm_head_and_losses(bert_setup):
    cfg, params = bert_setup
    ids = jax.random.randint(jax.random.PRNGKey(11), (2, 10), 0, 100)
    out = B.bert_apply(params, ids, cfg, attention_mask=jnp.ones((2, 10), jnp.int32), mode="text")
    pos = jnp.array([[1, 3], [2, 4]])
    gathered = B.gather_seq_out_by_pos(out["last_hidden"], pos)
    logits = B.mlm_head_apply(params["cls"], gathered, cfg)
    assert logits.shape == (2, 2, 100)
    labels = jnp.array([[5, -100], [7, 9]])
    loss = B.cross_entropy_ignore_index(logits, labels)
    assert loss.shape == () and np.isfinite(loss)

    # label smoothing reduces confidence penalty vs plain CE on one-hot-correct
    ls = B.label_smooth_cross_entropy(logits, labels, smoothing=0.1)
    assert np.isfinite(ls)

    lm = B.lm_loss(logits=jax.random.normal(jax.random.PRNGKey(12), (2, 10, 100)),
                   labels=jnp.where(jnp.arange(10)[None] < 5, ids, -100),
                   label_smoothing=0.1)
    assert np.isfinite(lm)


def test_pos_embed_interpolation():
    pe = jnp.asarray(np.random.RandomState(0).randn(17, 8), jnp.float32)  # 4x4+1
    out = V.interpolate_pos_embed(pe, 64)  # -> 8x8
    assert out.shape == (65, 8)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pe[0]))
