"""lax.scan-over-layers parity: scanned encoders (now the default for
drivers' students AND teachers) must match the unrolled loop, and must
fall back to unrolling for post-export models whose per-layer shapes
differ (ops/basic.py:uniform_layers guard)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models import bert as B
from efficientvlm_tpu.models import vit as V

VKW = dict(
    vision_width=32, num_attention_heads=4, intermediate_size=64,
    num_hidden_layers=3, image_res=16, patch_size=8,
)
TKW = dict(
    vocab_size=60, hidden_size=32, num_hidden_layers=4, fusion_layer=2,
    num_attention_heads=4, intermediate_size=64, encoder_width=32,
    max_position_embeddings=16,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


def test_vit_scan_matches_unrolled_with_gates():
    cfg_s = VisionConfig.create(scan_layers=True, **VKW)
    cfg_u = VisionConfig.create(**VKW)
    params = V.init_vit(jax.random.PRNGKey(0), cfg_s)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1
    head_z = jnp.asarray([[1, 0.5, 1, 0], [1, 1, 0.25, 1], [0, 1, 1, 1]], jnp.float32)
    mlp_z = (jax.random.uniform(jax.random.PRNGKey(2), (3, 64)) > 0.3).astype(jnp.float32)
    head_layer_z = jnp.asarray([1.0, 0.7, 1.0])
    kw = dict(head_z=head_z, mlp_z=mlp_z, head_layer_z=head_layer_z,
              output_attentions=True, output_hidden_states=True)
    a = V.vit_apply(params, imgs, cfg_u, **kw)
    b = V.vit_apply(params, imgs, cfg_s, **kw)
    np.testing.assert_allclose(np.asarray(a["last_hidden"]), np.asarray(b["last_hidden"]), atol=2e-5)
    for pa, pb in zip(a["attentions"], b["attentions"]):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=2e-5)
    for ha, hb in zip(a["hidden_states"], b["hidden_states"]):
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=2e-5)


def test_bert_scan_matches_unrolled_with_gates():
    cfg_s = TextConfig.create(scan_layers=True, **TKW)
    cfg_u = TextConfig.create(**TKW)
    params = B.init_bert(jax.random.PRNGKey(0), cfg_s)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 60)
    atts = jnp.ones((2, 9), jnp.int32).at[0, 6:].set(0)
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32)) * 0.1
    enc_atts = jnp.ones((2, 5), jnp.int32)
    text_head_z = jnp.asarray([[1, 0, 1, 1], [1, 1, 1, 0.5]], jnp.float32)
    cross_head_z = jnp.stack([
        jnp.asarray([[1, 1, 0, 1], [0.5, 1, 1, 1]], jnp.float32),  # self
        jnp.asarray([[1, 0.25, 1, 1], [1, 1, 0, 1]], jnp.float32),  # cross
    ], axis=1)  # [Lc, 2, H]
    kw = dict(attention_mask=atts, encoder_hidden=enc, encoder_attention_mask=enc_atts,
              text_head_z=text_head_z, cross_head_z=cross_head_z,
              output_attentions=True, output_hidden_states=True)
    a = B.bert_apply(params, ids, cfg_u, **kw)
    b = B.bert_apply(params, ids, cfg_s, **kw)
    np.testing.assert_allclose(np.asarray(a["last_hidden"]), np.asarray(b["last_hidden"]), atol=2e-5)
    for pa, pb in zip(a["attentions"], b["attentions"]):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=2e-5)
    for pa, pb in zip(a["cross_attentions"], b["cross_attentions"]):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=2e-5)


def test_scan_falls_back_for_nonuniform_pruned_layers():
    """scan_layers=True on a physically-pruned model (per-layer widths) must
    take the unrolled path — jnp.stack over non-uniform layer params would
    crash — and still produce the exact unrolled numbers."""
    cfg_s = VisionConfig.create(scan_layers=True, **VKW)
    cfg_u = VisionConfig.create(**VKW)
    params = V.init_vit(jax.random.PRNGKey(0), cfg_s)
    # physically slice layer 1's FFN to half width: shapes now differ
    l1 = params["layers"][1]["mlp"]
    l1["fc1"] = {"kernel": l1["fc1"]["kernel"][:, :32], "bias": l1["fc1"]["bias"][:32]}
    l1["fc2"] = {"kernel": l1["fc2"]["kernel"][:32, :], "bias": l1["fc2"]["bias"]}
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1
    a = V.vit_apply(params, imgs, cfg_u)["last_hidden"]
    b = V.vit_apply(params, imgs, cfg_s)["last_hidden"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_fusion_grouped_kv_matches_expanded():
    """Fusion mode with UNEXPANDED encoder rows (the k_test-tiled rerank
    layout: k candidate texts per image share its cross K/V via grouped-K/V
    attention) must match the repeat-expanded forward, scanned AND unrolled."""
    cfg_s = TextConfig.create(scan_layers=True, **TKW)
    cfg_u = TextConfig.create(**TKW)
    params = B.init_bert(jax.random.PRNGKey(0), cfg_s)
    b, k = 2, 3
    txt = jax.random.normal(jax.random.PRNGKey(3), (b * k, 9, 32)) * 0.1
    atts = jnp.ones((b * k, 9), jnp.int32).at[0, 6:].set(0)
    enc = jax.random.normal(jax.random.PRNGKey(2), (b, 5, 32)) * 0.1
    enc_atts = jnp.ones((b, 5), jnp.int32).at[1, 4:].set(0)
    enc_rep = jnp.repeat(enc, k, axis=0)
    enc_atts_rep = jnp.repeat(enc_atts, k, axis=0)

    outs = {}
    for name, cfg, e, ea, g in [
        ("scan_grouped", cfg_s, enc, enc_atts, k),
        ("unrolled_grouped", cfg_u, enc, enc_atts, k),
        ("scan_expanded", cfg_s, enc_rep, enc_atts_rep, 1),
        ("unrolled_expanded", cfg_u, enc_rep, enc_atts_rep, 1),
    ]:
        outs[name] = np.asarray(B.bert_apply(
            params, None, cfg, inputs_embeds=txt, attention_mask=atts,
            encoder_hidden=e, encoder_attention_mask=ea, mode="fusion",
            encoder_groups=g,
        )["last_hidden"])
    for name in ("unrolled_grouped", "scan_expanded", "unrolled_expanded"):
        np.testing.assert_allclose(outs["scan_grouped"], outs[name], atol=2e-5,
                                   err_msg=name)
