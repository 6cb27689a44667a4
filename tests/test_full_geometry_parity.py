"""Full BASE-geometry forward parity vs the reference torch implementation.

The toy-config differentials in test_reference_differential.py prove the
math; this file proves the IMPORT REMAPS at the real operating point —
12L ViT-B/16 @224px + 12L BERT-base with fusion_layer 6 (reference
configs/config_clipvitB.json + models/xvlm.py:189-233) — where a
head-ordering or interleave bug invisible at 4 heads would silently
destroy quality (SURVEY §7 hard part #1, remaps models/xvlm.py:236-277).

One batch-1 forward per tower + fusion + MLM/ITM heads + ITC features,
asserted in f32 at rtol 1e-3, plus per-tensor accounting: every reference
state-dict tensor must be consumed by the remap exactly once (scalar counts
and |x|-sum totals agree — the remaps only transpose/reshape/split, all of
which preserve both).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_differential import REFERENCE, _load_ref, _sd_numpy

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference checkout not available",
)

WIDTH, LAYERS, HEADS, INTER = 768, 12, 12, 3072
IMG_RES, PATCH, FUSION, VOCAB, EMBED = 224, 16, 6, 30522, 256


def _abs_sum(tree_or_sd) -> float:
    import jax

    leaves = (tree_or_sd.values() if isinstance(tree_or_sd, dict)
              and all(isinstance(v, np.ndarray) for v in tree_or_sd.values())
              else jax.tree.leaves(tree_or_sd))
    return float(sum(np.abs(np.asarray(v, np.float64)).sum() for v in leaves))


def _n_scalars(tree) -> int:
    import jax

    return int(sum(np.asarray(v).size for v in jax.tree.leaves(tree)))


@pytest.mark.slow
def test_base_geometry_forward_and_remap_accounting():
    import torch
    import torch.nn as nn

    import jax
    import jax.numpy as jnp
    from efficientvlm_tpu.config import TextConfig, VisionConfig
    from efficientvlm_tpu.models import bert as B
    from efficientvlm_tpu.models import vit as V
    from efficientvlm_tpu.models.xvlm import mlp_head_apply
    from efficientvlm_tpu.train import checkpoint as C

    clip_vit = _load_ref("ref_clip_vit_base", "clip_vit.py")
    xbert = _load_ref("ref_xbert_base", "xbert.py")
    from transformers.models.bert.configuration_bert import BertConfig

    torch.manual_seed(0)
    ref_vit = clip_vit.CLIPVisionTransformer(
        IMG_RES, PATCH, WIDTH, "quick_gelu", HEADS, 0.0, INTER, LAYERS,
        local_attn_depth=0).eval()
    rcfg = BertConfig(
        vocab_size=VOCAB, hidden_size=WIDTH, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=512, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    rcfg.fusion_layer = FUSION
    rcfg.encoder_width = WIDTH
    ref_bert = xbert.BertForMaskedLM(rcfg).eval()
    # heads exactly as XVLMBase builds them (models/xvlm.py:189-233)
    vision_proj = nn.Linear(WIDTH, EMBED).eval()
    text_proj = nn.Linear(WIDTH, EMBED).eval()
    itm_head = nn.Sequential(
        nn.Linear(WIDTH, WIDTH * 2), nn.LayerNorm(WIDTH * 2), nn.GELU(),
        nn.Linear(WIDTH * 2, 2),
    ).eval()

    # ---- assemble the XVLMBase-shaped .th state dict ----
    sd = {}
    for mod, prefix in ((ref_vit, "vision_encoder."), (ref_bert, "text_encoder."),
                        (vision_proj, "vision_proj."), (text_proj, "text_proj."),
                        (itm_head, "itm_head.")):
        sd.update({prefix + k: v for k, v in _sd_numpy(mod).items()})
    sd["temp"] = np.asarray(0.07, np.float32)

    params = C.xvlm_params_from_state_dict(
        sd, vision_layers=LAYERS, text_layers=LAYERS, fusion_layer=FUSION,
        num_patches=(IMG_RES // PATCH) ** 2)

    # ---- per-tensor accounting: remap consumed EVERY checkpoint scalar ----
    # legitimate skips: position_ids buffers, and the tied MLM decoder bias
    # (HF stores cls.predictions.bias AND cls.predictions.decoder.bias as the
    # SAME tensor; the remap consumes it once — bert_params_from_state_dict)
    skipped = [k for k in sd if k.endswith("position_ids")]
    if "text_encoder.cls.predictions.decoder.bias" in sd:
        dup = "text_encoder.cls.predictions.bias"
        np.testing.assert_array_equal(
            sd[dup], sd["text_encoder.cls.predictions.decoder.bias"])
        skipped.append(dup)
    consumable = {k: v for k, v in sd.items() if k not in skipped}
    n_sd = int(sum(v.size for v in consumable.values()))
    n_tree = _n_scalars(params)
    assert n_tree == n_sd, (n_tree, n_sd)
    # transposes/reshapes/splits preserve the |x| mass exactly
    np.testing.assert_allclose(
        _abs_sum(params), _abs_sum(list(consumable.values())), rtol=1e-6)

    vcfg = VisionConfig.create(
        vision_width=WIDTH, num_attention_heads=HEADS, intermediate_size=INTER,
        num_hidden_layers=LAYERS, image_res=IMG_RES, patch_size=PATCH,
        hidden_act="quick_gelu",
    )
    tcfg = TextConfig.create(
        vocab_size=VOCAB, hidden_size=WIDTH, num_hidden_layers=LAYERS,
        fusion_layer=FUSION, num_attention_heads=HEADS, intermediate_size=INTER,
        encoder_width=WIDTH, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )

    rng = np.random.RandomState(7)
    img = rng.randn(1, 3, IMG_RES, IMG_RES).astype(np.float32) * 0.5
    ids = rng.randint(0, VOCAB, (1, 20)).astype(np.int64)
    ids[0, 0] = 101
    atts = np.ones((1, 20), np.int64)

    # ---- vision tower @ full 224px geometry ----
    with torch.no_grad():
        t_img = ref_vit(torch.from_numpy(img))[0].numpy()
    o_img = np.asarray(V.vit_apply(
        params["vision"], np.transpose(img, (0, 2, 3, 1)), vcfg)["last_hidden"])
    np.testing.assert_allclose(o_img, t_img, rtol=1e-3, atol=1e-3)

    # ---- text tower (text mode) + fusion (multi_modal over image states),
    #      MLM logits through the tied decoder head ----
    img_atts = np.ones((1, t_img.shape[1]), np.int64)
    with torch.no_grad():
        t_out = ref_bert.bert(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(atts),
            mode="text").last_hidden_state.numpy()
        t_mm = ref_bert.bert(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(atts),
            encoder_hidden_states=torch.from_numpy(t_img),
            encoder_attention_mask=torch.from_numpy(img_atts),
            mode="multi_modal").last_hidden_state.numpy()
        t_mlm = ref_bert(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(atts),
            encoder_hidden_states=torch.from_numpy(t_img),
            encoder_attention_mask=torch.from_numpy(img_atts),
            return_logits=True).numpy()

    o_out = np.asarray(B.bert_apply(
        params["text"], jnp.asarray(ids), tcfg, attention_mask=jnp.asarray(atts),
        mode="text")["last_hidden"])
    np.testing.assert_allclose(o_out, t_out, rtol=1e-3, atol=1e-3)

    o_mm = np.asarray(B.bert_apply(
        params["text"], jnp.asarray(ids), tcfg, attention_mask=jnp.asarray(atts),
        encoder_hidden=jnp.asarray(t_img),
        encoder_attention_mask=jnp.asarray(img_atts),
        mode="multi_modal")["last_hidden"])
    np.testing.assert_allclose(o_mm, t_mm, rtol=1e-3, atol=1e-3)

    o_mlm = np.asarray(B.mlm_head_apply(
        params["text"]["cls"], jnp.asarray(o_mm), tcfg))
    np.testing.assert_allclose(o_mlm, t_mlm, rtol=1e-3, atol=2e-3)

    # ---- ITC features + ITM head at the fusion boundary ----
    with torch.no_grad():
        t_vfeat = torch.nn.functional.normalize(
            vision_proj(torch.from_numpy(t_img[:, 0])), dim=-1).numpy()
        t_tfeat = torch.nn.functional.normalize(
            text_proj(torch.from_numpy(t_out[:, 0])), dim=-1).numpy()
        t_itm = itm_head(torch.from_numpy(t_mm[:, 0])).numpy()

    from efficientvlm_tpu.ops.basic import dense

    o_vfeat = np.asarray(dense(params["vision_proj"], jnp.asarray(o_img[:, 0])))
    o_vfeat = o_vfeat / np.linalg.norm(o_vfeat, axis=-1, keepdims=True)
    o_tfeat = np.asarray(dense(params["text_proj"], jnp.asarray(o_out[:, 0])))
    o_tfeat = o_tfeat / np.linalg.norm(o_tfeat, axis=-1, keepdims=True)
    np.testing.assert_allclose(o_vfeat, t_vfeat, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(o_tfeat, t_tfeat, rtol=1e-3, atol=1e-3)

    o_itm = np.asarray(mlp_head_apply(params["itm_head"], jnp.asarray(o_mm[:, 0])))
    np.testing.assert_allclose(o_itm, t_itm, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_base_geometry_swin_forward_and_remap_accounting():
    """Swin-B at the reference's real operating point — 224px, patch 4,
    embed 128, depths [2,2,18,2], heads [4,8,16,32], window 7 (reference
    models/xvlm.py:133-163 SwinTransformer build) — one batch-1 forward
    through swin_params_from_state_dict vs the reference torch module.
    The toy differential (test_reference_differential.py, embed 16 /
    2 stages / window 4) proves the math; this proves the remap at full
    geometry, where a stage-indexing or head-count bug invisible at 2
    heads would silently destroy quality. Plus per-tensor accounting:
    every checkpoint tensor is consumed exactly once (buffers
    relative_position_index / attn_mask are dropped by design, as the
    reference drops them at load, models/xvlm.py:160-163)."""
    import torch

    from test_reference_differential import _stub_timm

    from efficientvlm_tpu.models.swin import swin_apply, swin_config
    from efficientvlm_tpu.train import checkpoint as C

    _stub_timm()
    ref_swin = _load_ref("ref_swin_base", "swin_transformer.py")
    torch.manual_seed(4)
    depths, heads, window = [2, 2, 18, 2], [4, 8, 16, 32], 7
    ref = ref_swin.SwinTransformer(
        img_size=224, patch_size=4, embed_dim=128, depths=depths,
        num_heads=heads, window_size=window, mlp_ratio=4.0,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0, num_classes=0,
    ).eval()

    sd = _sd_numpy(ref)
    params = C.swin_params_from_state_dict(sd, depths=depths, window_size=window)

    # ---- per-tensor accounting ----
    dropped = [k for k in sd
               if "relative_position_index" in k or "attn_mask" in k]
    consumable = {k: v for k, v in sd.items() if k not in dropped}
    assert _n_scalars(params) == int(sum(v.size for v in consumable.values()))
    # same window size => the rel-bias interpolation is identity; every
    # remap op (transpose/identity) preserves |x| mass
    np.testing.assert_allclose(
        _abs_sum(params), _abs_sum(list(consumable.values())), rtol=1e-6)

    cfg = swin_config(image_res=224, patch_size=4, embed_dim=128,
                      depths=depths, num_heads=heads, window_size=window,
                      mlp_ratio=4.0)
    x = (np.random.RandomState(12).randn(1, 3, 224, 224) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(swin_apply(
        params, np.transpose(x, (0, 2, 3, 1)), cfg)["last_hidden"])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_base_geometry_deit_forward_and_remap_accounting():
    """DeiT-base at the reference's operating point — 224px, patch 16,
    12L/768/12H (reference models/xvlm.py:164-178 VisionTransformer) —
    one batch-1 forward through deit_params_from_state_dict, whose fused
    [3D, D] qkv SPLIT is exactly where a head-ordering bug would hide at
    12 heads while passing the 4-head toy differential. Plus per-tensor
    accounting (head.* absent with num_classes=0; every tensor consumed)."""
    import torch

    from test_reference_differential import _stub_timm

    from efficientvlm_tpu.config import VisionConfig
    from efficientvlm_tpu.models.deit import deit_apply
    from efficientvlm_tpu.train import checkpoint as C

    _stub_timm()
    ref_vit = _load_ref("ref_deit_base", "vit.py")
    torch.manual_seed(6)
    ref = ref_vit.VisionTransformer(
        img_size=IMG_RES, patch_size=PATCH, embed_dim=WIDTH, depth=LAYERS,
        num_heads=HEADS, mlp_ratio=4.0, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0,
    ).eval()

    sd = _sd_numpy(ref)
    cfg = VisionConfig.create(
        vision_width=WIDTH, num_attention_heads=HEADS, intermediate_size=INTER,
        num_hidden_layers=LAYERS, image_res=IMG_RES, patch_size=PATCH,
    )
    params = C.deit_params_from_state_dict(sd, LAYERS, num_patches=cfg.num_patches)
    assert _n_scalars(params) == int(sum(v.size for v in sd.values()))
    np.testing.assert_allclose(_abs_sum(params), _abs_sum(list(sd.values())),
                               rtol=1e-6)

    x = (np.random.RandomState(13).randn(1, 3, IMG_RES, IMG_RES) * 0.5
         ).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(deit_apply(
        params, np.transpose(x, (0, 2, 3, 1)), cfg)["last_hidden"])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_base_geometry_cached_decoder_parity():
    """The serving hot loop at the real operating point: BertLMHeadModel as
    a cached causal decoder at 12L/768/12H with fusion_layer 6 (the
    captioning/VQA decoder geometry, reference eff_bert.py:1084-1087 HF
    use_cache path) vs our fixed-size functional cache + precomputed cross
    K/V (generation.make_bert_decode_fn). A head-interleave or
    position-offset bug invisible at 4 heads would surface here. Prompt of
    3 tokens, then 4 single-token cached steps; per-step last-token logits
    asserted in f32, plus greedy-argmax agreement."""
    import torch

    import jax.numpy as jnp
    from efficientvlm_tpu.config import TextConfig
    from efficientvlm_tpu.generation import make_bert_decode_fn
    from efficientvlm_tpu.models import bert as B
    from efficientvlm_tpu.train import checkpoint as C

    xbert = _load_ref("ref_xbert_base_decode", "xbert.py")
    from transformers.models.bert.configuration_bert import BertConfig

    torch.manual_seed(11)
    rcfg = BertConfig(
        vocab_size=VOCAB, hidden_size=WIDTH, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=512, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    rcfg.fusion_layer = FUSION
    rcfg.encoder_width = WIDTH
    ref = xbert.BertLMHeadModel(rcfg).eval()

    params = C.bert_params_from_state_dict(
        _sd_numpy(ref), LAYERS, FUSION, with_mlm_head=True)
    cfg = TextConfig.create(
        vocab_size=VOCAB, hidden_size=WIDTH, num_hidden_layers=LAYERS,
        fusion_layer=FUSION, num_attention_heads=HEADS,
        intermediate_size=INTER, encoder_width=WIDTH,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )

    rng = np.random.RandomState(3)
    n_img_tokens = (IMG_RES // PATCH) ** 2 + 1  # 197: the real cross width
    enc = (rng.randn(2, n_img_tokens, WIDTH) * 0.4).astype(np.float32)
    enc_atts = np.ones((2, n_img_tokens), np.int64)
    tokens = rng.randint(1, VOCAB, (2, 7)).astype(np.int64)
    tokens[:, 0] = 101

    with torch.no_grad():
        out = ref(torch.from_numpy(tokens[:, :3]),
                  attention_mask=torch.ones(2, 3, dtype=torch.long),
                  encoder_hidden_states=torch.from_numpy(enc),
                  encoder_attention_mask=torch.from_numpy(enc_atts),
                  is_decoder=True, use_cache=True, return_dict=True)
        ref_logits = [out.logits[:, -1].numpy()]
        past = out.past_key_values
        for t in range(3, 7):
            out = ref(torch.from_numpy(tokens[:, t:t + 1]),
                      attention_mask=torch.ones(2, t + 1, dtype=torch.long),
                      encoder_hidden_states=torch.from_numpy(enc),
                      encoder_attention_mask=torch.from_numpy(enc_atts),
                      is_decoder=True, use_cache=True, past_key_values=past,
                      return_dict=True)
            ref_logits.append(out.logits[:, -1].numpy())
            past = out.past_key_values

    decode_fn = make_bert_decode_fn(
        params, cfg, encoder_hidden=jnp.asarray(enc),
        encoder_atts=jnp.asarray(enc_atts))
    cache = B.init_bert_cache(params, cfg, 2, max_len=8)
    logits, cache = decode_fn(jnp.asarray(tokens[:, :3]), cache, 0)
    got = [np.asarray(logits[:, -1])]
    for t in range(3, 7):
        logits, cache = decode_fn(jnp.asarray(tokens[:, t:t + 1]), cache, t)
        got.append(np.asarray(logits[:, -1]))

    for step, (g, w) in enumerate(zip(got, ref_logits)):
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=2e-3,
                                   err_msg=f"step {step}")
        np.testing.assert_array_equal(g.argmax(-1), w.argmax(-1),
                                      err_msg=f"greedy step {step}")
