"""Fused QKV+attention+out-proj kernel: equivalence in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models import bert as B
from efficientvlm_tpu.models import vit as V
from efficientvlm_tpu.ops.attention import init_attention, make_attention_bias, multi_head_attention
from efficientvlm_tpu.ops.pallas_fused_mha import fused_self_attention


def test_fused_matches_reference_with_mask_and_gates():
    D, H = 128, 2  # head_dim 64 -> exercises the aligned group loop
    params = init_attention(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 11, D)) * 0.05
    mask = jnp.ones((2, 11), jnp.int32).at[1, 7:].set(0)
    hz = jnp.asarray([1.0, 0.25])

    ref, _, _ = multi_head_attention(
        params, x, num_heads=H, bias=make_attention_bias(mask), head_z=hz
    )
    out = fused_self_attention(params, x, num_heads=H, mask=mask, head_z=hz)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=3e-5)


def test_vit_impl_fused_equals_xla():
    cfg = VisionConfig.create(
        vision_width=64, num_attention_heads=1, intermediate_size=96,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    a = V.vit_apply(params, imgs, cfg, impl="xla")["last_hidden"]
    b = V.vit_apply(params, imgs, cfg, impl="fused")["last_hidden"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_bert_impl_fused_equals_xla():
    cfg = TextConfig.create(
        vocab_size=60, hidden_size=64, num_hidden_layers=2, num_attention_heads=1,
        intermediate_size=96, encoder_width=48, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = B.init_bert(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 60)
    atts = jnp.ones((2, 9), jnp.int32).at[0, 6:].set(0)
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 48))
    enc_atts = jnp.ones((2, 5), jnp.int32)
    kw = dict(attention_mask=atts, encoder_hidden=enc, encoder_attention_mask=enc_atts)
    a = B.bert_apply(params, ids, cfg, impl="xla", **kw)["last_hidden"]
    b = B.bert_apply(params, ids, cfg, impl="fused", **kw)["last_hidden"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fused_rectangular_pruned_widths():
    """Physically-pruned attention (q kernel [D, A], A < D) through the
    fused kernel must match the XLA path — this is the pruned-export
    inference configuration (prune_xvlm_params), which the kernel used to
    mis-tile when it derived head_dim from the hidden width."""
    D, H = 128, 2
    params = init_attention(jax.random.PRNGKey(0), D, H)
    # slice away head 1 -> A = 64, one head of head_dim 64
    pruned = {
        name: {"kernel": params[name]["kernel"][:, :64], "bias": params[name]["bias"][:64]}
        for name in ("q", "k", "v")
    }
    pruned["out"] = {"kernel": params["out"]["kernel"][:64, :], "bias": params["out"]["bias"]}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 11, D)) * 0.05
    mask = jnp.ones((2, 11), jnp.int32).at[1, 7:].set(0)

    ref, _, _ = multi_head_attention(
        pruned, x, num_heads=1, bias=make_attention_bias(mask))
    out = fused_self_attention(pruned, x, num_heads=1, mask=mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=3e-5)


def test_vit_fused_equals_xla_after_prune():
    """End-to-end: pruned-export ViT, fused impl == xla impl."""
    from efficientvlm_tpu.pruning.export import prune_vit_params

    cfg = VisionConfig.create(
        vision_width=128, num_attention_heads=2, intermediate_size=128,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    zs = {
        "vision_head_z": np.asarray([[1.0, 0.0], [1.0, 1.0]]),
        "vision_intermediate_z": np.ones((2, 128), np.float32),
    }
    pruned = prune_vit_params(params, zs, head_dim=64)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    a = V.vit_apply(pruned, imgs, cfg, impl="xla")["last_hidden"]
    b = V.vit_apply(pruned, imgs, cfg, impl="fused")["last_hidden"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fused_cross_attention_matches_reference():
    """Queries from text, K/V from the image sequence (ITM-rescore path),
    with per-key mask and head gates."""
    from efficientvlm_tpu.ops.pallas_fused_mha import fused_cross_attention

    D, De, H = 128, 64, 2
    params = init_attention(jax.random.PRNGKey(0), D, H, kv_width=De)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, D)) * 0.05
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 17, De)) * 0.05
    mask = jnp.ones((2, 17), jnp.int32).at[1, 11:].set(0)
    hz = jnp.asarray([0.5, 1.0])

    ref, _, _ = multi_head_attention(
        params, x, enc, num_heads=H, bias=make_attention_bias(mask), head_z=hz)
    out = fused_cross_attention(params, x, enc, num_heads=H, mask=mask, head_z=hz)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=3e-5)


def test_fused_cross_attention_pruned_width():
    from efficientvlm_tpu.ops.pallas_fused_mha import fused_cross_attention

    D, De, H = 128, 64, 2
    params = init_attention(jax.random.PRNGKey(0), D, H, kv_width=De)
    pruned = {
        name: {"kernel": params[name]["kernel"][:, :64], "bias": params[name]["bias"][:64]}
        for name in ("q", "k", "v")
    }
    pruned["out"] = {"kernel": params["out"]["kernel"][:64, :], "bias": params["out"]["bias"]}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, D)) * 0.05
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 17, De)) * 0.05

    ref, _, _ = multi_head_attention(pruned, x, enc, num_heads=1)
    out = fused_cross_attention(pruned, x, enc, num_heads=1)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=3e-5)


def test_fused_self_probs_match_reference():
    """Probs-emitting variant (the KD hot-loop unlock): out AND softmax maps
    must match the XLA path (ops/attention.py:128-131)."""
    from efficientvlm_tpu.ops.pallas_fused_mha import fused_self_attention as fsa

    D, H = 128, 2
    params = init_attention(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 11, D)) * 0.05
    mask = jnp.ones((2, 11), jnp.int32).at[1, 7:].set(0)
    hz = jnp.asarray([1.0, 0.25])

    ref, ref_probs, _ = multi_head_attention(
        params, x, num_heads=H, bias=make_attention_bias(mask), head_z=hz,
        output_probs=True,
    )
    out, probs = fsa(params, x, num_heads=H, mask=mask, head_z=hz, return_probs=True)
    assert probs.shape == ref_probs.shape == (2, H, 11, 11)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=3e-5)
    # masked-row probs are uniform-garbage in both paths only where the
    # QUERY row itself is masked; compare rows attending to >=1 key
    np.testing.assert_allclose(np.asarray(ref_probs), np.asarray(probs), atol=3e-5)


def test_fused_cross_probs_match_reference():
    from efficientvlm_tpu.ops.pallas_fused_mha import fused_cross_attention as fca

    D, De, H = 128, 128, 2
    params = init_attention(jax.random.PRNGKey(0), D, H, kv_width=De)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, D)) * 0.05
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 9, De)) * 0.05
    mask = jnp.ones((2, 9), jnp.int32).at[0, 5:].set(0)

    ref, ref_probs, _ = multi_head_attention(
        params, x, enc, num_heads=H, bias=make_attention_bias(mask),
        output_probs=True,
    )
    out, probs = fca(params, x, enc, num_heads=H, mask=mask, return_probs=True)
    assert probs.shape == ref_probs.shape == (2, H, 7, 9)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ref_probs), np.asarray(probs), atol=3e-5)


def test_bert_fused_with_output_attentions():
    """bert_apply(impl='fused', output_attentions=True) must now stay on the
    fused path AND return probs equal to the XLA path."""
    cfg = TextConfig.create(
        vocab_size=60, hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=96, encoder_width=128, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = B.init_bert(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 60)
    atts = jnp.ones((2, 9), jnp.int32).at[0, 6:].set(0)
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 128))
    enc_atts = jnp.ones((2, 5), jnp.int32)
    kw = dict(attention_mask=atts, encoder_hidden=enc, encoder_attention_mask=enc_atts,
              output_attentions=True)
    a = B.bert_apply(params, ids, cfg, impl="xla", **kw)
    b = B.bert_apply(params, ids, cfg, impl="fused", **kw)
    np.testing.assert_allclose(np.asarray(a["last_hidden"]), np.asarray(b["last_hidden"]), atol=3e-5)
    for pa, pb in zip(a["attentions"], b["attentions"]):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-5)


def test_differentiable_fused_self_grads_match_xla():
    """custom_vjp path: kernel forward + XLA-recompute backward must give
    the same gradients as the pure XLA path — including cotangents through
    the probs output (the KD attention loss differentiates probs) and the
    head gates (L0 loga grads flow through zs)."""
    from efficientvlm_tpu.ops.pallas_fused_mha import fused_self_attention as fsa

    D, H = 128, 2
    params = init_attention(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, D)) * 0.05
    mask = jnp.ones((2, 9), jnp.int32).at[1, 6:].set(0)
    hz = jnp.asarray([1.0, 0.6])

    def loss_fused(params, x, hz):
        out, probs = fsa(params, x, num_heads=H, mask=mask, head_z=hz,
                         return_probs=True, differentiable=True)
        return jnp.sum(out ** 2) + jnp.sum(probs[:, :, :, :3]) * 0.1

    def loss_xla(params, x, hz):
        out, probs, _ = multi_head_attention(
            params, x, num_heads=H, bias=make_attention_bias(mask), head_z=hz,
            output_probs=True)
        return jnp.sum(out ** 2) + jnp.sum(probs[:, :, :, :3]) * 0.1

    va, ga = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(params, x, hz)
    vb, gb = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(params, x, hz)
    np.testing.assert_allclose(float(va), float(vb), rtol=2e-4)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-4, rtol=2e-3)


def test_bert_train_mode_fused_grads(monkeypatch):
    """bert_apply impl='fused' in TRAIN mode (dropout-free) must be
    differentiable end-to-end and match the XLA path's loss/grads."""
    cfg = TextConfig.create(
        vocab_size=60, hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=96, encoder_width=128, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = B.init_bert(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 60)
    atts = jnp.ones((2, 9), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 128))
    enc_atts = jnp.ones((2, 5), jnp.int32)

    def loss(params, impl):
        out = B.bert_apply(params, ids, cfg, attention_mask=atts,
                           encoder_hidden=enc, encoder_attention_mask=enc_atts,
                           impl=impl, train=True, rng=jax.random.PRNGKey(3),
                           output_attentions=True)
        return (jnp.sum(out["last_hidden"] ** 2)
                + sum(jnp.sum(p) for p in out["attentions"]) * 0.01)

    va, ga = jax.value_and_grad(lambda p: loss(p, "fused"))(params)
    vb, gb = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=2e-4)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=3e-4, rtol=3e-3)


def test_vit_scan_fused_equals_unrolled_xla():
    """impl='fused' rides INSIDE the lax.scan body (one Mosaic lowering per
    scan group instead of one per layer — this is what makes the fused
    teacher/KD programs compile in minutes, not hours): scanned-fused must
    equal unrolled-XLA, including the KD probs taps."""
    kw = dict(
        vision_width=128, num_attention_heads=2, intermediate_size=96,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    cfg_scan = VisionConfig.create(scan_layers=True, **kw)
    cfg_unroll = VisionConfig.create(**kw)
    params = V.init_vit(jax.random.PRNGKey(0), cfg_scan)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1
    a = V.vit_apply(params, imgs, cfg_unroll, impl="xla",
                    output_attentions=True, output_hidden_states=True)
    b = V.vit_apply(params, imgs, cfg_scan, impl="fused",
                    output_attentions=True, output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(a["last_hidden"]), np.asarray(b["last_hidden"]), atol=3e-5)
    for pa, pb in zip(a["attentions"], b["attentions"]):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-5)
    for ha, hb in zip(a["hidden_states"], b["hidden_states"]):
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=3e-5)


def test_bert_scan_fused_equals_unrolled_xla():
    """Text + cross scan groups with impl='fused' (self AND cross kernels
    inside scan) vs the unrolled XLA program."""
    kw = dict(
        vocab_size=60, hidden_size=128, num_hidden_layers=4, fusion_layer=2,
        num_attention_heads=2, intermediate_size=96, encoder_width=128,
        max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg_scan = TextConfig.create(scan_layers=True, **kw)
    cfg_unroll = TextConfig.create(**kw)
    params = B.init_bert(jax.random.PRNGKey(0), cfg_scan)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 60)
    atts = jnp.ones((2, 9), jnp.int32).at[0, 6:].set(0)
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 128)) * 0.1
    enc_atts = jnp.ones((2, 5), jnp.int32)
    mkw = dict(attention_mask=atts, encoder_hidden=enc, encoder_attention_mask=enc_atts,
               output_attentions=True)
    a = B.bert_apply(params, ids, cfg_unroll, impl="xla", **mkw)
    b = B.bert_apply(params, ids, cfg_scan, impl="fused", **mkw)
    np.testing.assert_allclose(np.asarray(a["last_hidden"]), np.asarray(b["last_hidden"]), atol=3e-5)
    for pa, pb in zip(a["attentions"], b["attentions"]):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-5)
    for pa, pb in zip(a["cross_attentions"], b["cross_attentions"]):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-5)


def test_vit_scan_fused_train_grads_match_xla():
    """Scan + fused + differentiable custom_vjp (the student KD forward):
    grads through the scanned fused kernel match the unrolled XLA path."""
    kw = dict(
        vision_width=128, num_attention_heads=2, intermediate_size=96,
        num_hidden_layers=2, image_res=16, patch_size=8,
        attention_dropout=0.0,
    )
    cfg_scan = VisionConfig.create(scan_layers=True, **kw)
    cfg_unroll = VisionConfig.create(**kw)
    params = V.init_vit(jax.random.PRNGKey(0), cfg_scan)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1

    def loss(params, cfg, impl):
        out = V.vit_apply(params, imgs, cfg, impl=impl, train=True,
                          rng=jax.random.PRNGKey(3), output_attentions=True)
        return (jnp.sum(out["last_hidden"] ** 2)
                + sum(jnp.sum(p) for p in out["attentions"]) * 0.01)

    va, ga = jax.value_and_grad(lambda p: loss(p, cfg_scan, "fused"))(params)
    vb, gb = jax.value_and_grad(lambda p: loss(p, cfg_unroll, "xla"))(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=2e-4)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=3e-4, rtol=3e-3)


def test_scan_fused_actually_instantiates_pallas():
    """Regression guard: with scan_layers=True, impl='fused' must reach the
    kernel INSIDE the scan body (it silently no-op'd to XLA before the scan
    bodies threaded impl through). Trace-only: counts pallas_call in the
    jaxpr, no Mosaic compile."""
    cfg = VisionConfig.create(
        vision_width=128, num_attention_heads=2, intermediate_size=96,
        num_hidden_layers=2, image_res=16, patch_size=8, scan_layers=True,
    )
    params = jax.eval_shape(lambda k: V.init_vit(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    imgs = jnp.zeros((2, 16, 16, 3))
    for impl, expect in (("xla", 0), ("fused", 1)):
        jx = str(jax.make_jaxpr(
            lambda p, im: V.vit_apply(p, im, cfg, impl=impl)["last_hidden"])(params, imgs))
        assert jx.count("pallas_call") == expect, (impl, jx.count("pallas_call"))


def test_vit_region_mask_fused_equals_xla():
    """GD region batches (per-region patch-level image_atts,
    reference clip_vit.py:292-326) must FUSE: the region mask is a
    key-vector mask [B,S] (the reference merely broadcast-expands it to
    (bs,1,S,S)), which the kernel takes natively — previously any bias
    forced the XLA fallback (VERDICT r4 #7). Geometry chosen so the
    fused gate engages (width 128, S=226 lane-pad-efficient)."""
    cfg = VisionConfig.create(
        vision_width=128, num_attention_heads=2, intermediate_size=192,
        num_hidden_layers=2, image_res=120, patch_size=8, local_attn_depth=1,
    )
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 120, 120, 3)) * 0.1
    n_tok = (120 // 8) ** 2 + 1
    idx = jnp.array([0, 0, 1])  # 3 regions over 2 images
    # per-region patch masks: distinct irregular spans + CLS
    atts = jnp.zeros((3, n_tok)).at[0, :60].set(1).at[1, 60:150].set(1).at[2, :100].set(1)
    atts = atts.at[:, 0].set(1)

    outs = {}
    for impl in ("xla", "fused"):
        o = V.vit_apply(params, imgs, cfg, idx_to_group_img=idx,
                        image_atts=atts, impl=impl)
        outs[impl] = (o["last_hidden"], o["full_atts_hidden"])
    np.testing.assert_allclose(
        np.asarray(outs["xla"][0]), np.asarray(outs["fused"][0]), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(outs["xla"][1]), np.asarray(outs["fused"][1]), atol=5e-5)
    # the fused program must actually contain the kernel at this geometry
    jx = str(jax.make_jaxpr(lambda p, im: V.vit_apply(
        p, im, cfg, idx_to_group_img=idx, image_atts=atts,
        impl="fused")["last_hidden"])(params, imgs))
    assert jx.count("pallas_call") >= 1


def test_fused_cross_grouped_matches_xla():
    """Grouped fused cross-attention LAYER kernel (per-image K/V projected
    once into VMEM scratch, group-folded query row blocks) == the XLA
    grouped einsum — the k_test rerank hot path (VERDICT r4 #4)."""
    from efficientvlm_tpu.ops.pallas_fused_mha import fused_cross_attention_grouped

    bk, g, h, t, s, d, de = 2, 16, 2, 24, 120, 128, 96
    params = init_attention(jax.random.PRNGKey(0), d, h, kv_width=de)
    q_in = jax.random.normal(jax.random.PRNGKey(1), (bk * g, t, d)) * 0.1
    kv_in = jax.random.normal(jax.random.PRNGKey(2), (bk, s, de)) * 0.1
    mask = jnp.ones((bk, s), jnp.int32).at[1, 100:].set(0)
    hz = jnp.asarray([1.0, 0.5])

    ref, _, _ = multi_head_attention(
        params, q_in, kv_in, num_heads=h, bias=make_attention_bias(mask),
        head_z=hz, kv_groups=g, impl="xla")
    out = fused_cross_attention_grouped(
        params, q_in, kv_in, num_heads=h, kv_groups=g, mask=mask, head_z=hz)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=3e-5)

    # through bert_apply: the multi_modal fusion stack must dispatch the
    # grouped layer kernel at eval and stay equal to the XLA path
    cfg = TextConfig.create(
        vocab_size=60, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=96, encoder_width=96,
        max_position_embeddings=40, fusion_layer=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bparams = B.init_bert(jax.random.PRNGKey(3), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (bk * g, 24), 0, 60)
    atts = jnp.ones((bk * g, 24), jnp.int32)
    enc_atts = jnp.asarray(mask)
    kw = dict(attention_mask=atts, encoder_hidden=kv_in,
              encoder_attention_mask=enc_atts, mode="multi_modal",
              encoder_groups=g)
    a = B.bert_apply(bparams, ids, cfg, impl="xla", **kw)["last_hidden"]
    b = B.bert_apply(bparams, ids, cfg, impl="fused", **kw)["last_hidden"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_cross_grouped_dispatches_in_bert():
    """Trace-only: bert_apply multi_modal at eval with encoder_groups>1 must
    actually lower the grouped layer kernel (guards the dispatch gates)."""
    cfg = TextConfig.create(
        vocab_size=60, hidden_size=128, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=96, encoder_width=96,
        max_position_embeddings=40, fusion_layer=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bparams = B.init_bert(jax.random.PRNGKey(0), cfg)
    bk, g, t, s = 2, 16, 24, 120
    ids = jnp.zeros((bk * g, t), jnp.int32)
    atts = jnp.ones((bk * g, t), jnp.int32)
    enc = jnp.zeros((bk, s, 96))
    enc_atts = jnp.ones((bk, s), jnp.int32)
    jx = str(jax.make_jaxpr(lambda p, e: B.bert_apply(
        p, ids, cfg, attention_mask=atts, encoder_hidden=e,
        encoder_attention_mask=enc_atts, mode="multi_modal",
        encoder_groups=g, impl="fused")["last_hidden"])(bparams, enc))
    assert "pallas_call" in jx
