"""Physical pruning export: gated model == sliced model (exact equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models import bert as B
from efficientvlm_tpu.models import vit as V
from efficientvlm_tpu.pruning.export import prune_bert_params, prune_vit_params

HEAD_DIM = 16


def _binary(rng, shape, keep_prob=0.7):
    return (rng.random(shape) < keep_prob).astype(np.float32)


def test_vit_export_equivalence():
    cfg = VisionConfig.create(
        vision_width=64, num_attention_heads=4, intermediate_size=96,
        num_hidden_layers=3, image_res=16, patch_size=8,
    )
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    zs = {
        "vision_head_z": _binary(rng, (3, 4)),
        "vision_intermediate_z": _binary(rng, (3, 96)),
    }
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    gated = V.vit_apply(
        params, imgs, cfg,
        head_z=jnp.asarray(zs["vision_head_z"]),
        mlp_z=jnp.asarray(zs["vision_intermediate_z"]),
    )["last_hidden"]

    pruned = prune_vit_params(params, zs, head_dim=HEAD_DIM)
    # genuinely smaller arrays
    kept_heads = int(zs["vision_head_z"][0].sum())
    assert pruned["layers"][0]["attn"]["q"]["kernel"].shape[1] == kept_heads * HEAD_DIM
    kept_dims = int(zs["vision_intermediate_z"][1].sum())
    assert pruned["layers"][1]["mlp"]["fc1"]["kernel"].shape[1] == kept_dims

    sliced = V.vit_apply(pruned, imgs, cfg)["last_hidden"]
    np.testing.assert_allclose(np.asarray(gated), np.asarray(sliced), atol=1e-5)


def test_vit_uniform_export_scans_with_derived_heads():
    """A UNIFORMLY pruned export satisfies _uniform_layers, so the scanned
    encoder engages — it must size attention from the sliced param shapes
    (fewer heads than cfg.num_attention_heads), exactly like the unrolled
    path. Regression: the scan path used to read cfg and crash reshaping
    (caught wiring the pruned model into the serving bench)."""
    cfg = VisionConfig.create(
        vision_width=64, num_attention_heads=4, intermediate_size=96,
        num_hidden_layers=3, image_res=16, patch_size=8,
    )
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    # uniform gates: same 2-of-4 heads, same mlp dims kept in EVERY layer
    head_keep = np.array([1.0, 0.0, 1.0, 0.0], np.float32)
    mlp_keep = (np.arange(96) < 64).astype(np.float32)
    zs = {
        "vision_head_z": np.tile(head_keep, (3, 1)),
        "vision_intermediate_z": np.tile(mlp_keep, (3, 1)),
    }
    pruned = prune_vit_params(params, zs, head_dim=HEAD_DIM)
    assert pruned["layers"][0]["attn"]["q"]["kernel"].shape[1] == 2 * HEAD_DIM

    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    unrolled = V.vit_apply(pruned, imgs, cfg)["last_hidden"]
    scan_cfg = VisionConfig(dict(cfg))
    scan_cfg["scan_layers"] = True
    scanned = V.vit_apply(pruned, imgs, scan_cfg)["last_hidden"]
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(unrolled),
                               atol=1e-6)


def test_bert_export_equivalence():
    cfg = TextConfig.create(
        vocab_size=60, hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=96, encoder_width=48, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = B.init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    zs = {
        "text_head_z": _binary(rng, (2, 4)),
        "text_intermediate_z": _binary(rng, (2, 96)),
        "cross_head_z": _binary(rng, (2, 2, 4)),
        "cross_intermediate_z": _binary(rng, (2, 96)),
    }
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 9), 0, 60)
    atts = jnp.ones((2, 9), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 48))
    enc_atts = jnp.ones((2, 5), jnp.int32)

    gated = B.bert_apply(
        params, ids, cfg, attention_mask=atts,
        encoder_hidden=enc, encoder_attention_mask=enc_atts,
        text_head_z=jnp.asarray(zs["text_head_z"]),
        cross_head_z=jnp.asarray(zs["cross_head_z"]),
        text_mlp_z=jnp.asarray(zs["text_intermediate_z"]),
        cross_mlp_z=jnp.asarray(zs["cross_intermediate_z"]),
    )["last_hidden"]

    pruned = prune_bert_params(params, zs, fusion_layer=2, head_dim=HEAD_DIM)
    sliced = B.bert_apply(
        pruned, ids, cfg, attention_mask=atts,
        encoder_hidden=enc, encoder_attention_mask=enc_atts,
    )["last_hidden"]
    np.testing.assert_allclose(np.asarray(gated), np.asarray(sliced), atol=1e-5)

    # param count actually shrank
    n_before = sum(x.size for x in jax.tree.leaves(params))
    n_after = sum(x.size for x in jax.tree.leaves(pruned))
    assert n_after < n_before


def test_export_handles_dead_mlp():
    cfg = VisionConfig.create(
        vision_width=64, num_attention_heads=4, intermediate_size=32,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    zs = {
        "vision_head_z": np.ones((2, 4), np.float32),
        "vision_intermediate_z": np.concatenate(
            [np.zeros((1, 32)), np.ones((1, 32))], 0
        ).astype(np.float32),
    }
    pruned = prune_vit_params(params, zs, head_dim=HEAD_DIM)
    assert pruned["layers"][0]["mlp"] is None
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    out = V.vit_apply(pruned, imgs, cfg)["last_hidden"]
    assert np.isfinite(np.asarray(out)).all()


def test_load_zs_reconstruct_all_towers():
    """Pruned shapes -> per-layer gate counts for vision/text/cross/decoder
    (reference load_zs/load_pruned_model, xvlm_utils.py:247-299)."""
    from efficientvlm_tpu.pruning.export import load_zs_from_params, prune_xvlm_params

    vcfg = VisionConfig.create(
        vision_width=64, num_attention_heads=4, intermediate_size=96,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=60, hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=96, encoder_width=64, max_position_embeddings=32,
    )
    params = {
        "vision": V.init_vit(jax.random.PRNGKey(0), vcfg),
        "text": B.init_bert(jax.random.PRNGKey(1), tcfg),
    }
    rng = np.random.RandomState(7)
    zs = {
        "vision_head_z": _binary(rng, (2, 4)),
        "vision_intermediate_z": _binary(rng, (2, 96)),
        "text_head_z": _binary(rng, (2, 4)),
        "text_intermediate_z": _binary(rng, (2, 96)),
        "cross_head_z": _binary(rng, (2, 2, 4)),
        "cross_intermediate_z": _binary(rng, (2, 96)),
    }
    pruned = prune_xvlm_params(params, zs, fusion_layer=2, head_dim=HEAD_DIM)
    got = load_zs_from_params(
        pruned, num_heads=4, intermediate_size=96, head_dim=HEAD_DIM,
        fusion_layer=2, vision_num_heads=4, vision_intermediate_size=96,
    )
    for key in zs:
        want = zs[key].sum(axis=-1)
        have = got[key].sum(axis=-1)
        np.testing.assert_array_equal(want, have, err_msg=key)

    # VQA decoder layout: all-cross stack driven by decoder_* groups
    dcfg = TextConfig.create(
        vocab_size=60, hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=96, encoder_width=64, max_position_embeddings=32,
        fusion_layer=0,
    )
    dec_params = {"text_decoder": B.init_bert(jax.random.PRNGKey(2), dcfg)}
    dzs = {
        "decoder_head_z": _binary(rng, (4, 2, 4)),
        "decoder_intermediate_z": _binary(rng, (4, 96)),
    }
    dpruned = prune_xvlm_params(dec_params, dzs, fusion_layer=2, head_dim=HEAD_DIM)
    dgot = load_zs_from_params(
        dpruned, num_heads=4, intermediate_size=96, head_dim=HEAD_DIM,
        decoder_groups=True,
    )
    np.testing.assert_array_equal(
        dzs["decoder_head_z"].sum(axis=-1), dgot["decoder_head_z"].sum(axis=-1))
    np.testing.assert_array_equal(
        dzs["decoder_intermediate_z"].sum(axis=-1), dgot["decoder_intermediate_z"].sum(axis=-1))


def test_pruned_ckpt_loads_through_driver_path(tmp_path):
    """run.py --evaluate --checkpoint pruned_student.ckpt: the native
    msgpack pruned tree (per-layer shapes differ) loads via
    common.maybe_load_params and forwards through the scan-default model
    (scan auto-falls-back to the unrolled path on non-uniform layers)."""
    from efficientvlm_tpu.config import Config
    from efficientvlm_tpu.drivers import common
    from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
    from efficientvlm_tpu.pruning.export import prune_xvlm_params
    from efficientvlm_tpu.train import checkpoint as C

    vcfg = VisionConfig.create(
        vision_width=64, num_attention_heads=4, intermediate_size=96,
        num_hidden_layers=2, image_res=16, patch_size=8, scan_layers=True,
    )
    tcfg = TextConfig.create(
        vocab_size=60, hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=96, encoder_width=64, max_position_embeddings=32,
        scan_layers=True,
    )
    model = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 16}))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    zs = {
        "vision_head_z": _binary(rng, (2, 4)),
        "vision_intermediate_z": _binary(rng, (2, 96)),
        "text_head_z": _binary(rng, (2, 4)),
        "text_intermediate_z": _binary(rng, (2, 96)),
        "cross_head_z": _binary(rng, (2, 2, 4)),
        "cross_intermediate_z": _binary(rng, (2, 96)),
    }
    pruned = prune_xvlm_params(params, zs, fusion_layer=2, head_dim=HEAD_DIM)
    path = str(tmp_path / "pruned_student.ckpt")
    C.save_pytree(path, pruned)

    loaded = common.maybe_load_params(
        model, Config({"checkpoint": path}), Config({}), lambda: model.init(jax.random.PRNGKey(1)))
    for a, b in zip(jax.tree.leaves(pruned), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # layer 0 lost heads: shapes are per-layer, scan falls back to unrolled
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    out = model.get_vision_embeds(loaded, imgs)[0]
    assert bool(jnp.isfinite(out).all())
