"""Context-parallel hook (SURVEY §5.7): a ('data','seq') mesh with
activation sharding constraints must produce the same numbers as the
unsharded forward — seq stays unit-sized in production, but the axis is
plumbed so context parallelism is a config flip, not an API change."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models import bert as B
from efficientvlm_tpu.models import vit as V
from efficientvlm_tpu.parallel.sharding import make_sp_mesh


def test_seq_sharded_forward_matches_unsharded():
    kw = dict(
        vision_width=64, num_attention_heads=4, intermediate_size=96,
        num_hidden_layers=2, image_res=32, patch_size=8,
    )
    cfg_plain = VisionConfig.create(**kw)
    cfg_sp = VisionConfig.create(act_partition=["data", "seq"], **kw)
    params = V.init_vit(jax.random.PRNGKey(0), cfg_plain)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 0.1

    ref = V.vit_apply(params, imgs, cfg_plain)["last_hidden"]

    mesh = make_sp_mesh(data=4, seq=2)
    with mesh:
        out = jax.jit(lambda p, im: V.vit_apply(p, im, cfg_sp)["last_hidden"])(params, imgs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_seq_sharded_bert_matches_unsharded():
    kw = dict(
        vocab_size=60, hidden_size=64, num_hidden_layers=4, fusion_layer=2,
        num_attention_heads=4, intermediate_size=96, encoder_width=64,
        max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg_plain = TextConfig.create(**kw)
    cfg_sp = TextConfig.create(act_partition=["data", "seq"], **kw)
    params = B.init_bert(jax.random.PRNGKey(0), cfg_plain)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 60)
    atts = jnp.ones((8, 16), jnp.int32).at[0, 12:].set(0)
    enc = jax.random.normal(jax.random.PRNGKey(2), (8, 6, 64)) * 0.1
    enc_atts = jnp.ones((8, 6), jnp.int32)
    mkw = dict(attention_mask=atts, encoder_hidden=enc, encoder_attention_mask=enc_atts)

    ref = B.bert_apply(params, ids, cfg_plain, **mkw)["last_hidden"]

    mesh = make_sp_mesh(data=4, seq=2)
    with mesh:
        out = jax.jit(lambda p, i: B.bert_apply(p, i, cfg_sp, **mkw)["last_hidden"])(params, ids)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)
