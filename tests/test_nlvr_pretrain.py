"""NLVR model + GD pretrain step tests."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.models.model_nlvr import XVLMForNLVR, duplicate_cross_layers_for_nlvr, make_nlvr_text_config
from efficientvlm_tpu.models.model_pretrain import XVLMForPretrain
from efficientvlm_tpu.pruning.l0_module import NLVRL0Module
from efficientvlm_tpu.train.optim import create_optimizer
from efficientvlm_tpu.train.steps import make_gd_train_step


def _cfgs(nv=2, nt=4):
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=nv, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=50, hidden_size=32, num_hidden_layers=nt, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    return vcfg, tcfg


def test_nlvr_config_doubling():
    _, tcfg = _cfgs(nt=6)
    ncfg = make_nlvr_text_config(tcfg)
    assert ncfg["num_hidden_layers"] == 3 + 6  # 3 text + 2*3 cross
    assert ncfg["fusion_layer"] == 3


def test_nlvr_forward_and_tied_kv():
    vcfg, tcfg = _cfgs()
    model = XVLMForNLVR(vcfg, tcfg)
    params = model.init(jax.random.PRNGKey(0))
    assert len(params["text"]["layers"]) == 2 + 4  # 2 text + 2*2 cross

    B = 2
    image = jax.random.normal(jax.random.PRNGKey(1), (2 * B, 16, 16, 3))
    text_ids = jax.random.randint(jax.random.PRNGKey(2), (B, 8), 0, 50)
    text_atts = jnp.ones((B, 8), jnp.int32)
    targets = jnp.asarray([0, 1])

    loss = model.forward(params, image, text_ids, text_atts, targets, train=True)
    assert np.isfinite(float(loss))
    pred = model.forward(params, image, text_ids, text_atts, targets, train=False)
    assert pred.shape == (B, 2)

    # tied K/V: pair-second layer's cross k/v params receive zero gradient,
    # pair-first receives the accumulated one
    def loss_fn(p):
        return model.forward(p, image, text_ids, text_atts, targets, train=True)

    g = jax.grad(loss_fn)(params)
    fusion = model.num_text_layers
    ga = g["text"]["layers"][fusion]["crossattention"]
    gb = g["text"]["layers"][fusion + 1]["crossattention"]
    assert float(jnp.abs(ga["k"]["kernel"]).max()) > 0
    assert float(jnp.abs(gb["k"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(gb["q"]["kernel"]).max()) > 0  # q NOT tied

    # gates thread through the doubled stack
    l0 = NLVRL0Module(vision_layers=2, text_layers=2, cross_layers=2,
                      hidden_size=32, intermediate_size=64, num_heads=4)
    zs = l0.forward_train(l0.init(jax.random.PRNGKey(3)), jax.random.PRNGKey(4))
    assert zs["cross_head_z"].shape == (4, 2, 4)
    loss_z = model.forward(params, image, text_ids, text_atts, targets, train=True, zs=zs)
    assert np.isfinite(float(loss_z))


def test_nlvr_checkpoint_duplication():
    sd = {f"encoder.layer.{i}.w": np.full((1,), float(i)) for i in range(4)}
    out = duplicate_cross_layers_for_nlvr(sd, num_text_layers=2)
    assert sorted(out) == [f"encoder.layer.{i}.w" for i in range(6)]
    assert out["encoder.layer.2.w"][0] == 2.0 and out["encoder.layer.3.w"][0] == 2.0
    assert out["encoder.layer.4.w"][0] == 3.0 and out["encoder.layer.5.w"][0] == 3.0


def test_gd_pretrain_step():
    vcfg, tcfg = _cfgs()
    vcfg_t, tcfg_t = _cfgs(nv=4, nt=4)
    student = XVLMForPretrain(vcfg, tcfg, Config({"embed_dim": 16}))
    teacher = XVLMForPretrain(vcfg_t, tcfg_t, Config({"embed_dim": 16}))
    sparams = student.init(jax.random.PRNGKey(0), with_bbox_head=True)
    tparams = teacher.init(jax.random.PRNGKey(1), with_bbox_head=True)

    opt = create_optimizer(sparams, lr=1e-3, weight_decay=0.01, grad_clip=1.0)
    step_fn = jax.jit(make_gd_train_step(student, teacher, opt, teacher_params=tparams))
    B = 4
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(2), (B, 16, 16, 3)),
        "text_ids": jax.random.randint(jax.random.PRNGKey(3), (B, 8), 0, 50),
        "text_atts": jnp.ones((B, 8), jnp.int32),
        "text_ids_masked": jax.random.randint(jax.random.PRNGKey(4), (B, 8), 0, 50),
        "masked_pos": jnp.tile(jnp.asarray([[1, 3]]), (B, 1)),
        "masked_ids": jax.random.randint(jax.random.PRNGKey(5), (B, 2), 0, 50),
    }
    state = (sparams, opt.init(sparams), jnp.array(0))
    m0 = None
    for i in range(6):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(10 + i))
        m0 = m0 or metrics
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert float(metrics["loss_kd"]) < float(m0["loss_kd"])
    # temp clamped
    assert 0.001 <= float(state[0]["temp"]) <= 0.5
