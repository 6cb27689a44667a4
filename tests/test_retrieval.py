"""Retrieval task: KD train step + two-stage sharded eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
from efficientvlm_tpu.pruning.l0_module import XVLML0Module
from efficientvlm_tpu.train.optim import (
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
)
from efficientvlm_tpu.train.steps import init_train_state, make_retrieval_train_step
from efficientvlm_tpu.evaluation import retrieval as R
from efficientvlm_tpu.train.distill import get_cor_teacher, soft_cross_entropy


def _mk(num_layers_v, num_layers_t, seed=0):
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=num_layers_v, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=50, hidden_size=32, num_hidden_layers=num_layers_t,
        num_attention_heads=4, intermediate_size=64, encoder_width=32,
        max_position_embeddings=16, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = XVLMForRetrieval(vcfg, tcfg, {"embed_dim": 16})
    params = model.init(jax.random.PRNGKey(seed))
    return model, params


def test_kd_layer_mapping():
    t = [np.full((1,), i) for i in range(13)]  # teacher hidden 12L -> 13
    s = [np.zeros((1,))] * 7  # student 6L -> 7
    mapped = get_cor_teacher(t, s)
    assert [int(x[0]) for x in mapped] == [0, 2, 4, 6, 8, 10, 12]

    t = [np.full((1,), i) for i in range(12)]
    s = [np.zeros((1,))] * 6
    mapped = get_cor_teacher(t, s, is_attn=True)
    assert [int(x[0]) for x in mapped] == [1, 3, 5, 7, 9, 11]


def test_soft_cross_entropy_self_is_zero():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 7), jnp.float32)
    assert float(soft_cross_entropy(x, x)) < 1e-4
    y = jnp.asarray(np.random.RandomState(1).randn(4, 7), jnp.float32)
    assert float(soft_cross_entropy(x, y)) > 0.01


def test_retrieval_train_step_runs_and_learns():
    student, sparams = _mk(2, 4, seed=0)
    teacher, tparams = _mk(4, 4, seed=1)  # deeper teacher
    l0 = XVLML0Module(
        vision_layers=2, text_layers=2, cross_layers=2,
        hidden_size=32, intermediate_size=64, num_heads=4,
        target_sparsity=0.2, lagrangian_warmup=10,
    )
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        create_optimizer(sparams, lr=1e-3, weight_decay=0.01, grad_clip=1.0),
        create_l0_optimizer(reg_lr=0.05),
        create_lagrangian_optimizer(reg_lr=0.05),
    )
    state = init_train_state(sparams, l0_params, opts)
    step_fn = jax.jit(make_retrieval_train_step(
        student, teacher, l0, opts, teacher_params=tparams,
    ))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3)),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (4, 8), 0, 50),
        "text_atts": jnp.ones((4, 8), jnp.int32),
        "idx": jnp.arange(4),
    }
    metrics0 = None
    for i in range(20):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(10 + i))
        if metrics0 is None:
            metrics0 = metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 20
    # KD loss should drop on a fixed batch
    assert float(metrics["loss_kd"]) < float(metrics0["loss_kd"])
    # sparsity controller engaged
    assert float(metrics["target_sparsity"]) > 0


def test_retrieval_eval_pipeline_and_sharding():
    model, params = _mk(2, 4, seed=0)
    rng = np.random.RandomState(0)
    n_img, n_txt = 6, 12
    images = rng.randn(n_img, 16, 16, 3).astype(np.float32)
    text_ids = rng.randint(0, 50, (n_txt, 8))
    text_atts = np.ones((n_txt, 8), np.int64)
    txt2img = [i // 2 for i in range(n_txt)]
    img2txt = {i: [2 * i, 2 * i + 1] for i in range(n_img)}

    tf, te = R.encode_texts(model, params, text_ids, text_atts, batch_size=5)
    assert tf.shape == (n_txt, 8, 32) and te.shape == (n_txt, 16)
    imf, ime = R.encode_images(model, params, [images[:3], images[3:]])
    assert imf.shape[0] == n_img and ime.shape == (n_img, 16)
    np.testing.assert_allclose(np.linalg.norm(te, axis=-1), 1.0, rtol=1e-5)

    s1_i2t, s1_t2i = R.retrieval_scores(
        model, params, imf, ime, tf, text_atts, te, k_test=4,
    )
    res1 = R.itm_eval(s1_i2t, s1_t2i, txt2img, img2txt)
    assert 0 <= res1["r_mean"] <= 100

    # two-rank sharded run merged by sum must give identical metrics
    parts = [
        R.retrieval_scores(model, params, imf, ime, tf, text_atts, te,
                           k_test=4, rank=r, world_size=2)
        for r in (0, 1)
    ]
    s2_i2t = parts[0][0] + parts[1][0]
    s2_t2i = parts[0][1] + parts[1][1]
    res2 = R.itm_eval(s2_i2t, s2_t2i, txt2img, img2txt)
    assert res1 == res2


def test_split_step_tap_subsetting_is_lossless():
    """subset_teacher_taps must leave the KD losses BIT-IDENTICAL: it only
    drops teacher tap layers get_cor_teacher would discard anyway, so the
    split teacher program can stop materializing them as outputs."""
    from efficientvlm_tpu.train.steps import retrieval_kd_losses, subset_teacher_taps

    student, sparams = _mk(2, 4, seed=0)
    teacher, tparams = _mk(4, 4, seed=1)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3)),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (4, 8), 0, 50),
        "text_atts": jnp.ones((4, 8), jnp.int32),
        "idx": jnp.arange(4),
    }
    kw = dict(output_attentions=True, output_hidden_states=True, train=False,
              rng=jax.random.PRNGKey(7))
    s_out = student.forward(sparams, batch["image"], batch["text_ids"],
                            batch["text_atts"], idx=batch["idx"], zs=None, **kw)
    t_out = teacher.forward(tparams, batch["image"], batch["text_ids"],
                            batch["text_atts"], idx=batch["idx"], zs=None, **kw)
    full = {k: t_out[k] for k in
            ("hidden_dict", "attention_dict", "cross_attention_dict", "logits_dict")}
    sv = student.vision_cfg["num_hidden_layers"]
    sf = student.text_cfg["fusion_layer"]
    sx = student.text_cfg["num_hidden_layers"] - sf
    sub = subset_teacher_taps(full, vision_layers=sv, text_fusion=sf, cross_layers=sx)

    kd_a = retrieval_kd_losses(s_out, full)
    kd_b = retrieval_kd_losses(s_out, sub)
    for k in kd_a:
        np.testing.assert_array_equal(np.asarray(kd_a[k]), np.asarray(kd_b[k]), err_msg=k)
    # and it really shrinks the tree
    n_full = len(jax.tree.leaves(full))
    n_sub = len(jax.tree.leaves(sub))
    assert n_sub < n_full, (n_sub, n_full)


def test_split_retrieval_train_step_runs():
    """Two-program KD step (separate teacher/student jits, the production
    configuration for heavy graphs) trains with finite metrics."""
    from efficientvlm_tpu.train.optim import (
        create_l0_optimizer as mk_l0, create_lagrangian_optimizer as mk_lam,
        create_optimizer as mk_opt,
    )
    from efficientvlm_tpu.train.steps import make_split_retrieval_train_step

    student, sparams = _mk(2, 4, seed=0)
    teacher, tparams = _mk(4, 4, seed=1)
    l0 = XVLML0Module(
        vision_layers=2, text_layers=2, cross_layers=2,
        hidden_size=32, intermediate_size=64, num_heads=4,
        target_sparsity=0.2, lagrangian_warmup=10,
    )
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        mk_opt(sparams, lr=1e-3, weight_decay=0.01, grad_clip=1.0),
        mk_l0(reg_lr=0.05),
        mk_lam(reg_lr=0.05),
    )
    state = init_train_state(sparams, l0_params, opts)
    step_fn = make_split_retrieval_train_step(
        student, teacher, l0, opts, teacher_params=tparams,
    )
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3)),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (4, 8), 0, 50),
        "text_atts": jnp.ones((4, 8), jnp.int32),
        "idx": jnp.arange(4),
    }
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(10 + i))
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_split_retrieval_train_step_sharded():
    """DP variant of the two-program step: each program is its own
    jit(shard_map) over 'data' (an outer shard_map would inline the inner
    jits back into one program). Teacher taps stay batch-sharded between
    the calls; grads pmean inside the student program."""
    from jax.sharding import Mesh

    from efficientvlm_tpu.train.optim import (
        create_l0_optimizer as mk_l0, create_lagrangian_optimizer as mk_lam,
        create_optimizer as mk_opt,
    )
    from efficientvlm_tpu.train.steps import make_split_retrieval_train_step

    student, sparams = _mk(2, 4, seed=0)
    teacher, tparams = _mk(4, 4, seed=1)
    l0 = XVLML0Module(
        vision_layers=2, text_layers=2, cross_layers=2,
        hidden_size=32, intermediate_size=64, num_heads=4,
        target_sparsity=0.2, lagrangian_warmup=10,
    )
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        mk_opt(sparams, lr=1e-3, weight_decay=0.01, grad_clip=1.0),
        mk_l0(reg_lr=0.05),
        mk_lam(reg_lr=0.05),
    )
    state = init_train_state(sparams, l0_params, opts)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    step_fn = make_split_retrieval_train_step(
        student, teacher, l0, opts, teacher_params=tparams,
        axis_name="data", mesh=mesh,
    )
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (8, 16, 16, 3)),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (8, 8), 0, 50),
        "text_atts": jnp.ones((8, 8), jnp.int32),
        "idx": jnp.arange(8),
    }
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(10 + i))
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
