"""Determinism: same seed => bit-identical jitted train step outputs
(SURVEY §5.2 — the framework's substitute for race detection: all
parallelism lives in XLA; host-side data sharding is disjoint by
construction, so reproducibility is the meaningful invariant)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
from efficientvlm_tpu.pruning.l0_module import XVLML0Module
from efficientvlm_tpu.train.optim import (
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
)
from efficientvlm_tpu.train.steps import init_train_state, make_retrieval_train_step


def test_train_step_deterministic():
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=50, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    student = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 16}))
    teacher = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 16}))
    sparams = student.init(jax.random.PRNGKey(0))
    tparams = teacher.init(jax.random.PRNGKey(1))
    l0 = XVLML0Module(vision_layers=2, text_layers=2, cross_layers=2,
                      hidden_size=32, intermediate_size=64, num_heads=4,
                      target_sparsity=0.2, lagrangian_warmup=5)
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        create_optimizer(sparams, lr=1e-3, weight_decay=0.01),
        create_l0_optimizer(reg_lr=0.05),
        create_lagrangian_optimizer(reg_lr=0.05),
    )
    step_fn = jax.jit(make_retrieval_train_step(student, teacher, l0, opts, teacher_params=tparams))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3)),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (4, 8), 0, 50),
        "text_atts": jnp.ones((4, 8), jnp.int32),
        "idx": jnp.arange(4),
    }

    def run():
        state = init_train_state(sparams, l0_params, opts)
        for i in range(3):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(10 + i))
        return state, metrics

    s1, m1 = run()
    s2, m2 = run()
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))


def test_full_state_resume_bit_exact(tmp_path):
    """Killed-and-resumed training == uninterrupted training, bit for bit:
    save_full_state/restore_full_state round-trip ALL optimizer moments and
    the epoch-keyed rng makes the replayed epochs identical (the reference
    restores model/optimizer/scheduler/epoch, GeneralDistill.py:512-520)."""
    from efficientvlm_tpu.drivers import common

    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=50, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    student = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 16}))
    teacher = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 16}))
    sparams = student.init(jax.random.PRNGKey(0))
    tparams = teacher.init(jax.random.PRNGKey(1))
    l0 = XVLML0Module(vision_layers=2, text_layers=2, cross_layers=2,
                      hidden_size=32, intermediate_size=64, num_heads=4,
                      target_sparsity=0.2, lagrangian_warmup=5)
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        create_optimizer(sparams, lr=1e-3, weight_decay=0.01),
        create_l0_optimizer(reg_lr=0.05),
        create_lagrangian_optimizer(reg_lr=0.05),
    )
    step_fn = jax.jit(make_retrieval_train_step(
        student, teacher, l0, opts, teacher_params=tparams))

    def batch_for(epoch, i):
        k = jax.random.PRNGKey(1000 * epoch + i)
        return {
            "image": jax.random.normal(k, (4, 16, 16, 3)),
            "text_ids": jax.random.randint(k, (4, 8), 3, 50),
            "text_atts": jnp.ones((4, 8), jnp.int32),
            "idx": jnp.arange(4),
        }

    def run_epochs(state, start, end):
        base = jax.random.PRNGKey(7)
        for epoch in range(start, end):
            rng = jax.random.fold_in(base, epoch)
            for i in range(2):
                rng, srng = jax.random.split(rng)
                state, _ = step_fn(state, batch_for(epoch, i), srng)
        return state

    # uninterrupted: 3 epochs
    state_a = run_epochs(init_train_state(sparams, l0_params, opts), 0, 3)

    # interrupted: 2 epochs -> save -> fresh process state -> restore -> 1 more
    state_b = run_epochs(init_train_state(sparams, l0_params, opts), 0, 2)
    out = str(tmp_path / "ckpt")
    common.save_full_state(out, state_b, {"epoch": 1})
    template = init_train_state(sparams, l0_params, opts)
    restored, extra = common.restore_full_state(out, template)
    assert int(extra["epoch"]) == 1
    state_c = run_epochs(restored, 2, 3)

    for a, c in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
