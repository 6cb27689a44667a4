"""ZeRO-1 optimizer-state sharding (parallel/zero.py): the pjit'd step with
sharded AdamW moments must match the replicated jit of the SAME step fn,
while actually storing ~1/N of the moment bytes per device."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
from efficientvlm_tpu.parallel.zero import (
    sharded_moment_bytes,
    state_shardings,
    zero1_state_specs,
    zero1_step,
)
from efficientvlm_tpu.pruning.l0_module import XVLML0Module
from efficientvlm_tpu.train.optim import (
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
)
from efficientvlm_tpu.train.steps import init_train_state, make_retrieval_train_step


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
    return model, model.init(jax.random.PRNGKey(seed))


def _setup():
    student, sparams = _mk(2, 4, seed=0)
    teacher, tparams = _mk(4, 4, seed=1)
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
    # axis_name=None: global-batch semantics — XLA inserts the collectives
    step = make_retrieval_train_step(student, teacher, l0, opts, teacher_params=tparams)
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (8, 16, 16, 3)),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (8, 8), 0, 50),
        "text_atts": jnp.ones((8, 8), jnp.int32),
        "idx": jnp.arange(8),
    }
    return step, state, batch


def test_zero1_specs_shard_moments_only():
    _, state, _ = _setup()
    specs = zero1_state_specs(state, 8)
    # params / gates / lambdas replicated
    for leaf in jax.tree.leaves(specs.params) + jax.tree.leaves(specs.loga) + jax.tree.leaves(specs.lam):
        assert leaf == jax.sharding.PartitionSpec()
    # at least the big AdamW moment matrices shard on 'data'
    sharded = [s for s in jax.tree.leaves(specs.opt_state, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
               if s != jax.sharding.PartitionSpec()]
    assert len(sharded) > 10
    assert all("data" in [a for a in s if a] for s in sharded)


def test_zero1_matches_replicated_jit():
    step, state, batch = _setup()
    plain = jax.jit(step)
    zfn, mesh, n = zero1_step(step, state)
    assert mesh is not None and n == len(jax.devices())

    zstate = jax.device_put(state, state_shardings(mesh, state))
    mem = sharded_moment_bytes(zstate)
    # the big moments live sharded: per-device bytes well under the replica
    assert mem["per_device_bytes"] < 0.6 * mem["replicated_bytes"], mem

    s_a, s_b = state, zstate
    for i in range(3):
        rng = jax.random.PRNGKey(100 + i)
        s_a, m_a = plain(s_a, batch, rng)
        s_b, m_b = zfn(s_b, batch, rng)

    for la, lb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-5, rtol=2e-4)
    for la, lb in zip(jax.tree.leaves(s_a.loga), jax.tree.leaves(s_b.loga)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-5, rtol=2e-4)
    for (k, va), vb in zip(sorted(m_a.items()), (v for _, v in sorted(m_b.items()))):
        np.testing.assert_allclose(float(va), float(vb), atol=1e-4, rtol=1e-3), k

    # moments are REALLY distributed: a sharded leaf's local shard is smaller
    big = [l for l in jax.tree.leaves(s_b.opt_state)
           if hasattr(l, "sharding") and any(l.sharding.spec)]
    assert big, "no sharded moment leaves"
    l = big[0]
    assert l.addressable_shards[0].data.size < l.size


def test_zero1_save_restore_roundtrip(tmp_path):
    """save_full_state must gather sharded ZeRO-1 moments before writing
    (rank 0 cannot host-fetch non-addressable leaves on real multihost
    meshes) and restore into a plain replicated template."""
    from efficientvlm_tpu.drivers import common

    step, state, batch = _setup()
    zfn, mesh, _ = zero1_step(step, state)
    zstate = jax.device_put(state, state_shardings(mesh, state))
    zstate, _ = zfn(zstate, batch, jax.random.PRNGKey(0))

    common.save_full_state(str(tmp_path), zstate, {"epoch": 3})
    restored, extra = common.restore_full_state(str(tmp_path), state)
    assert int(extra["epoch"]) == 3
    for la, lb in zip(jax.tree.leaves(zstate), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
