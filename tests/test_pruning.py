"""Hard-concrete gate + L0 module + optimizer/scheduler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.pruning import hard_concrete as hc
from efficientvlm_tpu.pruning.l0_module import NLVRL0Module, VQAL0Module, XVLML0Module
from efficientvlm_tpu.train.optim import (
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
    weight_decay_mask,
)
from efficientvlm_tpu.train.scheduler import create_scheduler


def test_sample_z_statistics():
    """Keep probability E[z>0] must match 1 - cdf_qz(0, loga)."""
    for loga_val in [-2.0, 0.0, 2.0]:
        loga = jnp.full((20000,), loga_val)
        z = hc.sample_z(jax.random.PRNGKey(0), loga)
        assert ((z >= 0) & (z <= 1)).all()
        keep = 1.0 - float(hc.cdf_qz(0.0, jnp.array(loga_val)))
        emp = float((z > 0).mean())
        assert abs(emp - keep) < 0.02, (loga_val, emp, keep)


def test_deterministic_z_topk():
    loga = jnp.array([-3.0, -2.5, 3.0, 4.0, 5.0, 2.0])
    mask = hc.deterministic_z(loga)
    # two very negative logas -> expected zeros ~2, smallest soft scores drop
    assert mask.tolist() == [0.0, 0.0, 1.0, 1.0, 1.0, 1.0]

    # all-high logas -> keep everything
    assert hc.deterministic_z(jnp.full((6,), 10.0)).tolist() == [1.0] * 6


def test_l0_module_layout_and_sparsity():
    m = XVLML0Module(vision_layers=6, text_layers=3, cross_layers=3)
    params = m.init(jax.random.PRNGKey(0))
    zs = m.forward_train(params, jax.random.PRNGKey(1))
    assert zs["vision_head_z"].shape == (6, 12)
    assert zs["cross_head_z"].shape == (3, 2, 12)
    assert zs["cross_intermediate_z"].shape == (3, 3072)

    # head logas init at ~10 => expected sparsity ~ mass of FFN gates at 0.5 keep
    loss, sparsity, target = m.lagrangian_regularization(params, 0)
    assert 0.0 < float(sparsity) < 0.6
    # lambda=0 at init -> zero loss
    assert float(loss) == 0.0

    det = m.forward_deterministic(params)
    sizes = m.calculate_model_size(det)
    assert sizes["remaining_params"] <= m.prunable_model_size
    assert len(sizes["vision_head_nums"]) == 6

    # deterministic head gates are binary
    assert set(np.unique(np.asarray(det["vision_head_z"]))) <= {0.0, 1.0}


def test_vqa_nlvr_layouts():
    v = VQAL0Module(vision_layers=6, text_layers=3, cross_layers=3)
    zs = v.forward_train(v.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    assert zs["decoder_head_z"].shape == (3, 2, 12)
    assert zs["decoder_intermediate_z"].shape == (3, 3072)

    n = NLVRL0Module(vision_layers=6, text_layers=3, cross_layers=3)
    zs = n.forward_train(n.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    assert zs["cross_head_z"].shape == (6, 2, 12)  # doubled two-image stack


def test_lagrangian_max_min_direction():
    """Joint loga-descent / lambda-ascent drives expected sparsity to target."""
    m = XVLML0Module(
        vision_layers=2, text_layers=1, cross_layers=1,
        hidden_size=48, intermediate_size=96, num_heads=4,
        target_sparsity=0.4,
    )
    params = m.init(jax.random.PRNGKey(0))
    l0_opt = create_l0_optimizer(reg_lr=0.1)
    lam_opt = create_lagrangian_optimizer(reg_lr=0.1)
    loga_state = l0_opt.init(params["loga"])
    lam = {"lambda_1": params["lambda_1"], "lambda_2": params["lambda_2"]}
    lam_state = lam_opt.init(lam)

    def lag_loss(loga, lam):
        p = {"loga": loga, **lam}
        return m.lagrangian_regularization(p, 0)[0]

    @jax.jit
    def step(loga, lam, loga_state, lam_state):
        g_loga = jax.grad(lag_loss, argnums=0)(loga, lam)
        g_lam = jax.grad(lag_loss, argnums=1)(loga, lam)
        du, loga_state = l0_opt.update(g_loga, loga_state, loga)
        loga = jax.tree.map(lambda p, u: p + u, loga, du)
        dl, lam_state = lam_opt.update(g_lam, lam_state, lam)
        lam = jax.tree.map(lambda p, u: p + u, lam, dl)
        loga = {k: jnp.clip(v, np.log(1e-2), np.log(1e2)) for k, v in loga.items()}
        return loga, lam, loga_state, lam_state

    loga = params["loga"]
    for _ in range(300):
        loga, lam, loga_state, lam_state = step(loga, lam, loga_state, lam_state)
    p = {"loga": loga, **lam}
    _, sparsity, target = m.lagrangian_regularization(p, 0)
    assert abs(float(sparsity) - 0.4) < 0.05, float(sparsity)


def test_scheduler_shape():
    sched = create_scheduler(lr=1e-4, num_training_steps=100, num_warmup_steps=0.1)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(55)), 1e-4 * 45 / 90, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-12)


def test_weight_decay_mask():
    params = {
        "layers": [
            {
                "attn": {"q": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}},
                "ln1": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
            }
        ],
        "temp": jnp.array(0.07),
    }
    mask = weight_decay_mask(params)
    assert mask["layers"][0]["attn"]["q"]["kernel"] is True
    assert mask["layers"][0]["attn"]["q"]["bias"] is False
    assert mask["layers"][0]["ln1"]["scale"] is False
    assert mask["temp"] is False


def test_optimizer_step_runs():
    params = {"w": {"kernel": jnp.ones((4, 4))}, "b": {"bias": jnp.zeros((4,))}}
    sched = create_scheduler(lr=1e-3, num_training_steps=10, num_warmup_steps=0)
    opt = create_optimizer(params, lr=sched, weight_decay=0.01, grad_clip=1.0)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    assert float(jnp.abs(new["w"]["kernel"] - params["w"]["kernel"]).max()) > 0


def test_head_group_gates_are_pair_aligned():
    """head_group=2: one learned gate drives a 128-lane head pair, so
    deterministic masks always keep an even head count and export
    (prune_xvlm_params) never re-pads for MXU alignment."""
    import numpy as np

    from efficientvlm_tpu.pruning.l0_module import XVLML0Module

    l0 = XVLML0Module(
        vision_layers=2, text_layers=1, cross_layers=1,
        hidden_size=64, intermediate_size=128, num_heads=4,
        target_sparsity=0.25, head_group=2,
    )
    params = l0.init(jax.random.PRNGKey(0))
    assert params["loga"]["vision_head"].shape == (2, 2)  # 4 heads / group 2
    assert params["loga"]["cross_head"].shape == (2, 2)   # 2*Lc rows

    zs = l0.forward_train(params, jax.random.PRNGKey(1))
    assert zs["vision_head_z"].shape == (2, 4)
    # adjacent heads share one gate value
    v = np.asarray(zs["vision_head_z"])
    np.testing.assert_array_equal(v[:, 0], v[:, 1])
    np.testing.assert_array_equal(v[:, 2], v[:, 3])
    assert zs["cross_head_z"].shape == (1, 2, 4)

    det = l0.forward_deterministic(params)
    counts = (np.asarray(det["vision_head_z"]) > 0).sum(-1)
    assert all(c % 2 == 0 for c in counts), counts

    size = l0.calculate_model_size(det)
    assert 0 <= size["pruned_model_sparsity"] <= 1
    # accounting must be in PER-HEAD units even though gates are paired
    total_heads = sum(size["vision_head_nums"])
    assert total_heads == int((np.asarray(det["vision_head_z"]) > 0).sum())
