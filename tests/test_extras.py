"""Tests for alt encoders, grounding, NLVR pretrain, SCST, io shims."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.models.deit import deit_apply, init_deit
from efficientvlm_tpu.models.swin import init_swin, swin_apply, swin_config
from efficientvlm_tpu.models.model_grounding import XVLMForGrounding
from efficientvlm_tpu.models.model_nlvr import XVLMForNLVRPretraining
from efficientvlm_tpu.train.scst import ScstRewardCriterion
from efficientvlm_tpu.utils.io import hcopy, hexists, hlist_files, hmkdir, hopen


def _cfgs():
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=50, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    return vcfg, tcfg


def test_deit_and_swin_forward():
    vcfg, _ = _cfgs()
    p = init_deit(jax.random.PRNGKey(0), vcfg)
    out = deit_apply(p, jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)), vcfg,
                     output_attentions=True, output_hidden_states=True)
    assert out["last_hidden"].shape == (2, 5, 32)
    assert len(out["attentions"]) == 2

    # 56/4 = 14 grid -> stage0 (7-windows, incl. shifted) -> merge -> 7 grid
    scfg = swin_config(image_res=56, patch_size=4, embed_dim=16, depths=(2, 1),
                       num_heads=(2, 4), window_size=7)
    sp = init_swin(jax.random.PRNGKey(2), scfg)
    sout = swin_apply(sp, jax.random.normal(jax.random.PRNGKey(3), (2, 56, 56, 3)), scfg)
    assert sout["last_hidden"].shape == (2, 1 + 49, scfg["vision_width"])
    assert np.isfinite(np.asarray(sout["last_hidden"])).all()


def test_grounding_model():
    vcfg, tcfg = _cfgs()
    model = XVLMForGrounding(vcfg, tcfg, Config({"embed_dim": 16}))
    params = model.init(jax.random.PRNGKey(0), with_bbox_head=True)
    image = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 50)
    atts = jnp.ones((2, 8), jnp.int32)
    target = jnp.asarray([[0.5, 0.5, 0.4, 0.4], [0.3, 0.3, 0.2, 0.2]])
    lb, lg = model.forward(params, image, ids, atts, target_bbox=target, train=True)
    assert np.isfinite(float(lb)) and np.isfinite(float(lg))
    coords = model.forward(params, image, ids, atts, train=False)
    assert coords.shape == (2, 4)
    assert (np.asarray(coords) >= 0).all() and (np.asarray(coords) <= 1).all()


def test_nlvr_pretrain_model():
    vcfg, tcfg = _cfgs()
    model = XVLMForNLVRPretraining(vcfg, tcfg, Config({"embed_dim": 16}))
    params = model.init(jax.random.PRNGKey(0))
    assert "ta_head" in params and params["ta_head"]["kernel"].shape == (32, 3)
    image = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, 50)
    atts = jnp.ones((4, 8), jnp.int32)
    loss = model.forward_pretrain(params, image, ids, atts, rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # ~ln(3) at init (3-way chance)
    assert 0.5 < float(loss) < 2.5


def test_scst_rewards():
    # leave-one-out baseline variant (default is now 'greedy' like the
    # reference ScstRewardCriterion)
    crit = ScstRewardCriterion(sample_n=2, baseline_type="sample")
    gts = [["a dog runs fast", "the dog is running"], ["a red car parked", "the car is red"]]
    sampled = ["a dog runs", "the refrigerator", "a red car", "something else"]
    adv = crit.rewards(gts, sampled)
    assert adv.shape == (4,)
    # good sample beats bad sample within each pair
    assert adv[0] > adv[1] and adv[2] > adv[3]
    # leave-one-out baseline makes pairs sum to zero
    np.testing.assert_allclose(adv[0] + adv[1], 0.0, atol=1e-5)

    logp = jnp.asarray([-1.0, -2.0, -1.5, -0.5])
    loss = crit.loss(adv, logp)
    assert np.isfinite(float(loss))


def test_io_shims(tmp_path):
    p = tmp_path / "sub"
    hmkdir(str(p))
    assert hexists(str(p))
    with hopen(str(p / "x.txt"), "w") as f:
        f.write("hello\nworld\n")
    with hopen(str(p / "x.txt"), "r") as f:
        assert f.read().startswith("hello")
    hcopy(str(p / "x.txt"), str(p / "y.txt"))
    files = hlist_files([str(p)])
    assert len(files) == 2


def test_fractional_warmup_survives_build_optimizers():
    """num_warmup_steps: 0.1 (every shipped fine-tune config) is a FRACTION
    of total updates (reference scheduler.py) — build_optimizers must not
    truncate it to int(0.1)=0, which silently disables LR warmup."""
    from efficientvlm_tpu.drivers.common import resolve_warmup
    from efficientvlm_tpu.train.scheduler import create_scheduler

    # fraction passes through untouched (it rescales with the shrunk
    # update count by itself)
    assert resolve_warmup(0.1, accum=1) == 0.1
    assert resolve_warmup(0.1, accum=4) == 0.1
    # absolute step counts divide by the accumulation factor
    assert resolve_warmup(20, accum=2) == 10
    assert resolve_warmup(2500, accum=1) == 2500

    lr = 3e-5
    sched = create_scheduler(lr=lr, num_training_steps=100,
                             num_warmup_steps=resolve_warmup(0.1, accum=1))
    # warmup = 10 updates: lr ramps linearly, full lr only at update 10
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), lr, rtol=1e-6)


def test_skip_nonfinite_updates_guard():
    """skip_nonfinite_updates: N (reference apex AMP overflow-skip parity):
    a NaN grad leaves params and moments untouched; a finite grad applies
    normally afterwards."""
    import jax
    import jax.numpy as jnp
    import optax

    from efficientvlm_tpu.config import Config
    from efficientvlm_tpu.drivers.common import build_optimizers

    params = {"w": jnp.ones((4,))}
    opt, _, _ = build_optimizers(
        params, Config({"skip_nonfinite_updates": 3,
                        "optimizer": {"lr": 0.1}}), total_steps=10)
    state = opt.init(params)

    bad = {"w": jnp.full((4,), jnp.nan)}
    upd, state2 = opt.update(bad, state, params)
    p2 = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.ones(4))
    assert int(state2.notfinite_count) == 1

    good = {"w": jnp.ones((4,))}
    upd, state3 = opt.update(good, state2, params)
    p3 = optax.apply_updates(params, upd)
    assert not np.allclose(np.asarray(p3["w"]), np.ones(4))
    assert int(state3.notfinite_count) == 0


def test_grad_accumulation_matches_big_batch():
    """accelerator.GRAD_ACCUMULATE_STEPS=k (optax.MultiSteps in
    build_optimizers): k micro-batch steps == one k-times-larger-batch step
    for a linear model with SGD-like semantics; with AdamW the UPDATE only
    fires every k micro-steps and params are frozen in between."""
    from efficientvlm_tpu.drivers.common import build_optimizers

    params = {"w": jnp.ones((4, 4))}
    cfg = Config({
        "optimizer": {"lr": 1e-2, "weight_decay": 0.0},
        "schedular": {"num_warmup_steps": 0},
        "accelerator": {"GRAD_ACCUMULATE_STEPS": 2, "CLIP_GRAD_NORM": 0},
    })
    opt, _, _ = build_optimizers(params, cfg, total_steps=8)
    state = opt.init(params)
    g1 = {"w": jnp.full((4, 4), 0.5)}
    g2 = {"w": jnp.full((4, 4), 1.5)}

    up1, state = opt.update(g1, state, params)
    # mid-accumulation: no real update yet
    assert float(jnp.abs(up1["w"]).max()) == 0.0
    up2, state = opt.update(g2, state, params)
    assert float(jnp.abs(up2["w"]).max()) > 0.0

    # the applied update equals one AdamW step on the micro-batch MEAN grad
    cfg1 = Config({**cfg.to_dict(), "accelerator": {"GRAD_ACCUMULATE_STEPS": 1, "CLIP_GRAD_NORM": 0}})
    ref_opt, _, _ = build_optimizers(params, cfg1, total_steps=4)
    ref_state = ref_opt.init(params)
    ref_up, _ = ref_opt.update({"w": (g1["w"] + g2["w"]) / 2}, ref_state, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), np.asarray(ref_up["w"]), rtol=1e-5, atol=1e-7)
