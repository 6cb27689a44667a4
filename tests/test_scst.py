"""SCST: reward math (reference ScstRewardCriterion, utils/__init__.py:16-97),
the advantage-weighted logprob mechanism, and the --scst driver path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.config import Config
from efficientvlm_tpu.train.scst import ScstRewardCriterion, sequence_logprobs


def test_scst_rewards_leave_one_out():
    crit = ScstRewardCriterion(sample_n=2, baseline_type="sample")
    gts = [["a dog runs in the park"], ["a cat sleeps on the mat"]]
    sampled = [
        "a dog runs in the park",   # perfect for img0
        "banana quantum flux",      # junk for img0
        "a cat sleeps on the mat",  # perfect for img1
        "a cat sleeps on the mat",  # also perfect
    ]
    adv = crit.rewards(gts, sampled)
    assert adv.shape == (4,)
    # perfect vs junk: positive advantage; junk: negative
    assert adv[0] > 0 and adv[1] < 0
    # both perfect: zero advantage (baseline == own score)
    np.testing.assert_allclose(adv[2:], 0.0, atol=1e-6)
    assert crit.get_score() is not None


def test_scst_rewards_greedy_baseline():
    crit = ScstRewardCriterion(sample_n=2, baseline_type="greedy")
    # two images so CIDEr idf is non-degenerate (single-ref corpus idf = 0)
    gts = [["a dog runs in the park"], ["a cat sleeps on the mat"]]
    sampled = [
        "a dog runs in the park", "banana quantum flux",
        "a cat sleeps on the mat", "banana quantum flux",
    ]
    greedy = ["banana quantum flux", "banana quantum flux"]  # bad baselines
    adv = crit.rewards(gts, sampled, greedy)
    assert adv[0] > 0 and adv[2] > 0  # good samples beat the bad greedy
    assert adv[1] == pytest.approx(0.0, abs=1e-5)  # junk == junk baseline


def test_sequence_logprobs_masking():
    """logprobs summed only over generated, pre-eos, non-pad positions."""
    vocab, L = 11, 6
    logits = jnp.zeros((1, L, vocab))  # uniform: each token logp = -log(vocab)
    eos, pad = 9, 0
    # prompt=[5,6] gen=[7, eos] then pads
    tokens = jnp.asarray([[5, 6, 7, eos, pad, pad]])
    lp = sequence_logprobs(logits, tokens, prompt_length=2, eos_id=eos, pad_id=pad)
    # two generated positions counted (7 and eos)
    np.testing.assert_allclose(np.asarray(lp), -2 * np.log(vocab), rtol=1e-5)


def test_scst_grad_increases_positive_advantage_logprob():
    """~20 update steps must push up the logprob of positively-advantaged
    sequences and push down negatively-advantaged ones (VERDICT round-1,
    'reward increasing' mechanism check, deterministic form)."""
    import optax

    from efficientvlm_tpu.config import TextConfig, VisionConfig
    from efficientvlm_tpu.models.model_generation import XVLMForCaptioning
    from efficientvlm_tpu.train.scst import make_scst_step

    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=30, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = XVLMForCaptioning(vcfg, tcfg, Config({"prompt_length": 2}))
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    K = 2
    _, grad_step = make_scst_step(
        model, optimizer, prompt_length=2, pad_token_id=0, eos_id=9,
        sample_n=K, max_length=8,
    )
    grad_fn = jax.jit(grad_step)

    image = jnp.zeros((2, 16, 16, 3))
    # per image: one "good" sequence (+1) and one "bad" (-1)
    tokens = jnp.asarray([
        [5, 6, 7, 8, 9, 0, 0, 0],
        [5, 6, 3, 3, 9, 0, 0, 0],
        [5, 6, 8, 7, 9, 0, 0, 0],
        [5, 6, 4, 4, 9, 0, 0, 0],
    ])
    adv = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    batch = {"image": image, "tokens": tokens, "advantages": adv}

    def mean_logprob(params, rows):
        logits = model.forward_logits(
            params, jnp.repeat(image, K, axis=0), tokens, (tokens != 0).astype(jnp.int32))
        lp = sequence_logprobs(logits, tokens, prompt_length=2, eos_id=9, pad_id=0)
        return float(np.asarray(lp)[np.asarray(rows)].mean())

    good_before = mean_logprob(params, [0, 2])
    bad_before = mean_logprob(params, [1, 3])
    state = (params, optimizer.init(params), jnp.asarray(0))
    for i in range(20):
        state, metrics = grad_fn(state, batch, jax.random.PRNGKey(i))
    good_after = mean_logprob(state[0], [0, 2])
    bad_after = mean_logprob(state[0], [1, 3])
    assert good_after > good_before, (good_before, good_after)
    assert bad_after < bad_before, (bad_before, bad_after)


def test_scst_driver_smoke(tmp_path):
    """--scst end-to-end on synthetic data: runs, logs a reward meter."""
    from PIL import Image

    from efficientvlm_tpu.drivers import captioning
    from tests.test_drivers import tiny_config, write_images

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    # >=5 captions per image so the gt sampler has material
    train_ann = [
        {"image": f"{i}.jpg", "caption": f"a dog in photo {i} variant {j}", "image_id": f"im{i}"}
        for i in range(16) for j in range(5)
    ]
    eval_ann = [{"image": f"COCO_val_00000{i}.jpg"} for i in range(2)]
    for i in range(2):
        Image.fromarray(np.uint8(np.random.rand(40, 40, 3) * 255)).save(
            os.path.join(img_root, f"COCO_val_00000{i}.jpg"))
    json.dump(train_ann, open(tmp_path / "ct.json", "w"))
    json.dump(eval_ann, open(tmp_path / "cv.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "ct.json")],
        val_file=str(tmp_path / "cv.json"),
        image_root=img_root,
        prompt="a picture of ",
        num_beams=1, max_length=8, min_length=2, max_tokens=12,
        scst_sample_n=2,
        batch_size_train_scst=1,
        sparsity=0.0,
    )
    args = Config({"seed": 1, "output_dir": str(tmp_path / "out"), "epoch": 1, "scst": True})
    out = captioning.main(args, cfg)
    assert "reward_history" in out and len(out["reward_history"]) >= 1
    assert all(np.isfinite(r) for r in out["reward_history"])
