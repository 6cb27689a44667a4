"""Teacher KD targets must be deterministic (teacher in eval mode).

The reference puts every teacher in .eval() under no_grad (Eff_NLVR.py,
Eff_Retrieval.py, Eff_VQA.py teacher setup), so KD targets never depend on
the dropout rng. Regression for the round-2 bug where the NLVR driver's
teacher_forward passed train=True.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig

DRIVER_DIR = "efficientvlm_tpu/drivers"


def _cfgs(dropout=0.3):
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=32, patch_size=8, attention_dropout=dropout,
    )
    tcfg = TextConfig.create(
        vocab_size=200, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=48,
        hidden_dropout_prob=dropout, attention_probs_dropout_prob=dropout,
    )
    return vcfg, tcfg


def _assert_rng_invariant(fwd, *, should_vary_in_train):
    """fwd(rng, train) -> pytree; eval mode must ignore the rng."""
    a = fwd(jax.random.PRNGKey(0), False)
    b = fwd(jax.random.PRNGKey(1), False)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    if should_vary_in_train:
        # sanity: the test has teeth — train=True with different rngs differs
        c = fwd(jax.random.PRNGKey(0), True)
        d = fwd(jax.random.PRNGKey(1), True)
        diffs = [
            not np.array_equal(np.asarray(lc), np.asarray(ld))
            for lc, ld in zip(jax.tree.leaves(c), jax.tree.leaves(d))
        ]
        assert any(diffs), "dropout>0 with train=True should be stochastic"


def test_nlvr_teacher_deterministic():
    from efficientvlm_tpu.models.model_nlvr import XVLMForNLVR

    vcfg, tcfg = _cfgs()
    model = XVLMForNLVR(vcfg, tcfg, Config({"embed_dim": 16}))
    params = model.init(jax.random.PRNGKey(0))
    images = jnp.zeros((4, 32, 32, 3))
    ids = jnp.ones((2, 8), jnp.int32)
    atts = jnp.ones((2, 8), jnp.int32)
    targets = jnp.zeros((2,), jnp.int32)

    def fwd(rng, train):
        out = model.forward(
            params, images, ids, atts, targets, rng=rng, train=train,
            output_attentions=True, output_hidden_states=True,
        )
        return {k: out[k] for k in ("hidden_dict", "attention_dict", "logits_dict")
                if out.get(k) is not None}

    _assert_rng_invariant(fwd, should_vary_in_train=True)


def test_retrieval_teacher_deterministic():
    from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval

    vcfg, tcfg = _cfgs()
    model = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 16}))
    params = model.init(jax.random.PRNGKey(0))

    def fwd(rng, train):
        out = model.forward(
            params, jnp.zeros((2, 32, 32, 3)), jnp.ones((2, 8), jnp.int32),
            jnp.ones((2, 8), jnp.int32), idx=jnp.arange(2), rng=rng, train=train,
            output_attentions=True, output_hidden_states=True,
        )
        return {k: out[k] for k in ("hidden_dict", "attention_dict", "logits_dict")
                if out.get(k) is not None}

    _assert_rng_invariant(fwd, should_vary_in_train=True)


@pytest.mark.parametrize("driver", ["nlvr", "vqa", "captioning", "retrieval", "gd"])
def test_driver_source_teacher_eval_mode(driver, repo_root):
    """Every KD driver's teacher forward must pass train=False (source-level
    guard: the model-level tests above prove train=False is sufficient; this
    pins that the drivers actually use it)."""
    import os

    path = os.path.join(repo_root, DRIVER_DIR, f"{driver}.py")
    if driver in ("retrieval", "gd"):
        # retrieval/gd teacher forwards live in train/steps.py factories
        path = os.path.join(repo_root, "efficientvlm_tpu/train/steps.py")
    src = open(path).read()
    blocks = re.findall(
        r"def teacher_forward.*?(?=\n    def |\n\ndef |\nclass |\Z)", src, re.S
    ) or re.findall(r"def teacher_fwd.*?(?=\n    def |\n\ndef |\nclass |\Z)", src, re.S)
    if driver in ("retrieval", "gd"):
        # steps.py: the teacher call is the train=False forward following
        # 'teacher.forward' / the _teacher_* helper
        assert "train=False" in src
        assert not re.search(r"teacher\.forward\([^)]*train=True", src, re.S)
        return
    assert blocks, f"no teacher_forward found in {path}"
    for b in blocks:
        assert "train=True" not in b, f"{driver}: teacher_forward runs with dropout"
