"""Jittable generation tests: greedy == uncached argmax; beam sanity; VQA rank."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.generation import (
    generate_beam,
    generate_no_beam,
    make_bert_decode_fn,
    top_p_filter,
    apply_repetition_penalty,
)
from efficientvlm_tpu.models import bert as B
from efficientvlm_tpu.models.model_generation import XVLMForCaptioning, XVLMForVQA


@pytest.fixture(scope="module")
def decoder_setup():
    cfg = TextConfig.create(
        vocab_size=40, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=24, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = B.init_bert(jax.random.PRNGKey(0), cfg, with_mlm_head=True)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 24))
    enc_atts = jnp.ones((2, 5), jnp.int32)
    return cfg, params, enc, enc_atts


def _uncached_greedy(params, cfg, enc, enc_atts, prompt, max_length, eos_id, pad_id):
    """Reference-style Python-loop greedy: full forward each step."""
    tokens = np.array(prompt)
    bsz = tokens.shape[0]
    finished = np.zeros(bsz, bool)
    while tokens.shape[1] < max_length:
        out = B.bert_apply(
            params, jnp.asarray(tokens), cfg,
            encoder_hidden=enc, encoder_attention_mask=enc_atts,
            mode="multi_modal", is_decoder=True,
        )
        logits = B.mlm_head_apply(params["cls"], out["last_hidden"], cfg)
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))
        nxt = np.where(finished, pad_id, nxt)
        finished |= nxt == eos_id
        tokens = np.concatenate([tokens, nxt[:, None]], axis=1)
    return tokens


def test_greedy_matches_uncached(decoder_setup):
    cfg, params, enc, enc_atts = decoder_setup
    prompt = np.array([[1, 7], [1, 9]])
    max_len, eos, pad = 10, 2, 0
    decode_fn = make_bert_decode_fn(params, cfg, encoder_hidden=enc, encoder_atts=enc_atts)
    cache = B.init_bert_cache(params, cfg, 2, max_len)
    tokens, logprobs = jax.jit(
        lambda c: generate_no_beam(
            decode_fn, c, jnp.asarray(prompt), max_length=max_len, eos_id=eos, pad_id=pad
        )
    )(cache)
    ref = _uncached_greedy(params, cfg, enc, enc_atts, prompt, max_len, eos, pad)
    np.testing.assert_array_equal(np.asarray(tokens), ref)
    assert np.all(np.isfinite(np.asarray(logprobs)))


def test_precomputed_cross_kv_matches_recompute(decoder_setup):
    """bert_apply(cross_kv=precompute_cross_kv(...)) must equal the plain
    per-call K/V projection path bit-for-bit (same dots, same order)."""
    cfg, params, enc, enc_atts = decoder_setup
    ids = jnp.asarray(np.array([[1, 7, 3], [1, 9, 4]]))
    plain = B.bert_apply(params, ids, cfg, encoder_hidden=enc,
                         encoder_attention_mask=enc_atts,
                         mode="multi_modal", is_decoder=True)
    kv = B.precompute_cross_kv(params, cfg, enc)
    assert len(kv) == cfg["num_hidden_layers"] - cfg["fusion_layer"]
    pre = B.bert_apply(params, ids, cfg, encoder_hidden=enc,
                       encoder_attention_mask=enc_atts,
                       mode="multi_modal", is_decoder=True, cross_kv=kv)
    np.testing.assert_array_equal(np.asarray(plain["last_hidden"]),
                                  np.asarray(pre["last_hidden"]))


def test_beam_one_equals_greedy(decoder_setup):
    cfg, params, enc, enc_atts = decoder_setup
    prompt = np.array([[1, 7], [1, 9]])
    max_len, eos, pad = 10, 2, 0
    decode_fn = make_bert_decode_fn(params, cfg, encoder_hidden=enc, encoder_atts=enc_atts)
    cache = B.init_bert_cache(params, cfg, 2, max_len)
    greedy, _ = generate_no_beam(
        decode_fn, cache, jnp.asarray(prompt), max_length=max_len, eos_id=eos, pad_id=pad
    )
    beam = generate_beam(
        decode_fn, cache, jnp.asarray(prompt), num_beams=1,
        max_length=max_len, eos_id=eos, pad_id=pad,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam))


def test_beam_multi(decoder_setup):
    cfg, params, enc, enc_atts = decoder_setup
    prompt = np.array([[1, 7], [1, 9]])
    max_len, eos, pad, beams = 10, 2, 0, 3
    enc_rep = jnp.repeat(enc, beams, axis=0)
    atts_rep = jnp.repeat(enc_atts, beams, axis=0)
    decode_fn = make_bert_decode_fn(params, cfg, encoder_hidden=enc_rep, encoder_atts=atts_rep)
    cache = B.init_bert_cache(params, cfg, 2 * beams, max_len)
    out = jax.jit(
        lambda c: generate_beam(
            decode_fn, c, jnp.asarray(prompt), num_beams=beams,
            max_length=max_len, eos_id=eos, pad_id=pad,
        )
    )(cache)
    assert out.shape == (2, max_len)
    np.testing.assert_array_equal(np.asarray(out[:, :2]), prompt)


def test_top_p_and_repetition_penalty():
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    filtered = top_p_filter(logits, 0.7)
    assert float(filtered[0, 0]) == 2.0
    assert float(filtered[0, 3]) < -1e8

    toks = jnp.asarray([[0, 1]])
    valid = jnp.ones((1, 2))
    pen = apply_repetition_penalty(logits, toks, valid, 2.0)
    assert float(pen[0, 0]) == 1.0  # 2.0/2
    assert float(pen[0, 2]) == 0.0  # unseen unchanged


def test_captioning_and_vqa_models():
    vcfg = VisionConfig.create(
        vision_width=24, num_attention_heads=4, intermediate_size=48,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=40, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=24, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    image = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))

    capt = XVLMForCaptioning(vcfg, tcfg, Config({"label_smoothing": 0.1, "prompt_length": 2}))
    cp = capt.init(jax.random.PRNGKey(3))
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 3, 40)
    atts = jnp.ones((2, 8), jnp.int32)
    loss = capt.forward(cp, image, ids, atts)
    assert np.isfinite(float(loss))
    toks = capt.generate(cp, image, jnp.asarray([[1, 5], [1, 5]]), max_length=8,
                         min_length=2, num_beams=2, eos_id=2, pad_id=0)
    assert toks.shape == (2, 8)

    vqa = XVLMForVQA(vcfg, tcfg, Config({"pad_token_id": 0, "num_dec_layers": 2}))
    vp = vqa.init(jax.random.PRNGKey(5))
    q_ids = jax.random.randint(jax.random.PRNGKey(6), (2, 6), 3, 40)
    q_atts = jnp.ones((2, 6), jnp.int32)
    a_ids = jax.random.randint(jax.random.PRNGKey(7), (5, 4), 3, 40)
    a_ids = a_ids.at[:, 0].set(1)  # BOS
    a_atts = jnp.ones((5, 4), jnp.int32)
    # 5 answers: q0 has 2, q1 has 3
    k_index = jnp.asarray([0, 0, 1, 1, 1])
    weights = jnp.asarray([0.5, 0.5, 0.3, 0.3, 0.4])
    loss = vqa.forward_train(vp, image, q_ids, q_atts, a_ids, a_atts, weights, k_index)
    assert np.isfinite(float(loss))

    ans_list_ids = jax.random.randint(jax.random.PRNGKey(8), (7, 4), 3, 40).at[:, 0].set(1)
    ans_list_atts = jnp.ones((7, 4), jnp.int32)
    topk_ids, topk_probs = vqa.forward_eval(
        vp, image, q_ids, q_atts, ans_list_ids, ans_list_atts, k=3
    )
    assert topk_ids.shape == (2, 3) and topk_probs.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(topk_probs).sum(-1) <= 1.0 + 1e-5, True)
    # probs sorted descending
    assert np.all(np.diff(np.asarray(topk_probs), axis=1) <= 1e-6)


def test_grouped_kv_attention_matches_repeated():
    """multi_head_attention with K/V at B rows and queries at B*G rows must
    equal the repeat-expanded computation (grouped-K/V sharing)."""
    from efficientvlm_tpu.ops.attention import multi_head_attention, project_kv

    key = jax.random.PRNGKey(0)
    b, g, tq, s, w, heads = 2, 3, 4, 5, 32, 4
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    params = {
        "q": {"kernel": jax.random.normal(k1, (w, w)) * 0.1, "bias": jnp.zeros(w)},
        "k": {"kernel": jax.random.normal(k2, (24, w)) * 0.1, "bias": jnp.zeros(w)},
        "v": {"kernel": jax.random.normal(k3, (24, w)) * 0.1, "bias": jnp.zeros(w)},
        "out": {"kernel": jax.random.normal(k4, (w, w)) * 0.1, "bias": jnp.zeros(w)},
    }
    xq = jax.random.normal(k5, (b * g, tq, w))
    enc = jax.random.normal(k6, (b, s, 24))
    kv = project_kv(params, enc, num_heads=heads)
    kv_rep = {"k": jnp.repeat(kv["k"], g, axis=0), "v": jnp.repeat(kv["v"], g, axis=0)}
    # per-kv-row bias [B,1,1,S] (mask on the encoder side)
    bias = jnp.where(jnp.arange(s)[None, None, None, :] < 4, 0.0, -1e9) * jnp.ones((b, 1, 1, 1))
    bias_rep = jnp.repeat(bias, g, axis=0)
    head_z = jnp.asarray([1.0, 0.0, 1.0, 0.5])

    grouped, gp, _ = multi_head_attention(
        params, xq, enc[:1] * 0,  # x_kv unused with precomputed_kv
        num_heads=heads, precomputed_kv=kv, kv_groups=g, bias=bias,
        head_z=head_z, output_probs=True)
    ref, rp, _ = multi_head_attention(
        params, xq, None, num_heads=heads, precomputed_kv=kv_rep,
        bias=bias_rep, head_z=head_z, output_probs=True)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), rtol=2e-5, atol=2e-5)

    # an UNDECLARED batch mismatch must stay a loud error (a silent q->q//G
    # pairing for an accidental divisible mismatch is garbage output)
    import pytest
    with pytest.raises((ValueError, TypeError)):
        multi_head_attention(params, xq, None, num_heads=heads,
                             precomputed_kv=kv, bias=bias)
    with pytest.raises((ValueError, TypeError)):
        multi_head_attention(params, xq, None, num_heads=heads,
                             precomputed_kv=kv, kv_groups=g + 1, bias=bias)


def test_beam_grouped_kv_matches_expanded(decoder_setup):
    """Beam decode with UNEXPANDED encoder states (grouped cross K/V) must
    produce the same tokens as the repeat-expanded decode_fn."""
    cfg, params, enc, enc_atts = decoder_setup
    prompt = np.array([[1, 7], [1, 9]])
    max_len, eos, pad, beams = 10, 2, 0, 3

    dfn_grouped = make_bert_decode_fn(params, cfg, encoder_hidden=enc, encoder_atts=enc_atts)
    dfn_expanded = make_bert_decode_fn(
        params, cfg,
        encoder_hidden=jnp.repeat(enc, beams, axis=0),
        encoder_atts=jnp.repeat(enc_atts, beams, axis=0))
    cache = B.init_bert_cache(params, cfg, 2 * beams, max_len)
    out_g = generate_beam(dfn_grouped, cache, jnp.asarray(prompt), num_beams=beams,
                          max_length=max_len, eos_id=eos, pad_id=pad)
    out_e = generate_beam(dfn_expanded, cache, jnp.asarray(prompt), num_beams=beams,
                          max_length=max_len, eos_id=eos, pad_id=pad)
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_e))


def test_rank_answer_grouped_kv_matches_repeated():
    """VQA rank_answer with grouped question K/V must match the
    repeat-expanded scoring call (ranking + probabilities)."""
    from efficientvlm_tpu.config import TextConfig, VisionConfig, Config
    from efficientvlm_tpu.models.model_generation import XVLMForVQA

    vcfg = VisionConfig.create(
        vision_width=24, num_attention_heads=4, intermediate_size=48,
        num_hidden_layers=2, image_res=16, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=40, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, encoder_width=24, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    vqa = XVLMForVQA(vcfg, tcfg, Config({"pad_token_id": 0, "num_dec_layers": 2}))
    vp = vqa.init(jax.random.PRNGKey(5))
    nq, na, k = 2, 6, 3
    q_states = jax.random.normal(jax.random.PRNGKey(8), (nq, 6, 32))
    q_atts = jnp.ones((nq, 6), jnp.int32)
    a_ids = jax.random.randint(jax.random.PRNGKey(9), (na, 4), 3, 40)
    a_ids = a_ids.at[:, 0].set(1)
    a_atts = jnp.ones((na, 4), jnp.int32)

    ids_g, probs_g = vqa.rank_answer(vp, q_states, q_atts, a_ids, a_atts, k)

    # repeat-expanded reference: monkeypatch-free — call rank_answer on each
    # question independently (groups of one trivially bypass sharing)
    ids_1 = []
    probs_1 = []
    for i in range(nq):
        ii, pp = vqa.rank_answer(vp, q_states[i:i + 1], q_atts[i:i + 1], a_ids, a_atts, k)
        ids_1.append(np.asarray(ii[0]))
        probs_1.append(np.asarray(pp[0]))
    np.testing.assert_array_equal(np.asarray(ids_g), np.stack(ids_1))
    np.testing.assert_allclose(np.asarray(probs_g), np.stack(probs_1), rtol=2e-5, atol=2e-5)
