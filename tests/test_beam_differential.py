"""Differential test: jittable generate_beam == an HF-4.12-style host-loop
beam search (BeamSearchScorer/BeamHypotheses semantics — the reference
decodes through transformers PreTrainedModel.generate) on a synthetic
Markov decoder. Bounds the divergence VERDICT round-1 flagged (weak #6)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.generation import generate_beam

V = 12
EOS = 9
PAD = 0


def make_table(seed):
    rng = np.random.RandomState(seed)
    return rng.randn(V, V).astype(np.float32) * 1.5


def make_decode_fn(table):
    """Markov toy decoder: next-token logits depend on the last token only.
    cache carries nothing (a dummy per-row array so beam gather has a tree)."""
    tbl = jnp.asarray(table)

    def decode_fn(tokens, cache, offset):
        logits = tbl[tokens]  # [B, T, V]
        return logits.astype(jnp.float32), cache

    return decode_fn


def log_softmax_np(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum(-1, keepdims=True))


def hf_beam_host(table, prompt, num_beams, max_length, *, min_length=0, length_penalty=1.0):
    """HF 4.12 beam_search re-implemented as a plain host loop for ONE batch
    row: 2K candidates; eos candidates within the top-K ranks go to the
    hypothesis pool (score / cur_len**lp); K best non-eos continue; finalize
    falls back to live beams at max_length."""
    lp_table = log_softmax_np(table)
    beams = [(0.0, list(prompt))] + [(-1e9, list(prompt)) for _ in range(num_beams - 1)]
    hyps = []  # (norm_score, tokens)

    def add_hyp(score, toks):
        hyps.append((score, toks))
        hyps.sort(key=lambda x: -x[0])
        del hyps[num_beams:]

    for cur_len in range(len(prompt), max_length):
        cands = []
        for bi, (s, toks) in enumerate(beams):
            logp = lp_table[toks[-1]].copy()
            if cur_len < min_length:
                logp[EOS] = -1e9
            for v in range(V):
                cands.append((s + logp[v], bi, v))
        cands.sort(key=lambda x: -x[0])
        new_beams = []
        for rank, (s, bi, v) in enumerate(cands[: 2 * num_beams]):
            if v == EOS:
                if rank < num_beams:
                    add_hyp(s / (cur_len ** length_penalty), beams[bi][1] + [EOS])
                continue
            new_beams.append((s, beams[bi][1] + [v]))
            if len(new_beams) == num_beams:
                break
        beams = new_beams
    for s, toks in beams:
        add_hyp(s / (max_length ** length_penalty), toks)
    best = hyps[0][1]
    return best + [PAD] * (max_length - len(best))


def test_beam_matches_hf_host_loop():
    mismatches = 0
    for seed in range(8):
        table = make_table(seed)
        decode_fn = make_decode_fn(table)
        prompt = np.asarray([[1, 2]])
        out = generate_beam(
            decode_fn, jnp.zeros((3, 1)), jnp.asarray(prompt),
            num_beams=3, max_length=10, eos_id=EOS, pad_id=PAD, min_length=4,
        )
        want = hf_beam_host(table, [1, 2], 3, 10, min_length=4)
        got = list(np.asarray(out)[0])
        # pad tail after eos may differ in representation; compare up to eos
        def trim(t):
            t = list(t)
            return t[: t.index(EOS) + 1] if EOS in t else t
        if trim(got) != trim(want):
            mismatches += 1
    assert mismatches == 0, f"{mismatches}/8 beam outputs diverge from HF semantics"


def test_beam_pool_prefers_early_finished():
    """A hypothesis that finishes early with a high normalized score must
    survive even when live beams keep accumulating negative logprob (the
    round-1 implementation let live beams overwrite finished ones)."""
    # EOS very likely after token 5; the alternative continuation (token 3)
    # leads to a uniform row, so every further step costs ~log(1/V)
    table = np.full((V, V), -5.0, np.float32)
    table[1, 5] = 5.0          # prompt end -> 5
    table[5, EOS] = 6.0        # 5 -> eos (finish fast, high score)
    table[5, 3] = 5.5          # or 5 -> 3, then uniform continuations
    decode_fn = make_decode_fn(table)
    out = generate_beam(
        decode_fn, jnp.zeros((2, 1)), jnp.asarray([[1]]),
        num_beams=2, max_length=12, eos_id=EOS, pad_id=PAD,
    )
    got = list(np.asarray(out)[0])
    assert EOS in got, got
    assert got[: got.index(EOS) + 1] == [1, 5, EOS]


def make_counting_decode_fn(table):
    """Markov decoder whose cache carries a step counter — generate_* treats
    the cache as an opaque pytree (the scalar passes through beam gathers
    untouched), so the counter observes how many decode steps actually ran."""
    tbl = jnp.asarray(table)

    def decode_fn(tokens, cache, offset):
        return tbl[tokens].astype(jnp.float32), {
            "dummy": cache["dummy"], "steps": cache["steps"] + 1}

    return decode_fn


def test_greedy_early_exit_is_output_identical():
    """while_loop early exit: once every row emits EOS the loop stops; the
    returned tokens/logprobs equal the host greedy loop run to max_length."""
    table = np.full((V, V), -4.0, np.float32)
    table[1, 5] = 3.0
    table[5, 6] = 3.0
    table[6, EOS] = 4.0   # every row finishes after 3 generated tokens
    from efficientvlm_tpu.generation import generate_no_beam

    decode_fn = make_counting_decode_fn(table)
    max_length = 16
    cache = {"dummy": jnp.zeros((2, 1)), "steps": jnp.asarray(0)}
    tokens, logp = generate_no_beam(
        decode_fn, cache, jnp.asarray([[1], [1]]),
        max_length=max_length, eos_id=EOS, pad_id=PAD)
    got = np.asarray(tokens)
    np.testing.assert_array_equal(got, [[1, 5, 6, EOS] + [PAD] * 12] * 2)
    # host greedy logprob of the same path
    lp = log_softmax_np(table)
    want = lp[1, 5] + lp[5, 6] + lp[6, EOS]
    np.testing.assert_allclose(np.asarray(logp), [want, want], rtol=1e-5)


def test_greedy_early_exit_step_count():
    """An io_callback inside decode_fn fires once per EXECUTED while_loop
    iteration — proves the loop exited right after all rows hit EOS
    (prefill + 4 steps: 3 generated tokens + the post-EOS logits fetch)
    instead of running all 32 positions."""
    table = np.full((V, V), -4.0, np.float32)
    table[1, 5] = 3.0
    table[5, 6] = 3.0
    table[6, EOS] = 4.0
    from jax.experimental import io_callback

    from efficientvlm_tpu.generation import generate_no_beam

    tbl = jnp.asarray(table)
    calls = []

    def decode_fn(tokens, cache, offset):
        io_callback(lambda: calls.append(1), None, ordered=True)
        return tbl[tokens].astype(jnp.float32), cache

    tokens, _ = jax.jit(lambda: generate_no_beam(
        decode_fn, jnp.zeros((1, 1)), jnp.asarray([[1]]),
        max_length=32, eos_id=EOS, pad_id=PAD))()
    tokens = np.asarray(tokens)
    assert list(tokens[0][:4]) == [1, 5, 6, EOS]
    assert (tokens[0][4:] == PAD).all()
    assert len(calls) <= 6, len(calls)  # 32-step fixed loop would be 32


def test_beam_early_exit_matches_hf_host_loop():
    """Beam early exit (BeamHypotheses.is_done bound) must not change the
    selected hypothesis: same 8-seed differential as
    test_beam_matches_hf_host_loop but on EOS-biased tables where beams
    finish long before max_length."""
    from efficientvlm_tpu.generation import generate_beam

    mismatches = 0
    for seed in range(8):
        table = make_table(seed + 100)
        table[:, EOS] += 4.0  # strong finish bias -> pool fills early
        decode_fn = make_decode_fn(table)
        prompt = np.asarray([[1, 2]])
        out = generate_beam(
            decode_fn, jnp.zeros((3, 1)), jnp.asarray(prompt),
            num_beams=3, max_length=14, eos_id=EOS, pad_id=PAD, min_length=4,
        )
        want = hf_beam_host(table, [1, 2], 3, 14, min_length=4)
        got = list(np.asarray(out)[0])

        def trim(t):
            t = list(t)
            return t[: t.index(EOS) + 1] if EOS in t else t

        if trim(got) != trim(want):
            mismatches += 1
    assert mismatches == 0, f"{mismatches}/8 diverge with early exit"


def test_beam_early_exit_negative_length_penalty():
    """lp < 0 exercises the other is_done denominator branch."""
    from efficientvlm_tpu.generation import generate_beam

    for seed in range(4):
        table = make_table(seed + 40)
        table[:, EOS] += 3.0
        decode_fn = make_decode_fn(table)
        out = generate_beam(
            decode_fn, jnp.zeros((3, 1)), jnp.asarray([[1, 2]]),
            num_beams=3, max_length=12, eos_id=EOS, pad_id=PAD,
            min_length=3, length_penalty=-0.5,
        )
        want = hf_beam_host(table, [1, 2], 3, 12, min_length=3,
                            length_penalty=-0.5)
        got = list(np.asarray(out)[0])

        def trim(t):
            t = list(t)
            return t[: t.index(EOS) + 1] if EOS in t else t

        assert trim(got) == trim(want), (seed, got, want)
