"""Jittable autoregressive generation: greedy / sampling / beam search.

TPU-first redesign of the reference's decode paths — HF `generate` beam
search and OSCAR `_generate_no_beam_search` (reference
models/model_generation.py:184-227, xbert.py:1380-1498) run a Python loop
per token on the host; here the whole decode is ONE compiled XLA program:

- fixed-size functional KV cache, `lax.while_loop` over positions with
  early exit once every sequence is finished (greedy/sample) or no live
  beam can beat the finished pool (beam; HF BeamHypotheses.is_done) —
  output-identical to running to max_length, and on real data most
  captions end well before it
- beam reorder = batched gather on the cache
- min_length EOS masking, repetition penalty, top-p filtering as in HF
- gates (zs) thread through every step

The decoder is abstracted as `decode_fn(tokens, cache, offset) ->
(logits, cache)` so the same machinery serves the captioning decoder
(full fusion stack) and the VQA answer decoder (cross-into-question stack).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import TextConfig
from .models import bert as B

Array = jax.Array

NEG_INF = -1e9


def make_bert_decode_fn(
    params: dict,
    cfg: TextConfig,
    *,
    encoder_hidden: Array,
    encoder_atts: Array,
    text_head_z=None,
    cross_head_z=None,
    text_mlp_z=None,
    cross_mlp_z=None,
    dtype=None,
    impl: str = "xla",
) -> Callable:
    """decode_fn over a BertLMHeadModel-equivalent (is_decoder, multi_modal,
    cross-attending into encoder_hidden). Cross K/V over the (step-constant)
    encoder states are projected ONCE here; the fori_loop body closes over
    them as loop invariants, so each decode step only pays the q projection
    and the [1, S] attention — the reference reuses cross K/V the same way
    via HF past_key_value (eff_bert.py:283-295). `encoder_hidden` /
    `encoder_atts` may have FEWER rows than the decode tokens (B vs B*K
    beam- or k-tiled rows, groups contiguous): grouped-K/V attention shares
    each row's K/V across its group instead of materializing repeats."""
    cross_kv = B.precompute_cross_kv(params, cfg, encoder_hidden, dtype=dtype)

    def decode_fn(tokens: Array, cache: list, offset) -> Tuple[Array, list]:
        # the grouped-K/V opt-in boundary: token rows at B*K vs encoder rows
        # at B is DELIBERATE here (beam/k-tiled expansion), so derive G and
        # declare it — deeper layers treat undeclared mismatches as errors
        groups = tokens.shape[0] // encoder_hidden.shape[0]
        out = B.bert_apply(
            params, tokens, cfg,
            encoder_hidden=encoder_hidden, encoder_attention_mask=encoder_atts,
            mode="multi_modal", is_decoder=True, cache=cache, cross_kv=cross_kv,
            encoder_groups=groups, position_offset=offset,
            text_head_z=text_head_z, cross_head_z=cross_head_z,
            text_mlp_z=text_mlp_z, cross_mlp_z=cross_mlp_z,
            dtype=dtype, impl=impl,
        )
        logits = B.mlm_head_apply(params["cls"], out["last_hidden"], cfg, dtype=dtype)
        # logits stay in the COMPUTE dtype (bf16 on chip): the beam fast
        # path ranks candidates on the raw values (bf16 -> f32 is monotone,
        # so the selection is provably identical) and only the <= K*(2K+1)
        # selected candidates ever get exact f32 scores — casting the full
        # [B*K, V] tensor here doubled the decode loop's logits traffic
        return logits, out["cache"]

    return decode_fn


def apply_repetition_penalty(logits: Array, tokens: Array, valid: Array, penalty: float) -> Array:
    """HF semantics: for tokens already generated, divide positive logits by
    `penalty`, multiply negative ones."""
    if penalty == 1.0:
        return logits
    vocab = logits.shape[-1]
    onehot = jax.nn.one_hot(tokens, vocab, dtype=jnp.float32) * valid[..., None]
    seen = jnp.clip(onehot.sum(axis=-2), 0, 1)  # [B, V]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen > 0, penalized, logits)


def top_p_filter(logits: Array, top_p: float) -> Array:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)  # keep one past
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def generate_no_beam(
    decode_fn: Callable,
    init_cache: list,
    prompt_ids: Array,
    *,
    max_length: int,
    eos_id: int,
    pad_id: int,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    min_length: int = 0,
    rng: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Greedy/sampling decode (OSCAR _generate_no_beam_search semantics).
    Returns (tokens [B, max_length], sum_logprobs [B])."""
    bsz, prompt_len = prompt_ids.shape
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    tokens = jnp.full((bsz, max_length), pad_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0, 0))

    # prefill the prompt
    logits, cache = decode_fn(prompt_ids, init_cache, 0)
    next_logits = logits[:, -1]

    class _S(NamedTuple):
        cur_len: Array
        tokens: Array
        next_logits: Array
        cache: list
        finished: Array
        sum_logprobs: Array
        rng: Array

    state = _S(jnp.asarray(prompt_len), tokens, next_logits, cache,
               jnp.zeros((bsz,), bool), jnp.zeros((bsz,)), rng)

    def body(s: _S) -> _S:
        cur_len = s.cur_len
        logits = s.next_logits.astype(jnp.float32) / temperature
        valid = (jnp.arange(max_length) < cur_len).astype(jnp.float32)[None, :]
        logits = apply_repetition_penalty(logits, s.tokens, valid, repetition_penalty)
        logits = jnp.where(cur_len < min_length, logits.at[:, eos_id].set(NEG_INF), logits)
        logp = jax.nn.log_softmax(logits, axis=-1)
        if do_sample:
            filtered = top_p_filter(logits, top_p)
            rng, key = jax.random.split(s.rng)
            next_tok = jax.random.categorical(key, filtered, axis=-1)
        else:
            rng = s.rng
            next_tok = jnp.argmax(logits, axis=-1)
        next_tok = jnp.where(s.finished, pad_id, next_tok).astype(jnp.int32)
        tok_logp = jnp.take_along_axis(logp, next_tok[:, None], axis=1)[:, 0]
        sum_logprobs = s.sum_logprobs + jnp.where(s.finished, 0.0, tok_logp)
        tokens = jax.lax.dynamic_update_slice(s.tokens, next_tok[:, None], (0, cur_len))
        finished = s.finished | (next_tok == eos_id)
        step_logits, cache = decode_fn(next_tok[:, None], s.cache, cur_len)
        return _S(cur_len + 1, tokens, step_logits[:, -1], cache, finished,
                  sum_logprobs, rng)

    # early exit when every row has emitted EOS (the reference's HF
    # generate stops the same way) — provably output-identical to running
    # to max_length: finished rows append pad and freeze sum_logprobs
    state = jax.lax.while_loop(
        lambda s: (s.cur_len < max_length) & ~jnp.all(s.finished), body, state)
    return state.tokens, state.sum_logprobs


def _gather_beams(tree, beam_idx: Array, bsz: int, beams: int):
    """Reorder a [B*K, ...] pytree by per-batch beam indices [B, K]."""

    def g(x):
        if x.ndim == 0:  # scalars (e.g. cache index) are beam-invariant
            return x
        xr = x.reshape((bsz, beams) + x.shape[1:])
        return jnp.take_along_axis(
            xr, beam_idx.reshape((bsz, beams) + (1,) * (x.ndim - 1)), axis=1
        ).reshape(x.shape)

    return jax.tree.map(g, tree)


def generate_beam(
    decode_fn: Callable,
    init_cache: list,
    prompt_ids: Array,
    *,
    num_beams: int,
    max_length: int,
    eos_id: int,
    pad_id: int,
    min_length: int = 0,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
) -> Array:
    """Beam search with an HF-style finished-hypothesis pool (the reference
    decodes via transformers PreTrainedModel.generate / BeamHypotheses):
    live beams always continue with the best K non-EOS continuations from
    2K candidates; EOS candidates are INSERTED into a per-batch pool of K
    finished hypotheses (score normalized by gen_len**length_penalty at
    insertion, HF's `add`) instead of freezing a live slot. Jittable:
    fixed-size pool, fori_loop over positions, cache reorder via gather.

    prompt_ids [B, P] (NOT beam-expanded; the self-attention cache must be
    sized for B*K rows, while encoder states / cross K/V stay UNEXPANDED at
    B rows — all K beams of an image share its cross K/V through
    grouped-K/V attention, ops/attention.py). Returns best tokens
    [B, max_length]."""
    bsz, prompt_len = prompt_ids.shape
    flat = bsz * num_beams
    prompt_flat = jnp.repeat(prompt_ids, num_beams, axis=0)

    tokens = jnp.full((flat, max_length), pad_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_flat.astype(jnp.int32), (0, 0))

    logits, cache = decode_fn(prompt_flat, init_cache, 0)
    next_logits = logits[:, -1]

    # live scores: only beam 0 seeded per batch (duplicate prompts would
    # otherwise fill the beam with identical candidates)
    scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (num_beams - 1)), (bsz,))

    class _S(NamedTuple):
        cur_len: Array
        tokens: Array        # [B*K, L] live
        next_logits: Array   # [B*K, V]
        cache: list
        scores: Array        # [B*K] raw live scores
        fin_tokens: Array    # [B, K, L] finished pool
        fin_scores: Array    # [B, K] normalized finished scores

    state = _S(
        jnp.asarray(prompt_len), tokens, next_logits, cache, scores,
        jnp.full((bsz, num_beams, max_length), pad_id, jnp.int32),
        jnp.full((bsz, num_beams), NEG_INF),
    )
    vocab = next_logits.shape[-1]
    k2 = 2 * num_beams

    def body(s: _S) -> _S:
        cur_len = s.cur_len
        if repetition_penalty == 1.0 and vocab >= k2 + 1:
            # Fast path (the production caption/VQA configs): the decode
            # loop is bandwidth-bound on [B*K, V] logits passes, so never
            # materialize a full-vocab f32 tensor. Per-row top-(2K+1) on
            # the RAW compute-dtype logits is rank-identical to top-k on
            # f32 log-probs (bf16 -> f32 is monotone injective and
            # score_row + logp_row is a per-row monotone shift; ties cast
            # to equal f32 values and break by token id either way), and
            # 2K+1 candidates per row keep >= 2K after the min-length EOS
            # mask drops at most one per row. Only the K*(2K+1) selected
            # candidates get exact f32 log-probs via a per-row logsumexp
            # (two fused read passes, no full-vocab write). Equivalence
            # is pinned by tests/test_beam_differential.py.
            kc = k2 + 1
            raw = s.next_logits                              # [B*K, V]
            cand_logit, cand_tok = jax.lax.top_k(raw, kc)    # [B*K, kc]
            x = raw.astype(jnp.float32)
            m = jnp.max(x, axis=-1, keepdims=True)
            log_s = jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))
            # same association as jax.nn.log_softmax: (x - m) - log S
            logp_cand = (cand_logit.astype(jnp.float32) - m) - log_s
            logp_cand = jnp.where(
                (cur_len < min_length) & (cand_tok == eos_id), NEG_INF, logp_cand)
            merged = (s.scores[:, None] + logp_cand).reshape(bsz, num_beams * kc)
            top_scores, midx = jax.lax.top_k(merged, k2)     # [B, 2K]
            beam_idx = midx // kc                            # [B, 2K] in [0, K)
            tok_idx = jnp.take_along_axis(
                cand_tok.reshape(bsz, num_beams * kc), midx, axis=1
            ).astype(jnp.int32)
        else:
            # HF beam_search order: log_softmax FIRST, then logits processors
            # (min-length / repetition penalty) on the log-probs — masking raw
            # logits would renormalize the distribution and shift every score.
            # The repetition penalty shifts rows NON-uniformly per token, so
            # the rank-equivalence above doesn't hold and the full-vocab
            # path is required.
            logp = jax.nn.log_softmax(s.next_logits.astype(jnp.float32), axis=-1)
            valid = (jnp.arange(max_length) < cur_len).astype(jnp.float32)[None, :]
            logp = apply_repetition_penalty(logp, s.tokens, valid, repetition_penalty)
            logp = jnp.where(cur_len < min_length, logp.at[:, eos_id].set(NEG_INF), logp)

            cand = (s.scores[:, None] + logp).reshape(bsz, num_beams * vocab)
            # 2K candidates guarantee K non-EOS continuations (HF takes 2K too)
            top_scores, top_idx = jax.lax.top_k(cand, k2)  # [B, 2K]
            beam_idx = top_idx // vocab                    # [B, 2K] in [0, K)
            tok_idx = (top_idx % vocab).astype(jnp.int32)

        # candidate token rows [B, 2K, L]
        live = s.tokens.reshape(bsz, num_beams, max_length)
        cand_tokens = jnp.take_along_axis(live, beam_idx[..., None], axis=1)
        cand_tokens = jax.lax.dynamic_update_slice_in_dim(
            cand_tokens, tok_idx[..., None], cur_len, axis=2)
        is_eos = tok_idx == eos_id

        # ---- finished pool insert (BeamHypotheses.add) ----
        # HF 4.12 normalizes by the FULL prefix length at add time (the
        # input_ids length before appending eos), prompt included; an eos
        # candidate only enters the pool if it ranks within the top K
        # ("worse than top num_beams" guard)
        norm = top_scores / jnp.power(jnp.float32(cur_len), length_penalty)
        in_top_k = jnp.arange(k2)[None, :] < num_beams  # top_k is sorted
        eos_scores = jnp.where(is_eos & in_top_k, norm, NEG_INF)      # [B, 2K]
        pool_scores = jnp.concatenate([s.fin_scores, eos_scores], 1)  # [B, 3K]
        pool_tokens = jnp.concatenate([s.fin_tokens, cand_tokens], 1)
        fin_scores, keep = jax.lax.top_k(pool_scores, num_beams)
        fin_tokens = jnp.take_along_axis(pool_tokens, keep[..., None], axis=1)

        # ---- live beams: best K non-EOS candidates ----
        live_cand = jnp.where(is_eos, NEG_INF, top_scores)
        live_scores, pick = jax.lax.top_k(live_cand, num_beams)        # [B, K]
        live_beam = jnp.take_along_axis(beam_idx, pick, axis=1)
        live_tok = jnp.take_along_axis(tok_idx, pick, axis=1)
        tokens = jnp.take_along_axis(live, live_beam[..., None], axis=1).reshape(flat, max_length)
        cache2 = _gather_beams(s.cache, live_beam, bsz, num_beams)
        next_tok = live_tok.reshape(flat)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, cur_len))
        step_logits, cache2 = decode_fn(next_tok[:, None], cache2, cur_len)
        return _S(cur_len + 1, tokens, step_logits[:, -1], cache2,
                  live_scores.reshape(flat), fin_tokens, fin_scores)

    def cond(s: _S) -> Array:
        # HF BeamHypotheses.is_done: stop once no live beam can still beat
        # the worst finished hypothesis. Live raw scores are log-prob sums
        # and only decrease (log_softmax <= 0; the repetition penalty keeps
        # them <= 0), so every FUTURE pool insert at step t is bounded by
        # best_live / t**lp, maximized over t in [cur_len, max_length] at
        # max_length for lp > 0 and at cur_len otherwise (scores <= 0) —
        # the same denominator split HF uses. The finalize fallback insert
        # (live beams at max_length norm) obeys the same bound, so exiting
        # early provably returns the identical best hypothesis.
        denom = jnp.where(
            jnp.float32(length_penalty) > 0.0,
            jnp.power(jnp.float32(max_length), length_penalty),
            jnp.power(jnp.float32(s.cur_len), length_penalty),
        )
        best_live = jnp.max(s.scores.reshape(bsz, num_beams), axis=1)
        worst_fin = jnp.min(s.fin_scores, axis=1)
        is_done = jnp.all(worst_fin >= best_live / denom)
        return (s.cur_len < max_length) & ~is_done

    state = jax.lax.while_loop(cond, body, state)

    # finalize (HF): unfinished batches fall back to the best live beams —
    # insert all live beams at max length into the pool, then take the best
    live_norm = (state.scores / jnp.power(jnp.float32(max_length), length_penalty)
                 ).reshape(bsz, num_beams)
    all_scores = jnp.concatenate([state.fin_scores, live_norm], axis=1)
    all_tokens = jnp.concatenate(
        [state.fin_tokens, state.tokens.reshape(bsz, num_beams, max_length)], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    return jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]
