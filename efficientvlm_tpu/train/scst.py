"""Self-critical sequence training (SCST) with CIDEr-D reward.

Reference ScstRewardCriterion (utils/__init__.py:16-97) + the --scst flag in
Eff_Captioning.py:415: sample K captions per image, reward = CIDEr-D vs
ground truths, baseline = greedy caption's reward (default) or leave-one-out
mean of the other samples, loss = -(reward - baseline) * sample logprob.

TPU split (strings can't ride the XLA graph): the jitted sampler emits
token ids; the CIDEr reward runs on host; a second jitted step computes the
advantage-weighted sequence logprob WITH gradients via one teacher-forced
decoder forward (parallel over time — faster than the reference's
step-by-step logprob accumulation during sampling).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation.caption_metrics import CiderD


class ScstRewardCriterion:
    """Reference utils/__init__.py:16-97. baseline_type: 'greedy' (score of
    the greedy decode, the SCST paper's baseline) or 'sample'
    (leave-one-out mean of the other K-1 samples)."""

    CIDER_REWARD_WEIGHT = 1.0

    def __init__(self, sample_n: int = 5, baseline_type: str = "greedy"):
        assert baseline_type in ("greedy", "sample")
        self.sample_n = sample_n
        self.baseline_type = baseline_type
        self.scorer = CiderD()
        self._cur_score: Optional[float] = None

    @staticmethod
    def _wrap_sentence(s: str) -> str:
        """reference :93-97: strip trailing '.'; append <eos> so n-grams stay
        consistent with cached document frequencies."""
        r = s.strip()
        if r.endswith("."):
            r = r[:-1]
        return r + " <eos>"

    def _scores(self, gen: List[str], gt_idx: List[int], gt_captions) -> np.ndarray:
        gts = {i: [self._wrap_sentence(c) for c in gt_captions[gt_idx[i]]] for i in range(len(gen))}
        res = {i: [self._wrap_sentence(gen[i])] for i in range(len(gen))}
        _, scores = self.scorer.compute_score(gts, res)
        return np.asarray(scores, np.float32) * self.CIDER_REWARD_WEIGHT

    def rewards(
        self,
        gt_captions: Sequence[Sequence[str]],
        sampled: Sequence[str],
        greedy: Optional[Sequence[str]] = None,
    ) -> np.ndarray:
        """sampled: len B*K (K consecutive per image); greedy: len B when
        baseline_type='greedy'. Returns the advantage per sample
        (reference :27-57)."""
        k = self.sample_n
        b = len(gt_captions)
        assert len(sampled) == b * k, (len(sampled), b, k)
        gen = list(sampled)
        gt_idx = [i // k for i in range(b * k)]
        if self.baseline_type == "greedy":
            assert greedy is not None and len(greedy) == b
            gen += list(greedy)
            gt_idx += list(range(b))
        scores = self._scores(gen, gt_idx, gt_captions)
        sample_scores = scores[: b * k].reshape(b, k)
        self._cur_score = float(sample_scores.mean())
        if self.baseline_type == "greedy":
            baseline = scores[b * k:][:, None]
        else:
            baseline = (sample_scores.sum(1, keepdims=True) - sample_scores) / (k - 1)
        return (sample_scores - baseline).reshape(-1)

    def get_score(self) -> Optional[float]:
        return self._cur_score

    def loss(self, advantages: jnp.ndarray, sample_logprobs: jnp.ndarray) -> jnp.ndarray:
        """-(advantage) * logprob, mean (reference :52-56)."""
        adv = jax.lax.stop_gradient(jnp.asarray(advantages))
        return -(adv * sample_logprobs).mean()


def sequence_logprobs(
    logits: jnp.ndarray, tokens: jnp.ndarray, *, prompt_length: int,
    eos_id: int, pad_id: int,
) -> jnp.ndarray:
    """Per-sequence sum of next-token logprobs over the GENERATED span:
    positions [prompt_length, eos] inclusive, pads excluded. logits/tokens
    are teacher-forced ([B, L, V] from the decoder forward on `tokens`)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # logits at t predict token t+1
    next_tok = tokens[:, 1:]
    tok_logp = jnp.take_along_axis(logp[:, :-1], next_tok[..., None], axis=-1)[..., 0]
    pos = jnp.arange(next_tok.shape[1])[None]
    gen_mask = pos >= (prompt_length - 1)  # first generated token sits at prompt_length
    # include everything up to and including the first eos
    is_eos = (next_tok == eos_id)
    after_eos = jnp.cumsum(is_eos, axis=1) - is_eos.astype(jnp.int32) > 0
    valid = gen_mask & ~after_eos & (next_tok != pad_id) | (gen_mask & is_eos & ~after_eos)
    return (tok_logp * valid.astype(tok_logp.dtype)).sum(axis=1)


def make_scst_step(
    model,
    optimizer,
    *,
    prompt_length: int,
    pad_token_id: int,
    eos_id: int,
    sample_n: int = 5,
    max_length: int = 30,
    min_length: int = 5,
    top_p: float = 1.0,
    zs=None,
    dtype=None,
    axis_name: Optional[str] = None,
) -> Callable:
    """Build (sample_fn, grad_step) for SCST captioning fine-tune.

    sample_fn(params, image, prompt_ids, rng) -> (sample_tokens [B*K, L],
        greedy_tokens [B, L]) — jitted by the caller.
    grad_step((params, opt_state, step), batch{image, tokens, advantages},
        rng) -> (state, metrics) — advantage-weighted logprob update.
    """
    import optax

    def sample_fn(params, image, prompt_ids, rng):
        b = image.shape[0]
        img_rep = jnp.repeat(image, sample_n, axis=0)
        prompt_rep = jnp.repeat(prompt_ids, sample_n, axis=0)
        sample_tokens = model.generate(
            params, img_rep, prompt_rep, max_length=max_length, min_length=min_length,
            num_beams=1, do_sample=True, top_p=top_p, eos_id=eos_id, pad_id=pad_token_id,
            zs=zs, rng=rng, dtype=dtype,
        )
        greedy_tokens = model.generate(
            params, image, prompt_ids, max_length=max_length, min_length=min_length,
            num_beams=1, do_sample=False, eos_id=eos_id, pad_id=pad_token_id,
            zs=zs, dtype=dtype,
        )
        return sample_tokens, greedy_tokens

    def loss_fn(params, batch, rng):
        tokens = batch["tokens"]  # [B*K, L] sampled ids
        image = jnp.repeat(batch["image"], sample_n, axis=0)
        atts = (tokens != pad_token_id).astype(jnp.int32)
        out = model.forward_logits(
            params, image, tokens, atts, zs=zs, rng=rng, dtype=dtype,
        )
        logp = sequence_logprobs(
            out, tokens, prompt_length=prompt_length, eos_id=eos_id, pad_id=pad_token_id,
        )
        adv = jax.lax.stop_gradient(batch["advantages"])
        loss = -(adv * logp).mean()
        return loss, {"loss_scst": loss, "mean_logprob": logp.mean()}

    def grad_step(state, batch, rng):
        params, opt_state, step = state
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, step + 1), metrics

    return sample_fn, grad_step
