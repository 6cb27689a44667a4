"""Self-critical sequence training (SCST) with CIDEr-D reward.

Reference ScstRewardCriterion (utils/__init__.py:16-97) + the --scst flag in
Eff_Captioning.py:415: sample K captions per image, reward = CIDEr-D vs
ground truths, baseline = per-image mean of the other samples' rewards
(leave-one-out), loss = -(reward - baseline) * sample logprob.

The sampling runs in the jitted decode (generation.generate_no_beam with
do_sample=True); the CIDEr reward is host-side (string metric), so the step
is split: device sample -> host reward -> device weighted-logprob grad.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation.caption_metrics import CiderD


class ScstRewardCriterion:
    CIDER_REWARD_WEIGHT = 1.0

    def __init__(self, sample_n: int = 5):
        self.sample_n = sample_n
        self.scorer = CiderD()

    def rewards(self, gt_captions: Sequence[Sequence[str]], sampled: Sequence[str]) -> np.ndarray:
        """sampled: len B*K (K consecutive per image). Returns advantage per
        sample: reward - leave-one-out baseline (reference :52-77)."""
        k = self.sample_n
        b = len(gt_captions)
        assert len(sampled) == b * k
        gts = {i: list(gt_captions[i // k]) for i in range(b * k)}
        res = {i: [sampled[i]] for i in range(b * k)}
        _, scores = self.scorer.compute_score(gts, res)
        scores = np.asarray(scores, np.float32).reshape(b, k)
        baseline = (scores.sum(1, keepdims=True) - scores) / (k - 1)
        return (scores - baseline).reshape(-1) * self.CIDER_REWARD_WEIGHT

    def loss(self, advantages: jnp.ndarray, sample_logprobs: jnp.ndarray) -> jnp.ndarray:
        """-(advantage) * logprob, mean (reference :79-97)."""
        adv = jax.lax.stop_gradient(jnp.asarray(advantages))
        return -(adv * sample_logprobs).mean()
