"""Caption metrics: PTB-style tokenization, BLEU-1..4, CIDEr-D, ROUGE-L.

Self-contained replacements for the vendored pycocoevalcap stack
(reference refTools/evaluation/*, utils/cider/*, utils/bleu.py) — the
environment has no pycocoevalcap/pycocotools and no java (METEOR/SPICE are
reported as None). Algorithms follow the standard COCO definitions:
corpus BLEU with closest-ref length + uniform weights, CIDEr-D with tf-idf
1-4-gram cosine consensus, sigma=6 length gaussian and x10 scaling, ROUGE-L
with beta=1.2.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List

_PUNCT = re.compile(r"[^a-z0-9 ]")


def ptb_tokenize(s: str) -> List[str]:
    """Lightweight PTB-ish tokenization: lowercase, strip punctuation."""
    s = s.lower().replace("-", " ")
    s = _PUNCT.sub(" ", s)
    return s.split()


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu(gts: Dict, res: Dict, max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n (COCO convention: closest ref length,
    clip counts by max ref count). gts/res: id -> list[str]."""
    tot_match = [0] * max_n
    tot_count = [0] * max_n
    len_hyp, len_ref = 0, 0
    for key in res:
        hyp = ptb_tokenize(res[key][0])
        refs = [ptb_tokenize(r) for r in gts[key]]
        len_hyp += len(hyp)
        len_ref += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            hc = _ngrams(hyp, n)
            max_ref: Counter = Counter()
            for r in refs:
                rc = _ngrams(r, n)
                for g, c in rc.items():
                    max_ref[g] = max(max_ref[g], c)
            tot_match[n - 1] += sum(min(c, max_ref[g]) for g, c in hc.items())
            tot_count[n - 1] += max(sum(hc.values()), 0)
    bp = 1.0 if len_hyp > len_ref else math.exp(1 - len_ref / max(len_hyp, 1))
    scores = []
    log_sum = 0.0
    for n in range(1, max_n + 1):
        p = tot_match[n - 1] / max(tot_count[n - 1], 1)
        log_sum += math.log(max(p, 1e-12))
        scores.append(bp * math.exp(log_sum / n))
    return scores


class CiderD:
    """CIDEr-D (reference utils/cider/ciderD_scorer.py semantics)."""

    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma

    def _counts(self, s: str):
        toks = ptb_tokenize(s)
        return [_ngrams(toks, k + 1) for k in range(self.n)], len(toks)

    def compute_score(self, gts: Dict, res: Dict):
        keys = list(res.keys())
        # document frequencies over reference sets
        doc_freq = [defaultdict(float) for _ in range(self.n)]
        ref_counts = {}
        for key in keys:
            per_ref = [self._counts(r) for r in gts[key]]
            ref_counts[key] = per_ref
            seen = [set() for _ in range(self.n)]
            for counts, _ in per_ref:
                for k in range(self.n):
                    seen[k].update(counts[k].keys())
            for k in range(self.n):
                for g in seen[k]:
                    doc_freq[k][g] += 1
        log_num_docs = math.log(max(len(keys), 1))

        def vec(counts, length):
            vecs, norms = [], []
            for k in range(self.n):
                v = {}
                norm = 0.0
                for g, c in counts[k].items():
                    df = math.log(max(doc_freq[k][g], 1.0))
                    w = c * (log_num_docs - df)
                    v[g] = w
                    norm += w * w
                vecs.append(v)
                norms.append(math.sqrt(norm))
            return vecs, norms

        scores = []
        for key in keys:
            hyp_counts, hyp_len = self._counts(res[key][0])
            hv, hn = vec(hyp_counts, hyp_len)
            score_k = [0.0] * self.n
            for counts, rlen in ref_counts[key]:
                rv, rn = vec(counts, rlen)
                delta = hyp_len - rlen
                for k in range(self.n):
                    num = 0.0
                    for g, w in hv[k].items():
                        # CIDEr-D clips hyp weight at ref weight
                        num += min(w, rv[k].get(g, 0.0)) * rv[k].get(g, 0.0)
                    if hn[k] > 0 and rn[k] > 0:
                        s = num / (hn[k] * rn[k])
                    else:
                        s = 0.0
                    s *= math.exp(-(delta**2) / (2 * self.sigma**2))
                    score_k[k] += s
            n_refs = max(len(ref_counts[key]), 1)
            scores.append(10.0 * sum(sk / n_refs for sk in score_k) / self.n)
        mean = sum(scores) / max(len(scores), 1)
        return mean, scores


def rouge_l(gts: Dict, res: Dict, beta: float = 1.2) -> float:
    def lcs(a, b):
        m, n = len(a), len(b)
        dp = [0] * (n + 1)
        for i in range(1, m + 1):
            prev = 0
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = prev + 1 if a[i - 1] == b[j - 1] else max(dp[j], dp[j - 1])
                prev = cur
        return dp[n]

    total = 0.0
    for key in res:
        hyp = ptb_tokenize(res[key][0])
        best = 0.0
        for r in gts[key]:
            ref = ptb_tokenize(r)
            l = lcs(ref, hyp)
            prec = l / max(len(hyp), 1)
            rec = l / max(len(ref), 1)
            if prec and rec:
                score = (1 + beta**2) * prec * rec / (rec + beta**2 * prec)
            else:
                score = 0.0
            best = max(best, score)
        total += best
    return total / max(len(res), 1)


def coco_caption_eval(annotations: List[dict], results: List[dict]) -> dict:
    """reference dataset/utils.py:356-382 interface: annotations/results are
    [{'image_id', 'caption'}]. Returns the COCO metric dict."""
    gts: Dict = defaultdict(list)
    for a in annotations:
        gts[a["image_id"]].append(a["caption"])
    res: Dict = {}
    for r in results:
        res[r["image_id"]] = [r["caption"]]
    res = {k: v for k, v in res.items() if k in gts}
    gts = {k: gts[k] for k in res}
    b = bleu(gts, res)
    cider, _ = CiderD().compute_score(gts, res)
    return {
        "Bleu_1": b[0], "Bleu_2": b[1], "Bleu_3": b[2], "Bleu_4": b[3],
        "ROUGE_L": rouge_l(gts, res),
        "CIDEr": cider,
        "METEOR": None,  # java scorer unavailable in this environment
        "SPICE": None,
    }
