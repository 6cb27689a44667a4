"""BERT-style MLM masking with whole-word expansion and skipgram spans.

Same semantics as the reference TextMaskingGenerator
(dataset/pretrain_dataset.py:46-137): pick ~mask_prob of positions (capped
at mask_max, min 1), expand WordPiece '##' continuations to whole words,
optionally widen to a 2..skipgram_size ngram with prob skipgram_prb, then
80% [MASK] / 10% random / 10% keep. Uses an explicit np.random.Generator."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class TextMaskingGenerator:
    def __init__(
        self,
        tokenizer,
        mask_prob: float,
        mask_max: int,
        skipgram_prb: float = 0.2,
        skipgram_size: int = 3,
        mask_whole_word: bool = True,
        seed: int | None = None,
    ):
        self.id2token = {i: w for w, i in tokenizer.get_vocab().items()}
        self.cls_token = tokenizer.cls_token
        self.mask_token = tokenizer.mask_token
        self.mask_max = mask_max
        self.mask_prob = mask_prob
        self.skipgram_prb = skipgram_prb
        self.skipgram_size = skipgram_size
        self.mask_whole_word = mask_whole_word
        self.rng = np.random.default_rng(seed)

    def get_random_word(self) -> str:
        return self.id2token[int(self.rng.integers(0, len(self.id2token)))]

    def __call__(self, tokens: List[str]) -> Tuple[List[str], List[int]]:
        tokens = list(tokens)
        n_pred = min(self.mask_max, max(1, int(round(len(tokens) * self.mask_prob))))

        assert tokens[0] == self.cls_token
        cand_pos = list(range(1, len(tokens)))
        self.rng.shuffle(cand_pos)
        masked_pos: set = set()
        max_cand_pos = max(cand_pos)

        def _expand_whole_word(st, end):
            new_st, new_end = st, end
            while new_st >= 0 and tokens[new_st].startswith("##"):
                new_st -= 1
            while new_end < len(tokens) and tokens[new_end].startswith("##"):
                new_end += 1
            return new_st, new_end

        for pos in cand_pos:
            if len(masked_pos) >= n_pred:
                break
            if pos in masked_pos:
                continue
            if (
                self.skipgram_prb > 0
                and self.skipgram_size >= 2
                and self.rng.random() < self.skipgram_prb
            ):
                size = int(self.rng.integers(2, self.skipgram_size + 1))
                st_pos, end_pos = (
                    _expand_whole_word(pos, pos + size)
                    if self.mask_whole_word
                    else (pos, pos + size)
                )
            else:
                st_pos, end_pos = (
                    _expand_whole_word(pos, pos + 1) if self.mask_whole_word else (pos, pos + 1)
                )
            for mp in range(st_pos, end_pos):
                if 0 < mp <= max_cand_pos:
                    masked_pos.add(mp)
                else:
                    break

        masked_list = list(masked_pos)
        if len(masked_list) > n_pred:
            self.rng.shuffle(masked_list)
            masked_list = masked_list[:n_pred]

        for pos in masked_list:
            r = self.rng.random()
            if r < 0.8:
                tokens[pos] = self.mask_token
            elif self.rng.random() < 0.5:
                tokens[pos] = self.get_random_word()
        return tokens, masked_list
