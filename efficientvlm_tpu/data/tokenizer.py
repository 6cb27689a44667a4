"""Tokenizer construction (reference build_tokenizer,
dataset/pretrain_dataset.py:33-43): HF BertTokenizer from a local path when
available, with a self-contained WordPiece fallback (greedy longest-match,
identical algorithm) so the framework runs with zero network egress.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional


class WordPieceTokenizer:
    """Minimal BERT-compatible WordPiece tokenizer over a vocab dict."""

    def __init__(self, vocab: Dict[str, int], *, lowercase: bool = True, max_chars_per_word: int = 100):
        self.vocab = vocab
        self.ids_to_tokens = {i: t for t, i in vocab.items()}
        self.lowercase = lowercase
        self.max_chars_per_word = max_chars_per_word
        self.pad_token, self.unk_token = "[PAD]", "[UNK]"
        self.cls_token, self.sep_token, self.mask_token = "[CLS]", "[SEP]", "[MASK]"
        self.bos_token, self.eos_token = "[CLS]", "[SEP]"

    # -- HF-compatible surface -------------------------------------------------
    def get_vocab(self) -> Dict[str, int]:
        return self.vocab

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def pad_token_id(self):
        return self.vocab[self.pad_token]

    @property
    def cls_token_id(self):
        return self.vocab[self.cls_token]

    @property
    def sep_token_id(self):
        return self.vocab[self.sep_token]

    @property
    def mask_token_id(self):
        return self.vocab[self.mask_token]

    @property
    def bos_token_id(self):
        return self.cls_token_id

    @property
    def eos_token_id(self):
        return self.sep_token_id

    def basic_tokenize(self, text: str) -> List[str]:
        if self.lowercase:
            text = text.lower()
        out: List[str] = []
        word = []
        for ch in text:
            if ch.isalnum():
                word.append(ch)
            else:
                if word:
                    out.append("".join(word))
                    word = []
                if not ch.isspace():
                    out.append(ch)
        if word:
            out.append("".join(word))
        return out

    def wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        tokens: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            tokens.append(cur)
            start = end
        return tokens

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for w in self.basic_tokenize(text):
            out.extend(self.wordpiece(w))
        return out

    def convert_tokens_to_ids(self, tokens) -> List[int]:
        if isinstance(tokens, str):
            return self.vocab.get(tokens, self.vocab[self.unk_token])
        return [self.vocab.get(t, self.vocab[self.unk_token]) for t in tokens]

    def convert_ids_to_tokens(self, ids) -> List[str]:
        # ids beyond the vocab (a model head can be wider than the
        # tokenizer, e.g. sampling from an untrained tiny model) -> [UNK]
        return [self.ids_to_tokens.get(int(i), self.unk_token) for i in ids]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        toks = self.convert_ids_to_tokens(ids)
        if skip_special_tokens:
            specials = {self.pad_token, self.cls_token, self.sep_token, self.mask_token}
            toks = [t for t in toks if t not in specials]
        out = []
        for t in toks:
            if t.startswith("##") and out:
                out[-1] = out[-1] + t[2:]
            else:
                out.append(t)
        return " ".join(out)

    def __call__(
        self,
        texts,
        *,
        padding: str = "longest",
        truncation: bool = True,
        max_length: int = 40,
        return_tensors: Optional[str] = "np",
    ):
        import numpy as np

        single = isinstance(texts, str)
        if single:
            texts = [texts]
        all_ids = []
        for t in texts:
            toks = [self.cls_token] + self.tokenize(t)
            if truncation:
                toks = toks[: max_length - 1]
            toks = toks + [self.sep_token]
            all_ids.append(self.convert_tokens_to_ids(toks))
        if padding == "max_length":
            pad_to = max_length
        else:
            pad_to = max(len(x) for x in all_ids)
        input_ids = np.full((len(all_ids), pad_to), self.pad_token_id, np.int32)
        attention_mask = np.zeros((len(all_ids), pad_to), np.int32)
        for i, ids in enumerate(all_ids):
            ids = ids[:pad_to]
            input_ids[i, : len(ids)] = ids
            attention_mask[i, : len(ids)] = 1

        class _Batch(dict):
            @property
            def input_ids(self):
                return self["input_ids"]

            @property
            def attention_mask(self):
                return self["attention_mask"]

        return _Batch(input_ids=input_ids, attention_mask=attention_mask)

    def add_special_tokens(self, mapping: dict) -> None:
        pass  # bos/eos already aliased to CLS/SEP


def load_vocab(path: str) -> Dict[str, int]:
    vocab: Dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            vocab[line.rstrip("\n")] = i
    return vocab


def make_test_vocab(extra_words: Optional[List[str]] = None) -> Dict[str, int]:
    """Small deterministic vocab for tests/synthetic runs."""
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += list("abcdefghijklmnopqrstuvwxyz0123456789.,!?'")
    toks += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    common = (
        "a an the of in on is are was were picture photo image man woman dog cat "
        "two one three red blue green left right yes no and with person people "
        "what where who how many color standing sitting"
    ).split()
    toks += common + ["##ing", "##s", "##ed"]
    if extra_words:
        toks += [w for w in extra_words if w not in toks]
    return {t: i for i, t in enumerate(dict.fromkeys(toks))}


def build_tokenizer(text_encoder: str = "data/bert-base-uncased"):
    """HF tokenizer if a local dir/vocab exists; WordPiece fallback otherwise."""
    vocab_file = os.path.join(text_encoder, "vocab.txt")
    if os.path.isdir(text_encoder) and os.path.exists(vocab_file):
        try:
            from transformers import BertTokenizer

            return BertTokenizer.from_pretrained(text_encoder, local_files_only=True)
        except Exception:
            return WordPieceTokenizer(load_vocab(vocab_file))
    if os.path.isfile(text_encoder):  # direct vocab file
        return WordPieceTokenizer(load_vocab(text_encoder))
    return WordPieceTokenizer(make_test_vocab())
