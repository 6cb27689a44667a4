"""Parameter accounting (reference utils/utils.py: calculate_parameters
excludes embeddings and classifier heads; log_all_parameters prints a tree).
"""

from __future__ import annotations

from typing import Iterable

import jax
import numpy as np

EXCLUDE_SUBSTRINGS = ("embedding", "cls", "head", "pos_embed", "temp")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts).lower()


def calculate_parameters(params, *, exclude: Iterable[str] = EXCLUDE_SUBSTRINGS) -> int:
    """Count trainable params excluding embedding/classifier leaves
    (reference utils/utils.py:calculate_parameters semantics)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        s = _path_str(path)
        if any(e in s for e in exclude):
            continue
        total += int(np.prod(leaf.shape))
    return total


def count_all_parameters(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def log_all_parameters(params, *, print_fn=print) -> None:
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        print_fn(f"{_path_str(path)}: {tuple(leaf.shape)}")
    print_fn(f"total: {count_all_parameters(params):,} "
             f"(ex-embeddings/heads: {calculate_parameters(params):,})")
