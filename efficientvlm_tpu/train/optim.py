"""Optimizers (optax) mirroring reference optim.py.

- create_optimizer (optim.py:23-69): AdamW with 4 param groups =
  {decay, no-decay} x {base lr, lr*lr_mult for from-scratch 'init_params'}.
  In optax this is one adamw with a weight-decay mask plus a per-leaf
  lr-multiplier transform.
- create_L0_optimizer (optim.py:4-21): separate AdamW for gate log-alphas
  (lr=reg_learning_rate) and a NEGATIVE-lr AdamW for the Lagrangian
  multipliers λ1, λ2 (gradient ascent side of the max-min game).

All three pin betas=(0.9, 0.98), eps=1e-8 — the reference's explicit AdamW
arguments (optim.py:12,20,67), NOT the Adam default b2=0.999.

Deliberate divergence: the reference's MAIN optimizer also contains the l0
module's loga and λ parameters (create_optimizer iterates the full
model.named_parameters(), and the student model owns l0_module — so its
gates are updated TWICE per step: once by the main AdamW with lr + weight
decay, then again by the L0/Lagrangian AdamWs). We treat that as an
upstream accident: here the gate/λ leaves live outside `params` and are
updated exactly once by their dedicated optimizers
(tests/test_trajectory_differential.py documents this quantitatively).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_SUBSTRINGS = ("bias", "ln", "layer_norm", "norm", "temp", "class_embedding")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts).lower()


def weight_decay_mask(params) -> object:
    """True where decay applies: exclude biases, LayerNorm/scale params,
    embeddings' LN, temp (reference optim.py:29-44 no_decay set).

    Deliberate divergence: the reference's name-only filter leaves `temp`
    and `class_embedding` in the DECAY group (they match none of its
    substrings); we additionally exclude every <=1-D leaf, the standard
    practice — decaying a clamped temperature scalar or the CLS token
    toward zero is an upstream accident, not a behavior to reproduce."""

    def decide(path, leaf):
        s = _path_str(path)
        if leaf.ndim <= 1:
            return False
        return not any(t in s for t in NO_DECAY_SUBSTRINGS)

    return jax.tree_util.tree_map_with_path(decide, params)


def lr_mult_mask(params, init_param_paths: Iterable[str]) -> object:
    """Multiplier tree: lr_mult where the path matches a from-scratch
    module prefix (reference init_params, optim.py:43-56), else 1.0."""
    prefixes = tuple(init_param_paths)

    def decide(path, leaf):
        s = _path_str(path)
        return any(s.startswith(p) or f"/{p}" in s for p in prefixes)

    return jax.tree_util.tree_map_with_path(decide, params)


def scale_by_mask(mult: float, mask) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree.map(
            lambda u, m: u * mult if m else u, updates, mask
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def create_optimizer(
    params,
    *,
    lr: float | Callable,
    weight_decay: float = 0.01,
    lr_mult: float = 1.0,
    init_param_paths: Iterable[str] = (),
    betas=(0.9, 0.98),
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    decay_mask = weight_decay_mask(params)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(
            learning_rate=lr,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mask=decay_mask,
        )
    )
    if lr_mult != 1.0 and init_param_paths:
        chain.append(scale_by_mask(lr_mult, lr_mult_mask(params, init_param_paths)))
    return optax.chain(*chain)


def create_l0_optimizer(*, reg_lr: float = 0.01) -> optax.GradientTransformation:
    """AdamW over gate log-alphas (reference optim.py:8-12; betas/eps pinned
    to the reference's AdamW(eps=1e-8, betas=(0.9, 0.98)))."""
    return optax.adamw(learning_rate=reg_lr, b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.0)


def create_lagrangian_optimizer(*, reg_lr: float = 0.01) -> optax.GradientTransformation:
    """NEGATIVE learning rate = gradient ascent on λ (optim.py:14-20)."""
    return optax.adamw(learning_rate=-reg_lr, b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.0)
