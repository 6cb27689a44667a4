"""Hard-concrete (stretched binary concrete) gate distribution.

Pure-function port of the reference math (efficient_models/
modal_l0_module.py:160-168, 265-290; constants at :10): stretch limits
(-0.1, 1.1), eps 1e-6, temperature 2/3, 'magical number' 0.8 for the
deterministic soft mask (Wang et al. 2020).

All functions take explicit PRNG keys (no global RNG state — the TPU-native
replacement for torch's CUDA RNG).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LIMIT_A = -0.1
LIMIT_B = 1.1
EPS = 1e-6
MAGICAL_NUMBER = 0.8
LOGA_CLAMP_MIN = math.log(1e-2)
LOGA_CLAMP_MAX = math.log(1e2)


def cdf_qz(x, loga, temperature: float = 2.0 / 3.0):
    """CDF of the stretched concrete at x — P(z <= x).
    1 - cdf_qz(0, loga) is the per-gate keep probability."""
    xn = (x - LIMIT_A) / (LIMIT_B - LIMIT_A)
    logits = math.log(xn) - math.log(1 - xn)
    return jnp.clip(jax.nn.sigmoid(logits * temperature - loga), EPS, 1 - EPS)


def quantile_concrete(u, loga, temperature: float = 2.0 / 3.0):
    y = jax.nn.sigmoid((jnp.log(u) - jnp.log(1 - u) + loga) / temperature)
    return y * (LIMIT_B - LIMIT_A) + LIMIT_A


def sample_z(rng, loga, temperature: float = 2.0 / 3.0):
    """Stochastic gate sample, hardtanh'd to [0,1] (training path)."""
    u = jax.random.uniform(rng, loga.shape, minval=EPS, maxval=1 - EPS)
    z = quantile_concrete(u, loga, temperature)
    return jnp.clip(z, 0.0, 1.0)


def deterministic_z(loga, temperature: float = 2.0 / 3.0, magical_number: float = MAGICAL_NUMBER):
    """Deterministic eval mask for ONE layer row (reference
    _deterministic_z, modal_l0_module.py:272-290): zero out the
    round(expected_num_zeros) smallest soft-mask entries, keep the rest at
    exactly 1. Host-side (data-dependent k) — call outside jit."""
    import numpy as np

    loga = np.asarray(loga)
    size = loga.shape[-1] if loga.ndim else 1
    keep_prob = 1.0 - np.asarray(cdf_qz(0.0, jnp.asarray(loga), temperature))
    expected_num_zeros = size - keep_prob.sum()
    num_zeros = round(float(expected_num_zeros))
    soft_mask = 1.0 / (1.0 + np.exp(-loga / temperature * magical_number))
    if num_zeros <= 0:
        return np.ones_like(soft_mask)
    if soft_mask.ndim == 0:
        return np.zeros_like(soft_mask)
    order = np.argsort(soft_mask)  # smallest first
    mask = np.ones_like(soft_mask)
    mask[order[:num_zeros]] = 0.0
    return mask


def constrain_loga(loga):
    """Clamp log-alphas to [ln 1e-2, ln 1e2] (modal_l0_module.py:154-158)."""
    return jnp.clip(loga, LOGA_CLAMP_MIN, LOGA_CLAMP_MAX)


def init_loga(rng, shape, droprate_init: float | None = None, mean: float | None = None):
    """Normal(mean, 0.01) init; mean=10 ~ keep-everything for head gates,
    logit(1-droprate) for FFN gates (modal_l0_module.py:103, 142-145)."""
    if mean is None:
        droprate_init = droprate_init if droprate_init else 0.5
        mean = math.log(1 - droprate_init) - math.log(droprate_init)
    return mean + 0.01 * jax.random.normal(rng, shape)
