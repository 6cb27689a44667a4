"""Modal-adaptive L0 gate modules with Lagrangian sparsity control.

Re-design of the reference's four near-identical Module classes
(efficient_models/{modal,xvlm,generation,nlvr}_l0_module.py) as ONE generic
`L0Module` parameterized by a gate-group layout; the task variants are thin
layout factories:

- XVLML0Module  (xvlm_l0_module.py:38-160): vision_head [Lv,H],
  text_head [Lt,H], cross_head [2*Lc,H] (self/cross interleaved),
  vision/text/cross_intermediate [L,I]
- VQAL0Module   (generation_l0_module.py:38-152): + decoder_head [2*Ld,H],
  decoder_intermediate [Ld,I], Ld = Lc
- NLVRL0Module  (nlvr_l0_module.py:50-51): cross layer count doubled (two-
  image replicated stack)

Gate parameters (log-alphas) live in a pytree; λ1/λ2 are trained by
gradient ASCENT (negative-lr optimizer, reference optim.py:14-20).
Sampled zs are emitted in encoder-ready shapes: heads [L,H], cross heads
[Lc,2,H] ([:,0]=self, [:,1]=cross — the reference's head_z[2i]/head_z[2i+1]
interleave, eff_bert.py:494-498), FFN [L,I].
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hard_concrete as hc

Array = jax.Array


class L0Module:
    """Generic structured-gate module.

    groups: name -> dict(shape=(L, size), params_per_dim=int,
                         init_mean=float|None, emit=callable|None)
    `emit` reshapes the raw [L, size] gate to its encoder-ready form.
    """

    def __init__(
        self,
        groups: Dict[str, dict],
        *,
        droprate_init: float = 0.5,
        temperature: float = 2.0 / 3.0,
        magical_number: float = hc.MAGICAL_NUMBER,
        lagrangian_warmup: int = 0,
        start_sparsity: float = 0.0,
        target_sparsity: float = 0.0,
    ):
        self.groups = groups
        self.droprate_init = droprate_init
        self.temperature = temperature
        self.magical_number = magical_number
        self.lagrangian_warmup = lagrangian_warmup
        self.start_sparsity = start_sparsity
        self.target_sparsity = target_sparsity
        self.prunable_model_size = sum(
            g.get("prunable_params", g["params_per_dim"] * int(np.prod(g["shape"])))
            for g in groups.values()
        )

    # -- params ---------------------------------------------------------------

    def init(self, rng: Array) -> dict:
        params = {"loga": {}, "lambda_1": jnp.array(0.0), "lambda_2": jnp.array(0.0)}
        keys = jax.random.split(rng, len(self.groups))
        for k, (name, g) in zip(keys, self.groups.items()):
            params["loga"][name] = hc.init_loga(
                k, g["shape"], droprate_init=self.droprate_init, mean=g.get("init_mean")
            )
        return params

    def constrain_parameters(self, params: dict) -> dict:
        out = dict(params)
        out["loga"] = {k: hc.constrain_loga(v) for k, v in params["loga"].items()}
        return out

    # -- forward ---------------------------------------------------------------

    def _emit(self, name: str, z: Array):
        emit = self.groups[name].get("emit")
        return emit(z) if emit is not None else z

    def forward_train(self, params: dict, rng: Array, *, noise: Optional[dict] = None) -> dict:
        """Stochastic zs (training=True path, xvlm_l0_module.py:321-328).

        noise: optional {group_name: u array of group shape} of uniform(eps,
        1-eps) draws to use instead of sampling from `rng` — the test seam
        that lets a trajectory differential feed the reference torch module
        and this one bit-identical concrete noise."""
        zs = {}
        keys = jax.random.split(rng, len(self.groups))
        for k, name in zip(keys, self.groups):
            if noise is not None:
                u = jnp.asarray(noise[name])
                z = jnp.clip(
                    hc.quantile_concrete(u, params["loga"][name], self.temperature), 0.0, 1.0
                )
            else:
                z = hc.sample_z(k, params["loga"][name], self.temperature)
            zs[f"{name}_z"] = self._emit(name, z)
        return zs

    def forward_deterministic(self, params: dict) -> dict:
        """Deterministic per-layer top-k masks (eval path,
        xvlm_l0_module.py:329-340). Host-side numpy."""
        zs = {}
        for name in self.groups:
            loga = np.asarray(params["loga"][name])
            rows = [
                hc.deterministic_z(loga[l], self.temperature, self.magical_number)
                for l in range(loga.shape[0])
            ]
            zs[f"{name}_z"] = self._emit(name, jnp.asarray(np.stack(rows)))
        return zs

    def forward(self, params: dict, *, training: bool, rng: Optional[Array] = None) -> dict:
        if training:
            assert rng is not None
            return self.forward_train(params, rng)
        return self.forward_deterministic(params)

    # -- sparsity / Lagrangian ---------------------------------------------------

    def expected_model_size(self, params: dict) -> Array:
        total = 0.0
        for name, g in self.groups.items():
            score = 1.0 - hc.cdf_qz(0.0, params["loga"][name], self.temperature)
            total = total + score.sum() * g["params_per_dim"]
        return total

    def get_target_sparsity(self, pruned_steps) -> Array:
        frac = jnp.minimum(1.0, pruned_steps / max(self.lagrangian_warmup, 1))
        return (self.target_sparsity - self.start_sparsity) * frac + self.start_sparsity

    def lagrangian_regularization(self, params: dict, pruned_steps) -> Tuple[Array, Array, Array]:
        """(loss, expected_sparsity, target_sparsity) —
        λ1(s−t) + λ2(s−t)² (modal_l0_module.py:243-256)."""
        expected_size = self.expected_model_size(params)
        expected_sparsity = 1.0 - expected_size / self.prunable_model_size
        target = (
            self.get_target_sparsity(pruned_steps)
            if self.lagrangian_warmup > 0
            else jnp.asarray(self.target_sparsity)
        )
        diff = expected_sparsity - target
        loss = params["lambda_1"] * diff + params["lambda_2"] * diff * diff
        return loss, expected_sparsity, target

    def calculate_model_size(self, zs: dict) -> dict:
        """Binary accounting of a zs dict (xvlm_l0_module.py:286-320).
        Emitted zs may be an `expand`-times repeat of the raw gate rows
        (head_group > 1), so per-unit params = params_per_dim / expand."""
        results = {}
        remaining = 0.0
        for name, g in self.groups.items():
            z = np.asarray(zs[f"{name}_z"]).reshape(g["shape"][0], -1) > 0
            expand = z.size // int(np.prod(g["shape"]))
            per_layer = z.sum(-1).tolist()
            results[f"{name}_nums"] = per_layer
            remaining += int(z.sum()) * (g["params_per_dim"] / expand)
        results["remaining_params"] = int(remaining)
        results["pruned_params"] = self.prunable_model_size - int(remaining)
        results["pruned_model_sparsity"] = results["pruned_params"] / self.prunable_model_size
        return results


# ---------------------------------------------------------------------------
# Layout factories
# ---------------------------------------------------------------------------


def _bert_sizes(hidden_size=768, intermediate_size=3072, num_heads=12):
    params_per_head_layer = hidden_size * hidden_size * 4 + hidden_size * 4
    params_per_head = params_per_head_layer // num_heads
    params_per_mlp_layer = hidden_size * intermediate_size * 2 + hidden_size + hidden_size * 4
    params_per_int = params_per_mlp_layer // intermediate_size
    return params_per_head, params_per_int


def _mlp_layer_params(hidden_size, intermediate_size):
    return hidden_size * intermediate_size * 2 + hidden_size + hidden_size * 4


def _interleave_to_pairs(z):
    """[2L, H] interleaved self/cross rows -> [L, 2, H]."""
    return z.reshape(-1, 2, z.shape[-1])


def _repeat_heads(group: int):
    """One learned gate drives `group` adjacent heads: with head_dim 64 and
    group=2 every surviving attention width is a 128-lane multiple, so
    physical export (pruning/export.py) never re-adds zero heads for MXU
    alignment — the pruned program keeps exactly the FLOPs it paid for."""
    return lambda z: jnp.repeat(z, group, axis=-1)


def _head_group(L, H, pph, group: int = 1):
    assert H % group == 0, (H, group)
    g = dict(shape=(L, H // group), params_per_dim=pph * group, init_mean=10.0)
    if group > 1:
        g["emit"] = _repeat_heads(group)
    return g


def _int_group(L, I, ppi, layer_params=None):
    # prunable_params: the reference counts the FULL per-layer mlp params
    # in prunable_model_size (params_per_mlp_layer * L, including the
    # integer-division remainder ppi*I loses), while expected-size scoring
    # uses the floored per-dim value — match it exactly so expected_sparsity
    # and the Lagrangian agree to float precision (modal_l0_module.py:
    # initialize_structured_mlp prunable += params_per_mlp_layer * L).
    g = dict(shape=(L, I), params_per_dim=ppi, init_mean=None)
    if layer_params is not None:
        g["prunable_params"] = layer_params * L
    return g


def _cross_emit(group: int):
    if group == 1:
        return _interleave_to_pairs
    rep = _repeat_heads(group)
    return lambda z: _interleave_to_pairs(rep(z))


def XVLML0Module(
    *,
    vision_layers: int,
    text_layers: int,
    cross_layers: int,
    hidden_size: int = 768,
    intermediate_size: int = 3072,
    num_heads: int = 12,
    vision_hidden_size: int | None = None,
    vision_intermediate_size: int | None = None,
    vision_num_heads: int | None = None,
    head_group: int = 1,
    **kw,
) -> L0Module:
    """The reference assumes both towers are 768/12/3072; the vision_*
    overrides support differing tower geometries. head_group=2 learns gates
    over head PAIRS (128-lane groups) so export is MXU-exact."""
    v_hidden = vision_hidden_size or hidden_size
    v_int = vision_intermediate_size or intermediate_size
    v_heads = vision_num_heads or num_heads
    pph, ppi = _bert_sizes(hidden_size, intermediate_size, num_heads)
    vpph, vppi = _bert_sizes(v_hidden, v_int, v_heads)
    groups = {
        "vision_head": _head_group(vision_layers, v_heads, vpph, head_group),
        "text_head": _head_group(text_layers, num_heads, pph, head_group),
        "cross_head": {**_head_group(cross_layers * 2, num_heads, pph, head_group),
                       "emit": _cross_emit(head_group)},
        "vision_intermediate": _int_group(vision_layers, v_int, vppi,
                                          _mlp_layer_params(v_hidden, v_int)),
        "text_intermediate": _int_group(text_layers, intermediate_size, ppi,
                                        _mlp_layer_params(hidden_size, intermediate_size)),
        "cross_intermediate": _int_group(cross_layers, intermediate_size, ppi,
                                         _mlp_layer_params(hidden_size, intermediate_size)),
    }
    return L0Module(groups, **kw)


def VQAL0Module(
    *,
    vision_layers: int,
    text_layers: int,
    cross_layers: int,
    decoder_layers: Optional[int] = None,
    hidden_size: int = 768,
    intermediate_size: int = 3072,
    num_heads: int = 12,
    vision_hidden_size: int | None = None,
    vision_intermediate_size: int | None = None,
    vision_num_heads: int | None = None,
    head_group: int = 1,
    **kw,
) -> L0Module:
    """VQA variant: + decoder gate groups; decoder layer count = cross count
    (generation_l0_module.py:47)."""
    decoder_layers = decoder_layers if decoder_layers is not None else cross_layers
    pph, ppi = _bert_sizes(hidden_size, intermediate_size, num_heads)
    vpph, vppi = _bert_sizes(
        vision_hidden_size or hidden_size,
        vision_intermediate_size or intermediate_size,
        vision_num_heads or num_heads,
    )
    groups = {
        "vision_head": _head_group(vision_layers, vision_num_heads or num_heads, vpph, head_group),
        "text_head": _head_group(text_layers, num_heads, pph, head_group),
        "cross_head": {**_head_group(cross_layers * 2, num_heads, pph, head_group),
                       "emit": _cross_emit(head_group)},
        "decoder_head": {**_head_group(decoder_layers * 2, num_heads, pph, head_group),
                         "emit": _cross_emit(head_group)},
        "vision_intermediate": _int_group(
            vision_layers, vision_intermediate_size or intermediate_size, vppi,
            _mlp_layer_params(vision_hidden_size or hidden_size,
                              vision_intermediate_size or intermediate_size)),
        "text_intermediate": _int_group(text_layers, intermediate_size, ppi,
                                        _mlp_layer_params(hidden_size, intermediate_size)),
        "cross_intermediate": _int_group(cross_layers, intermediate_size, ppi,
                                         _mlp_layer_params(hidden_size, intermediate_size)),
        "decoder_intermediate": _int_group(decoder_layers, intermediate_size, ppi,
                                           _mlp_layer_params(hidden_size, intermediate_size)),
    }
    return L0Module(groups, **kw)


def _single_modal_module(num_layers: int, *, hidden_size=768, intermediate_size=3072,
                         num_heads=12, prefix: str = "", with_head_layer: bool = False, **kw) -> L0Module:
    pph, ppi = _bert_sizes(hidden_size, intermediate_size, num_heads)
    p = f"{prefix}_" if prefix else ""
    groups = {
        f"{p}head": _head_group(num_layers, num_heads, pph),
        f"{p}intermediate": _int_group(num_layers, intermediate_size, ppi,
                                       _mlp_layer_params(hidden_size, intermediate_size)),
    }
    if with_head_layer:
        groups[f"{p}head_layer"] = dict(shape=(num_layers, 1), params_per_dim=pph * num_heads, init_mean=10.0)
    return L0Module(groups, **kw)


def VisionL0Module(num_layers: int, **kw) -> L0Module:
    """Per-modality module (reference modal_l0_module.py VisionL0Module :13-365)."""
    return _single_modal_module(num_layers, prefix="vision", **kw)


def TextL0Module(num_layers: int, **kw) -> L0Module:
    """reference modal_l0_module.py TextL0Module :722-1075."""
    return _single_modal_module(num_layers, prefix="text", **kw)


def CrossL0Module(num_layers: int, *, hidden_size=768, intermediate_size=3072, num_heads=12, **kw) -> L0Module:
    """reference modal_l0_module.py CrossL0Module :367-720 (2x head rows for
    self+cross attention per layer)."""
    pph, ppi = _bert_sizes(hidden_size, intermediate_size, num_heads)
    groups = {
        "cross_head": {**_head_group(num_layers * 2, num_heads, pph), "emit": _interleave_to_pairs},
        "cross_intermediate": _int_group(num_layers, intermediate_size, ppi,
                                         _mlp_layer_params(hidden_size, intermediate_size)),
    }
    return L0Module(groups, **kw)


def NLVRL0Module(
    *,
    vision_layers: int,
    text_layers: int,
    cross_layers: int,
    hidden_size: int = 768,
    intermediate_size: int = 3072,
    num_heads: int = 12,
    **kw,
) -> L0Module:
    """NLVR variant: cross layer count doubled for the two-image replicated
    stack (nlvr_l0_module.py:50-51). head_group passes through **kw."""
    return XVLML0Module(
        vision_layers=vision_layers,
        text_layers=text_layers,
        cross_layers=cross_layers * 2,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_heads=num_heads,
        **kw,
    )
