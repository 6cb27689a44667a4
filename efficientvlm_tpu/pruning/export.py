"""Physical pruning export: fold learned gates into weights, then slice
arrays to genuinely smaller static shapes so the pruned student compiles to
a smaller XLA program.

Reference semantics (utils/xvlm_utils.py):
- update_params (:37-81): fold head gates into the VALUE projection
  (per-head weight rows + bias) and FFN gates into the down-projection
  (output.dense input columns);
- prune_model_with_z (:85-226): drop zero-gate heads by slicing q/k/v
  output dims + out-proj input dims (HF prune_linear_layer), and keep only
  nonzero FFN dims by slicing fc1 rows / fc2 columns; fully-dead modules
  are None'd (:228-244) and the layer skips them.

Because our layers are unrolled (per-layer param dicts), per-layer differing
head counts are true static shapes — no padding needed; apply functions infer
head counts from kernel shapes and treat None sublayers as identity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _fold_head_gate(attn: dict, head_z: np.ndarray, head_dim: int) -> dict:
    z = np.repeat(np.asarray(head_z, np.float32), head_dim)
    v = dict(attn["v"])
    v["kernel"] = attn["v"]["kernel"] * z[None, :]
    if "bias" in v:
        v["bias"] = attn["v"]["bias"] * z
    out = dict(attn)
    out["v"] = v
    return out


def _align_keep(keep: np.ndarray, dropped: np.ndarray, align: int) -> np.ndarray:
    """Round the kept-unit count UP to a multiple of `align` by re-adding
    dropped units (their gate-folded weights are zero, so outputs are
    bit-identical) — unaligned widths waste MXU tiles (e.g. 9 heads x 64 =
    576 lanes pads to 640, erasing the pruning speedup)."""
    if align <= 1 or keep.size % align == 0 or keep.size == 0:
        return keep
    pad = min(align - keep.size % align, dropped.size)
    return np.sort(np.concatenate([keep, dropped[:pad]]))


def _slice_heads(attn: dict, head_z: np.ndarray, head_dim: int, align: int = 1) -> Optional[dict]:
    z = np.asarray(head_z)
    keep = np.nonzero(z > 0)[0]
    if keep.size == 0:
        return None
    keep = _align_keep(keep, np.nonzero(z <= 0)[0], align)
    cols = np.concatenate([np.arange(h * head_dim, (h + 1) * head_dim) for h in keep])
    new = {}
    for name in ("q", "k", "v"):
        p = {"kernel": jnp.asarray(np.asarray(attn[name]["kernel"])[:, cols])}
        if "bias" in attn[name]:
            p["bias"] = jnp.asarray(np.asarray(attn[name]["bias"])[cols])
        new[name] = p
    o = {"kernel": jnp.asarray(np.asarray(attn["out"]["kernel"])[cols, :])}
    if "bias" in attn["out"]:
        o["bias"] = attn["out"]["bias"]
    new["out"] = o
    return new


def _fold_mlp_gate(fc2: dict, mlp_z: np.ndarray) -> dict:
    """Fold a POST-activation intermediate gate (text tower semantics,
    eff_bert.py:543-556: act -> mul(z) -> down-proj) into the down-proj rows."""
    out = dict(fc2)
    out["kernel"] = fc2["kernel"] * np.asarray(mlp_z, np.float32)[:, None]
    return out


def _fold_mlp_gate_pre(fc1: dict, mlp_z: np.ndarray) -> dict:
    """Fold a PRE-activation intermediate gate (vision tower semantics,
    eff_vit.py:214-218: fc1 -> mul(z) -> act -> fc2) into fc1 columns +
    bias — exact for ANY z value, not just binary masks."""
    z = np.asarray(mlp_z, np.float32)
    out = dict(fc1)
    out["kernel"] = fc1["kernel"] * z[None, :]
    if "bias" in fc1:
        out["bias"] = fc1["bias"] * z
    return out


def _slice_mlp(fc1: dict, fc2: dict, mlp_z: np.ndarray, align: int = 1):
    z = np.asarray(mlp_z)
    keep = np.nonzero(z > 0)[0]
    if keep.size == 0:
        return None, None
    keep = _align_keep(keep, np.nonzero(z <= 0)[0], align)
    nfc1 = {"kernel": jnp.asarray(np.asarray(fc1["kernel"])[:, keep])}
    if "bias" in fc1:
        nfc1["bias"] = jnp.asarray(np.asarray(fc1["bias"])[keep])
    nfc2 = {"kernel": jnp.asarray(np.asarray(fc2["kernel"])[keep, :])}
    if "bias" in fc2:
        nfc2["bias"] = fc2["bias"]
    return nfc1, nfc2


def prune_vit_params(params: dict, zs: dict, *, head_dim: int = 64,
                     align_heads: int = 1, align_intermediate: int = 1) -> dict:
    """Slice the vision tower by vision_head_z [L,H] / vision_intermediate_z
    [L,I] (binary). Gate values folded first, so non-binary zs also export
    correctly (reference update_params then prune). align_* keeps extra
    zero-folded units so sliced widths land on MXU-friendly multiples
    (recommended: align_heads = 128 // head_dim, align_intermediate = 128).
    Bit-identical outputs either way."""
    head_z = zs.get("vision_head_z")
    mlp_z = zs.get("vision_intermediate_z")
    new = dict(params)
    layers = []
    for i, lp in enumerate(params["layers"]):
        lp = dict(lp)
        if head_z is not None and lp.get("attn") is not None:
            hz = np.asarray(head_z[i]).reshape(-1)
            lp["attn"] = _fold_head_gate(lp["attn"], hz, head_dim)
            lp["attn"] = _slice_heads(lp["attn"], hz, head_dim, align_heads)
        if mlp_z is not None and lp.get("mlp") is not None:
            mz = np.asarray(mlp_z[i]).reshape(-1)
            fc1 = _fold_mlp_gate_pre(lp["mlp"]["fc1"], mz)
            fc1, fc2 = _slice_mlp(fc1, lp["mlp"]["fc2"], mz, align_intermediate)
            lp["mlp"] = None if fc1 is None else {"fc1": fc1, "fc2": fc2}
        layers.append(lp)
    new["layers"] = layers
    return new


def prune_bert_params(
    params: dict,
    zs: dict,
    *,
    fusion_layer: int,
    head_dim: int = 64,
    text_key: str = "text",
    decoder: bool = False,
    align_heads: int = 1,
    align_intermediate: int = 1,
) -> dict:
    """Slice a fusion-BERT stack. Layers [0, fusion) use text_head_z /
    text_intermediate_z; layers [fusion, N) use cross_head_z [Lc,2,H]
    (self, cross) / cross_intermediate_z. With decoder=True the decoder_*
    gate groups drive a fusion_layer=0 stack (VQA answer decoder)."""
    prefix = "decoder" if decoder else "cross"
    text_head_z = zs.get("text_head_z")
    text_mlp_z = zs.get("text_intermediate_z")
    cross_head_z = zs.get(f"{prefix}_head_z")
    cross_mlp_z = zs.get(f"{prefix}_intermediate_z")

    new = dict(params)
    layers = []
    for i, lp in enumerate(params["layers"]):
        lp = dict(lp)
        is_cross = i >= fusion_layer
        if is_cross:
            ci = i - fusion_layer
            shz = np.asarray(cross_head_z[ci][0]).reshape(-1) if cross_head_z is not None else None
            xhz = np.asarray(cross_head_z[ci][1]).reshape(-1) if cross_head_z is not None else None
            mz = np.asarray(cross_mlp_z[ci]).reshape(-1) if cross_mlp_z is not None else None
        else:
            shz = np.asarray(text_head_z[i]).reshape(-1) if text_head_z is not None else None
            xhz = None
            mz = np.asarray(text_mlp_z[i]).reshape(-1) if text_mlp_z is not None else None

        if shz is not None and lp.get("attention") is not None:
            lp["attention"] = _slice_heads(
                _fold_head_gate(lp["attention"], shz, head_dim), shz, head_dim, align_heads)
        if xhz is not None and lp.get("crossattention") is not None:
            lp["crossattention"] = _slice_heads(
                _fold_head_gate(lp["crossattention"], xhz, head_dim), xhz, head_dim, align_heads
            )
        if mz is not None and lp.get("intermediate") is not None:
            fc2 = _fold_mlp_gate(lp["output"], mz)
            fc1, fc2 = _slice_mlp(lp["intermediate"], fc2, mz, align_intermediate)
            if fc1 is None:
                lp["intermediate"] = None
                lp["output"] = None
            else:
                lp["intermediate"], lp["output"] = fc1, fc2
        layers.append(lp)
    new["layers"] = layers
    return new


def prune_xvlm_params(params: dict, zs: dict, *, fusion_layer: int, head_dim: int = 64,
                      mxu_align: bool = False) -> dict:
    """Full XVLM export: vision + text towers (retrieval/NLVR/pretrain).
    mxu_align=True rounds sliced widths to 128-lane multiples by keeping
    extra zero-folded units (exactness preserved, better MXU tiling)."""
    ah = max(1, 128 // head_dim) if mxu_align else 1
    ai = 128 if mxu_align else 1
    kw = dict(head_dim=head_dim, align_heads=ah, align_intermediate=ai)
    new = dict(params)
    if "vision" in params:
        new["vision"] = prune_vit_params(params["vision"], zs, **kw)
    if "text" in params:
        new["text"] = prune_bert_params(params["text"], zs, fusion_layer=fusion_layer, **kw)
    if "text_decoder" in params and "decoder_head_z" in zs:
        new["text_decoder"] = prune_bert_params(
            params["text_decoder"], zs, fusion_layer=0, decoder=True, **kw
        )
    elif "text_decoder" in params:
        # captioning decoder shares the text/cross layout
        new["text_decoder"] = prune_bert_params(
            params["text_decoder"], zs, fusion_layer=fusion_layer, **kw
        )
    return new


def load_zs_from_params(
    params: dict,
    *,
    num_heads: int,
    intermediate_size: int,
    head_dim: int = 64,
    fusion_layer: Optional[int] = None,
    vision_num_heads: Optional[int] = None,
    vision_intermediate_size: Optional[int] = None,
    decoder_groups: bool = False,
):
    """Reconstruct binary gate masks for EVERY tower from sliced weight
    shapes — which heads survived cannot be recovered, only how many; used
    for size accounting and for loading a standalone pruned checkpoint
    (reference load_zs / load_pruned_model, xvlm_utils.py:247-299).

    num_heads/intermediate_size are the UNPRUNED text-tower widths;
    vision_* default to the same. fusion_layer splits the text stack into
    text/cross groups (cross layers emit the [Lc,2,H] self/cross pair).
    decoder_groups=True reads `text_decoder` as a VQA answer decoder
    (all-cross, fusion_layer=0 — decoder_head_z/decoder_intermediate_z);
    otherwise a text_decoder shares the text/cross layout (captioning)."""
    v_heads = vision_num_heads or num_heads
    v_inter = vision_intermediate_size or intermediate_size

    def layer_mask(lp, key, n_heads):
        attn = lp.get(key)
        n = 0 if attn is None else attn["q"]["kernel"].shape[1] // head_dim
        m = np.zeros(n_heads)
        m[:n] = 1
        return m

    def mlp_mask(lp, key, size, kernel_axis=1):
        mod = lp.get(key)
        if mod is None:
            return np.zeros(size)
        if key == "mlp":
            n = mod["fc1"]["kernel"].shape[1]
        else:
            n = mod["kernel"].shape[kernel_axis]
        m = np.zeros(size)
        m[:n] = 1
        return m

    def bert_masks(tower: dict, fusion: int, prefix: str):
        """(text groups, cross groups) for one fusion-BERT stack; with
        fusion=0 everything lands in the `prefix` (cross-style) groups."""
        out = {}
        layers = tower["layers"]
        text_layers = layers[:fusion]
        cross_layers = layers[fusion:]
        if text_layers:
            out["text_head_z"] = np.stack(
                [layer_mask(l, "attention", num_heads) for l in text_layers])
            out["text_intermediate_z"] = np.stack(
                [mlp_mask(l, "intermediate", intermediate_size) for l in text_layers])
        if cross_layers:
            out[f"{prefix}_head_z"] = np.stack([
                np.stack([
                    layer_mask(l, "attention", num_heads),
                    layer_mask(l, "crossattention", num_heads),
                ]) for l in cross_layers
            ])
            out[f"{prefix}_intermediate_z"] = np.stack(
                [mlp_mask(l, "intermediate", intermediate_size) for l in cross_layers])
        return out

    zs = {}
    if "vision" in params:
        zs["vision_head_z"] = np.stack(
            [layer_mask(l, "attn", v_heads) for l in params["vision"]["layers"]])
        zs["vision_intermediate_z"] = np.stack(
            [mlp_mask(l, "mlp", v_inter) for l in params["vision"]["layers"]]
        )
    if "text" in params and fusion_layer is not None:
        zs.update(bert_masks(params["text"], fusion_layer, "cross"))
    if "text_decoder" in params:
        if decoder_groups:
            dec = bert_masks(params["text_decoder"], 0, "decoder")
            zs.update(dec)
        elif fusion_layer is not None and "text" not in params:
            # captioning: the decoder IS the text stack (text+cross layout)
            zs.update(bert_masks(params["text_decoder"], fusion_layer, "cross"))
    return zs
