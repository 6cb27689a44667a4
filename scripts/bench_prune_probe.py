"""Probe: pruned-student retrieval throughput vs sparsity on the real chip.

One (sparsity, impl) config per process (the remote compile helper dies on
several large programs back-to-back — see CLAUDE.md). Usage:
  python scripts/bench_prune_probe.py <sparsity> [impl] [mxu_align]
Prints one JSON line.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import bench_model, build  # noqa: E402
from efficientvlm_tpu.pruning.export import prune_xvlm_params  # noqa: E402


def uniform_zs(sparsity: float, *, L=6, H=12, I=3072, fusion=3, rng=None,
               decoder_layers=0):
    """Deterministic uniform gates: keep (1-s) of heads / FFN dims per layer.

    Matches the operating point of the paper's fine-tune targets
    (BASELINE.md: ITR/NLVR/caption 0.25, VQA 0.35) with sparsity spread
    evenly — the worst case for physical pruning (no whole-layer drops)."""
    rng = rng or np.random.RandomState(0)
    keep_h = max(1, round(H * (1 - sparsity)))
    keep_i = max(1, round(I * (1 - sparsity)))

    def head_row():
        m = np.zeros(H, np.float32)
        m[rng.choice(H, keep_h, replace=False)] = 1
        return m

    def mlp_row():
        m = np.zeros(I, np.float32)
        m[rng.choice(I, keep_i, replace=False)] = 1
        return m

    zs = {
        "vision_head_z": np.stack([head_row() for _ in range(L)]),
        "vision_intermediate_z": np.stack([mlp_row() for _ in range(L)]),
        "text_head_z": np.stack([head_row() for _ in range(fusion)]),
        "text_intermediate_z": np.stack([mlp_row() for _ in range(fusion)]),
        "cross_head_z": np.stack([np.stack([head_row(), head_row()]) for _ in range(L - fusion)]),
        "cross_intermediate_z": np.stack([mlp_row() for _ in range(L - fusion)]),
    }
    if decoder_layers:
        zs["decoder_head_z"] = np.stack(
            [np.stack([head_row(), head_row()]) for _ in range(decoder_layers)])
        zs["decoder_intermediate_z"] = np.stack(
            [mlp_row() for _ in range(decoder_layers)])
    return zs


def aligned_zs(sparsity: float, *, L=6, H=12, I=3072, fusion=3, head_dim=64,
               hidden=768, rng=None, decoder_layers=0):
    """MXU-exact uniform gates at the SAME per-layer parameter sparsity as
    uniform_zs, but with the allocation an alignment-aware L0 module would
    learn: head counts in 128-lane pairs (head_dim 64 -> groups of 2) and
    FFN widths absorbing the residual, floored to 128 multiples. Export
    then needs no zero-unit re-padding (pruning/export.py:_align_keep), so
    every sliced matmul lands on exact MXU tiles.

    s=0.25: keep 8/12 heads (512 lanes) + FFN 2432 (19x128) -> exactly
    0.25 params removed per layer (vs uniform's 9->10-head re-pad that
    keeps 83% of attention FLOPs).
    """
    rng = rng or np.random.RandomState(0)
    a = 4 * hidden * head_dim  # params per attention head (q,k,v,out)
    f = 2 * hidden             # params per FFN unit (fc1 row + fc2 col)
    total = a * H + f * I
    keep_h = int(np.clip(round(H * (1 - sparsity) / 2) * 2, 2, H))
    keep_i = I - (sparsity * total - a * (H - keep_h)) / f
    keep_i = int(np.clip((keep_i // 128) * 128, 128, I))

    def head_row():
        m = np.zeros(H, np.float32)
        m[rng.choice(H, keep_h, replace=False)] = 1
        return m

    def mlp_row():
        m = np.zeros(I, np.float32)
        m[rng.choice(I, keep_i, replace=False)] = 1
        return m

    zs = {
        "vision_head_z": np.stack([head_row() for _ in range(L)]),
        "vision_intermediate_z": np.stack([mlp_row() for _ in range(L)]),
        "text_head_z": np.stack([head_row() for _ in range(fusion)]),
        "text_intermediate_z": np.stack([mlp_row() for _ in range(fusion)]),
        "cross_head_z": np.stack([np.stack([head_row(), head_row()]) for _ in range(L - fusion)]),
        "cross_intermediate_z": np.stack([mlp_row() for _ in range(L - fusion)]),
    }
    if decoder_layers:
        zs["decoder_head_z"] = np.stack(
            [np.stack([head_row(), head_row()]) for _ in range(decoder_layers)])
        zs["decoder_intermediate_z"] = np.stack(
            [mlp_row() for _ in range(decoder_layers)])
    realized = (a * (H - keep_h) + f * (I - keep_i)) / total
    zs["__realized_sparsity__"] = realized
    return zs


def main():
    sparsity = float(sys.argv[1])
    impl = sys.argv[2] if len(sys.argv) > 2 else "fused"
    mxu_align = (sys.argv[3] != "0") if len(sys.argv) > 3 else True

    model, params = build(6, 6)
    cast = lambda p: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)
    if sparsity > 0:
        zs = uniform_zs(sparsity)
        params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=mxu_align)
    params = cast(params)
    shapes = [params["vision"]["layers"][0]["attn"]["q"]["kernel"].shape,
              params["vision"]["layers"][0]["mlp"]["fc1"]["kernel"].shape]
    tput = bench_model(model, params, impl=impl)
    print(json.dumps({
        "sparsity": sparsity, "impl": impl, "mxu_align": mxu_align,
        "pairs_per_sec": round(tput, 2), "l0_shapes": [list(s) for s in shapes],
    }))


if __name__ == "__main__":
    main()
