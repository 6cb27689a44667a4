"""Export a pruned student: learned gates -> deterministic masks ->
physically sliced params -> torch-keyed checkpoint.

The reference's offline export path (utils/xvlm_utils.load_model_with_zs ->
update_params -> prune_model_with_z, SURVEY §3.5) as one CLI:

  PYTHONPATH=.:$HOME/.axon_site python scripts/export_pruned.py \\
      --training_state out/itr/training_state_latest.ckpt \\
      --task itr --out pruned_student.th

Prints per-group kept-unit counts and the parameter reduction, saves both
the msgpack pytree (.ckpt) and the torch-keyed .th (loadable by the
reference loaders for the shared-layout parts).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # The axon sitecustomize pins jax_platforms="axon,cpu" at interpreter
    # startup, overriding the env var; re-pin explicitly so CPU-requested
    # exports never touch the tunneled TPU backend (see CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.pruning.export import prune_xvlm_params
from efficientvlm_tpu.pruning.l0_module import NLVRL0Module, VQAL0Module, XVLML0Module
from efficientvlm_tpu.train import checkpoint as C
from efficientvlm_tpu.utils.params import count_all_parameters


def build_l0(task: str, *, vision_layers=6, text_layers=3, cross_layers=3, **kw):
    factory = {"itr": XVLML0Module, "caption": XVLML0Module,
               "vqa": VQAL0Module, "nlvr": NLVRL0Module}[task]
    return factory(vision_layers=vision_layers, text_layers=text_layers,
                   cross_layers=cross_layers, **kw)


def _l0_kw(args):
    kw = dict(vision_layers=args.vision_layers, text_layers=args.text_layers,
              cross_layers=args.cross_layers, hidden_size=args.hidden_size,
              intermediate_size=args.intermediate_size, num_heads=args.num_heads)
    if args.task == "vqa":
        kw["decoder_layers"] = args.decoder_layers
    return kw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--training_state", required=True)
    ap.add_argument("--task", default="itr", choices=["itr", "vqa", "nlvr", "caption"])
    ap.add_argument("--out", default="pruned_student")
    ap.add_argument("--fusion_layer", type=int, default=3)
    ap.add_argument("--head_dim", type=int, default=64)
    # L0 gate-layout geometry — must match the trained model (defaults are the
    # x-vlm-small student: 6L vision / 3+3 text+cross, 768/12/3072 towers)
    ap.add_argument("--vision_layers", type=int, default=6)
    ap.add_argument("--text_layers", type=int, default=3)
    ap.add_argument("--cross_layers", type=int, default=3)
    ap.add_argument("--decoder_layers", type=int, default=None)
    ap.add_argument("--hidden_size", type=int, default=768)
    ap.add_argument("--intermediate_size", type=int, default=3072)
    ap.add_argument("--num_heads", type=int, default=12)
    ap.add_argument("--quantize", default="none", choices=["none", "w8", "w8a8"],
                    help="post-training int8 quantization of the sliced params "
                         "(ops/quant.py); .th export is skipped for quantized "
                         "trees (torch loaders expect float kernels)")
    ap.add_argument("--quant_min_dim", type=int, default=256,
                    help="only quantize 2-D kernels with min(shape) >= this "
                         "(guards tiny classifier heads)")
    args = ap.parse_args()

    # load_params (not load_pytree): msgpack stringifies layer-list indices;
    # prune_*_params index params["..."]["layers"] as real lists. Accepts
    # either checkpoint shape (full resumable state or model snapshot).
    params, l0_params = C.extract_model_and_gates(C.load_params(args.training_state))
    if l0_params is None:
        raise SystemExit(
            f"{args.training_state} carries no L0 gate parameters (a physical "
            "export or a gate-free pretrain state) — nothing to slice. Export "
            "needs a pruning-fine-tune training state or model snapshot.")

    l0 = build_l0(args.task, **_l0_kw(args))
    zs = l0.forward_deterministic({"loga": l0_params["loga"]})
    sizes = l0.calculate_model_size(zs)
    print(json.dumps({k: v for k, v in sizes.items() if not isinstance(v, list)}, indent=2))
    for k, v in sizes.items():
        if isinstance(v, list):
            print(f"  {k}: {v}")

    n_before = count_all_parameters(params)
    pruned = prune_xvlm_params(params, {k: np.asarray(v) for k, v in zs.items()},
                               fusion_layer=args.fusion_layer, head_dim=args.head_dim)
    n_after = count_all_parameters(pruned)
    print(f"params: {n_before:,} -> {n_after:,} ({100 * (1 - n_after / n_before):.1f}% removed)")

    if args.quantize != "none":
        from efficientvlm_tpu.ops.quant import quantize_params, quantized_bytes

        pruned = jax.tree.map(np.asarray, quantize_params(
            pruned, mode=args.quantize, min_dim=args.quant_min_dim))
        b = quantized_bytes(pruned)
        print(f"int8 {args.quantize}: {b['quantized_bytes']:,} bytes "
              f"({100 * b['quantized_bytes'] / b['float32_bytes']:.0f}% of float32)")

    C.save_pytree(args.out + ".ckpt", pruned)
    print(f"saved {args.out}.ckpt")
    if args.quantize != "none":
        return
    try:
        import torch

        sd = C.xvlm_state_dict_from_params(pruned, fusion_layer=args.fusion_layer)
        torch.save({"model": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}},
                   args.out + ".th")
        print(f"saved {args.out}.th (torch-keyed)")
    except Exception as e:
        print(f"torch export skipped: {e}")


if __name__ == "__main__":
    main()
