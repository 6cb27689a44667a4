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
import numpy as np

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--training_state", required=True)
    ap.add_argument("--task", default="itr", choices=["itr", "vqa", "nlvr", "caption"])
    ap.add_argument("--out", default="pruned_student")
    ap.add_argument("--fusion_layer", type=int, default=3)
    ap.add_argument("--head_dim", type=int, default=64)
    args = ap.parse_args()

    state = C.load_pytree(args.training_state)
    params = state["model"]
    l0_params = state["l0"]

    l0 = build_l0(args.task)
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

    C.save_pytree(args.out + ".ckpt", pruned)
    print(f"saved {args.out}.ckpt")
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
