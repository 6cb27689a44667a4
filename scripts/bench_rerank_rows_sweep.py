"""Sweep rows_per_call for the ITM rerank chunk program (VERDICT r4 #4).

The rerank runs 40-token text rows through the fusion stack; at
rows_per_call=4 (batch 4*256=1024) it measured 0.217 MFU — latency-bound
fixed per-layer costs. Packing more query rows per dispatch at constant
k_test amortizes them. This sweeps rows at k=256 on the pruned-0.25
export (the bench.py rerank_pruned phase geometry) and reports
pairs/s + MFU per point, one JSON line each.

Run: PYTHONPATH=.:/root/.axon_site python scripts/bench_rerank_rows_sweep.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import _cast_bf16, build, timed_tput
from efficientvlm_tpu.evaluation.retrieval import itm_rerank_scores
from efficientvlm_tpu.pruning.export import prune_xvlm_params
from scripts.bench_prune_probe import aligned_zs


def main(k=256, image_res=384, txt_len=40, sparsity=0.25):
    model, params = build(6, 6)
    zs = aligned_zs(sparsity)
    zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    params = _cast_bf16(params)
    dtype = jnp.bfloat16
    n_patch = (image_res // 16) ** 2 + 1
    key = jax.random.PRNGKey(3)

    for rows in (4, 8, 16, 32):
        ib = jax.random.normal(key, (rows, n_patch, 768), dtype)
        txt = jax.random.normal(key, (rows * k, txt_len, 768), dtype)
        att = jnp.ones((rows * k, txt_len), jnp.int32)

        def chunk(p, ib, txt, att, rows=rows):
            return itm_rerank_scores(model, p, ib, txt, att, rows, k,
                                     dtype=dtype, impl="fused")

        iters = max(2, 32 // rows)
        r = timed_tput(chunk, (params, ib, txt, att), rows * k, iters=iters)
        print(json.dumps({"rows": rows, "pairs_per_sec": round(r["tput"], 1),
                          "mfu": r["mfu"], "tflops_per_s": r["tflops_per_s"]}),
              flush=True)


if __name__ == "__main__":
    main()
