"""Capture a device trace of the ITM rerank chunk and print the top HLO ops
by self time (tensorboard_plugin_profile parse of the xplane) — attribution
for the rerank MFU work (VERDICT r4 #4).

Run: PYTHONPATH=.:/root/.axon_site python scripts/bench_rerank_trace.py
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import _cast_bf16, build
from efficientvlm_tpu.evaluation.retrieval import itm_rerank_scores
from efficientvlm_tpu.pruning.export import prune_xvlm_params
from scripts.bench_prune_probe import aligned_zs


def main(k=256, rows=4, image_res=384, txt_len=40, sparsity=0.25, trace_dir="/tmp/rerank_trace"):
    model, params = build(6, 6)
    zs = aligned_zs(sparsity)
    zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    params = _cast_bf16(params)
    dtype = jnp.bfloat16
    n_patch = (image_res // 16) ** 2 + 1
    key = jax.random.PRNGKey(3)
    ib = jax.random.normal(key, (rows, n_patch, 768), dtype)
    txt = jax.random.normal(key, (rows * k, txt_len, 768), dtype)
    att = jnp.ones((rows * k, txt_len), jnp.int32)

    @jax.jit
    def chunk(p, ib, txt, att):
        return itm_rerank_scores(model, p, ib, txt, att, rows, k,
                                 dtype=dtype, impl="fused")

    for _ in range(3):  # warm compile + lazy uploads
        np.asarray(chunk(params, ib, txt, att))

    with jax.profiler.trace(trace_dir):
        for _ in range(4):
            np.asarray(chunk(params, ib, txt, att))

    # parse: sum device-stream event self-times by op name
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplanes:", xspaces, file=sys.stderr)
    data, _ = rtd.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    out = data.decode() if isinstance(data, bytes) else data
    print(out[:8000])


if __name__ == "__main__":
    main()
