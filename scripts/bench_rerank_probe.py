"""Retrieval i2t rerank: grouped cross-K/V vs repeat-expanded image rows.

Measures the jitted _i2t_chunk-equivalent at eval shapes (384px banks,
k_test=256, rows_per_call=4) both ways on the real chip. The grouped path
projects cross K/V from [R] image rows and shares them across the k
candidate texts per image (ops/attention.py grouped-K/V); the expanded
path is the pre-e507039 behavior (repeat image rows to [R*k] and re-project
per candidate — the reference's layout, Eff_Retrieval.py:285-319).

Run: PYTHONPATH=.:/root/.axon_site python scripts/bench_rerank_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import build, _cast_bf16
from efficientvlm_tpu.evaluation.retrieval import itm_rerank_scores


def main(image_res=384, k=256, rows=4, txt_len=40, iters=8):
    model, params = build(6, 6)
    params = _cast_bf16(params)
    dtype = jnp.bfloat16
    n_patch = (image_res // 16) ** 2 + 1
    key = jax.random.PRNGKey(0)
    ib = jax.random.normal(key, (rows, n_patch, 768), dtype)
    tb = jax.random.normal(key, (k, txt_len, 768), dtype)
    ab = jnp.ones((k, txt_len), jnp.int32)

    def scores(p, img_rows, txt_rows, att_rows):
        # the shared eval-rerank chunk program (evaluation/retrieval.py)
        return itm_rerank_scores(model, p, img_rows, txt_rows, att_rows,
                                 rows, k, dtype=dtype, impl="fused")

    @jax.jit
    def grouped(p, ib, tb, ab):
        txt = jnp.tile(tb, (rows, 1, 1))
        att = jnp.tile(ab, (rows, 1))
        return scores(p, ib, txt, att)

    @jax.jit
    def expanded(p, ib, tb, ab):
        img = jnp.repeat(ib, k, axis=0)
        txt = jnp.tile(tb, (rows, 1, 1))
        att = jnp.tile(ab, (rows, 1))
        return scores(p, img, txt, att)

    res = {}
    for name, fn in [("grouped", grouped), ("expanded", expanded)]:
        out = fn(params, ib, tb, ab)
        np.asarray(out)  # sync (tunnel: host fetch, not block_until_ready)
        np.asarray(fn(params, ib, tb, ab))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(params, ib, tb, ab) for _ in range(iters)]
            np.asarray(outs[-1])
            ts.append((time.perf_counter() - t0) / iters)
        res[name] = float(np.median(ts))
    res["pairs_per_sec_grouped"] = rows * k / res["grouped"]
    res["pairs_per_sec_expanded"] = rows * k / res["expanded"]
    res["speedup"] = res["expanded"] / res["grouped"]
    # equivalence at bf16 tolerance
    g = np.asarray(grouped(params, ib, tb, ab), np.float32)
    e = np.asarray(expanded(params, ib, tb, ab), np.float32)
    res["max_abs_diff"] = float(np.max(np.abs(g - e)))
    print(json.dumps({k2: round(v, 4) for k2, v in res.items()}))


if __name__ == "__main__":
    main()
