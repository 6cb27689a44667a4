"""Per-component MFU breakdown of the pruned vs teacher retrieval forward.

The headline phase (bench.py) shows pruned MFU 0.50 vs teacher 0.60: this
probe attributes the gap by timing each stage separately — vision encode,
text encode, fusion ITM — at both geometries and both impls, each
(component, model, impl) in its OWN subprocess (the remote compile helper
dies compiling several large programs back-to-back in one process).

Run: PYTHONPATH=.:/root/.axon_site python scripts/bench_component_probe.py
     [--component vision --model pruned --impl fused]   (single, subprocess
     mode; no args = driver loop over the grid)
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(component: str, model_kind: str, impl: str, batch=32, image_res=384):
    from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from bench import PEAK_TFLOPS, build, _cast_bf16, timed_tput
    from efficientvlm_tpu.models.xvlm import mlp_head_apply

    if model_kind == "teacher":
        model, params = build(12, 12)
    else:
        from scripts.bench_prune_probe import aligned_zs
        from efficientvlm_tpu.pruning.export import prune_xvlm_params

        model, params = build(6, 6)
        zs = aligned_zs(0.25)
        zs.pop("__realized_sparsity__")
        params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    params = _cast_bf16(params)
    dtype = jnp.bfloat16

    image = jax.random.normal(jax.random.PRNGKey(1), (batch, image_res, image_res, 3), dtype)
    text_ids = jax.random.randint(jax.random.PRNGKey(2), (batch, 40), 0, 30522)
    text_atts = jnp.ones((batch, 40), jnp.int32)
    n_patch = (image_res // 16) ** 2 + 1
    img_embeds = jax.random.normal(jax.random.PRNGKey(3), (batch, n_patch, 768), dtype)
    txt_embeds = jax.random.normal(jax.random.PRNGKey(4), (batch, 40, 768), dtype)

    # each fn returns a SCALAR: fetching a [B,S,W] output through the tunnel
    # costs 50-100 ms/batch amortized and swamps the compute being measured
    if component == "vision":
        fn = lambda p, im: model.get_vision_embeds(p, im, dtype=dtype, impl=impl)[0].mean()
        args = (params, image)
    elif component == "text":
        fn = lambda p, ti, ta: model.get_text_embeds(p, ti, ta, dtype=dtype, impl=impl)["last_hidden"].mean()
        args = (params, text_ids, text_atts)
    elif component == "fusion":
        def fn(p, ie, te, ta):
            ia = jnp.ones(ie.shape[:2], jnp.int32)
            out = model.get_cross_embeds(p, ie, ia, text_embeds=te, text_atts=ta,
                                         dtype=dtype, impl=impl)
            return mlp_head_apply(p["itm_head"], out["last_hidden"][:, 0], dtype=dtype).mean()
        args = (params, img_embeds, txt_embeds, text_atts)
    else:
        raise ValueError(component)

    r = timed_tput(fn, args, batch, iters=20)
    ms_per_batch = batch / r["tput"] * 1e3
    print(json.dumps({"component": component, "model": model_kind, "impl": impl,
                      "ms_per_batch": round(ms_per_batch, 3),
                      "tflops_per_s": r["tflops_per_s"], "mfu": r["mfu"]}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--component")
    ap.add_argument("--model", default="pruned")
    ap.add_argument("--impl", default="fused")
    a = ap.parse_args()
    if a.component:
        run_one(a.component, a.model, a.impl)
        return
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(here) + os.pathsep + env.get("PYTHONPATH", "")
    for model_kind in ("pruned", "teacher"):
        for component in ("vision", "text", "fusion"):
            for impl in ("fused", "xla"):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--component", component,
                     "--model", model_kind, "--impl", impl],
                    capture_output=True, text=True, timeout=2400, env=env,
                    cwd=os.path.dirname(here))
                line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
                print(line[-1] if line else
                      f'{{"component": "{component}", "model": "{model_kind}", '
                      f'"impl": "{impl}", "error": {json.dumps(out.stderr[-300:])}}}',
                      flush=True)


if __name__ == "__main__":
    main()
