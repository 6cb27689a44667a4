"""Caption beam-decode step breakdown: model step vs beam bookkeeping.

Times, for the 0.25-pruned captioner at bench shapes (b64, 3 beams, 384px):
  (a) full generate at max_length 20 and 8 -> marginal ms/decode-step
  (b) one bare decode_fn call (layer stack + LM head) at [192] rows
The difference (a)-(b) is the per-step beam bookkeeping (log_softmax over
[192,30522], 2K top_k over [64, 3*30522], pool insert, cache gather).

Measured (v5e-1, grouped cross-K/V): per_step 1.64 ms = bare model step
1.08 ms + bookkeeping 0.56 ms. The bare step sits near its HBM floor
(weights + grouped cross K/V + cache traffic ~0.8 ms); the bookkeeping is
bandwidth-bound on the [192,30522] f32 logits passes (log_softmax + top_k
+ cache gather ~90 MB/step), NOT sort-bound — a two-stage exact top-k
(per-beam top-2K then merge 3*2K) moves the same bytes (TPU TopK is ~k
passes over n either way: 6*91566*64 == 6*30522*192), so it was evaluated
analytically and rejected.

Each measurement runs in this one process (programs are small: one While
program + one step program). Run:
  PYTHONPATH=.:/root/.axon_site python scripts/bench_decode_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


from efficientvlm_tpu.train.profiler import median_time


def _time(fn, *args, iters=8):
    # shared tunnel-safe timing recipe (train/profiler.py)
    return median_time(fn, args, iters=iters)


def main(batch=64, beams=3, image_res=384):
    from bench import build as _b  # noqa: F401  (cache enable side effect)
    from scripts.bench_prune_probe import aligned_zs

    from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
    from efficientvlm_tpu.drivers.captioning import build_models
    from efficientvlm_tpu.generation import make_bert_decode_fn
    from efficientvlm_tpu.models import bert as B
    from efficientvlm_tpu.pruning.export import prune_xvlm_params

    vcfg = VisionConfig.create(num_hidden_layers=6, image_res=image_res)
    tcfg = TextConfig.create(
        num_hidden_layers=6, fusion_layer=3, encoder_width=768,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    config = Config.from_dict({
        "vision": vcfg, "text": tcfg, "image_res": image_res,
        "text_encoder": "", "prompt": "a picture of ", "num_beams": beams,
    })
    model, _ = build_models(config)
    params = model.init(jax.random.PRNGKey(0))
    zs = aligned_zs(0.25)
    zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    dtype = jnp.bfloat16
    image = jax.random.normal(jax.random.PRNGKey(1), (batch, image_res, image_res, 3), dtype)
    prompt = jnp.asarray([[101, 1037, 3861, 1997]] * batch, jnp.int32)

    res = {}
    for ml in (20, 8):
        gen = jax.jit(lambda p, im, ml=ml: model.generate(
            p, im, prompt, max_length=ml, min_length=ml, num_beams=beams,
            eos_id=102, pad_id=0, dtype=dtype, impl="fused"))
        res[f"generate_ml{ml}_ms"] = _time(gen, params, image) * 1e3

    steps = 20 - 8
    res["per_step_ms"] = (res["generate_ml20_ms"] - res["generate_ml8_ms"]) / steps

    # bare decode step at [B*K] rows (cross K/V grouped at [B]); everything
    # large rides as ARGUMENTS — closing jits over arrays inlines them as
    # module constants (CLAUDE.md)
    image_embeds, image_atts, _ = model.encode_image(params, image, dtype=dtype, impl="fused")
    flat = batch * beams
    cross_kv = B.precompute_cross_kv(
        params["text_decoder"], model.text_cfg, image_embeds, dtype=dtype)
    cache = B.init_bert_cache(params["text_decoder"], model.text_cfg, flat, 20, dtype=dtype)
    tok = jnp.full((flat, 1), 1037, jnp.int32)

    # chain 12 dependent steps in ONE jit — per-dispatch timing through the
    # tunnel is fetch/RPC-dominated (CLAUDE.md); argmax feedback keeps the
    # chain dependent like real greedy decode, minus all beam bookkeeping
    chain_n = 12

    @jax.jit
    def chain(p, tok, cache, ckv):
        def body(i, carry):
            tok, cache = carry
            out = B.bert_apply(
                p["text_decoder"], tok, model.text_cfg, mode="multi_modal",
                is_decoder=True, cache=cache, cross_kv=ckv,
                position_offset=4 + i, dtype=dtype)
            logits = B.mlm_head_apply(
                p["text_decoder"]["cls"], out["last_hidden"], model.text_cfg,
                dtype=dtype)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return tok, out["cache"]

        tok, cache = jax.lax.fori_loop(0, chain_n, body, (tok, cache))
        return tok

    res["bare_step_ms"] = _time(chain, params, tok, cache, cross_kv) * 1e3 / chain_n
    res["bookkeeping_ms"] = res["per_step_ms"] - res["bare_step_ms"]
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
