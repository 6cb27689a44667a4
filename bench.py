"""Benchmark: retrieval inference throughput (pairs/sec/chip) on the student.

Measures the eval-path unit of work (Eff_Retrieval.py:216-332): image encode
+ text encode + ITC features + ITM fusion rescore for a batch of pairs, on
the 6L/6L student at 384px in bf16 with the Pallas fused-attention path.

Prints ONE JSON line:
  {"metric": "retrieval_pairs_per_sec_per_chip", "value": N,
   "unit": "pairs/s", "vs_baseline": R}
vs_baseline = student throughput / dense 12L/12L teacher throughput on the
same chip (the reference paper's headline is ~2.2x student-vs-teacher
inference speedup; BASELINE.json publishes no absolute numbers).
"""

import json
import time

import jax
import jax.numpy as jnp

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
from efficientvlm_tpu.models.xvlm import mlp_head_apply


def build(num_vision_layers, num_text_layers, image_res=384):
    vcfg = VisionConfig.create(num_hidden_layers=num_vision_layers, image_res=image_res)
    tcfg = TextConfig.create(
        num_hidden_layers=num_text_layers,
        fusion_layer=num_text_layers // 2,
        encoder_width=768,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 256}))
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def retrieval_forward(model, params, image, text_ids, text_atts, impl="pallas", dtype=jnp.bfloat16):
    image_embeds, image_atts, _ = model.get_vision_embeds(params, image, dtype=dtype, impl=impl)
    tout = model.get_text_embeds(params, text_ids, text_atts, dtype=dtype, impl=impl)
    text_embeds = tout["last_hidden"]
    image_feat, text_feat = model.get_features(params, image_embeds, text_embeds, dtype=dtype)
    cross = model.get_cross_embeds(
        params, image_embeds, image_atts, text_embeds=text_embeds,
        text_atts=text_atts, dtype=dtype, impl=impl,
    )
    itm = mlp_head_apply(params["itm_head"], cross["last_hidden"][:, 0], dtype=dtype)
    return image_feat, text_feat, itm


def bench_model(model, params, batch=32, image_res=384, iters=20, impl="fused"):
    """impl='fused': the Pallas fused QKV+attention+gating+out-proj layer
    kernel (ops/pallas_fused_mha.py) — ~27% over XLA's fusion at these
    shapes; 'xla' and the standalone 'pallas' attention kernel remain
    available."""
    image = jax.random.normal(jax.random.PRNGKey(1), (batch, image_res, image_res, 3), jnp.bfloat16)
    text_ids = jax.random.randint(jax.random.PRNGKey(2), (batch, 40), 0, 30522)
    text_atts = jnp.ones((batch, 40), jnp.int32)

    import numpy as np

    fwd = jax.jit(lambda p, i, ti, ta: retrieval_forward(model, p, i, ti, ta, impl=impl))
    out = fwd(params, image, text_ids, text_atts)
    # NOTE: on the tunneled TPU backend block_until_ready returns before
    # execution completes; a host fetch is the only reliable sync.
    np.asarray(out[2])
    t0 = time.perf_counter()
    outs = [fwd(params, image, text_ids, text_atts) for _ in range(iters)]
    np.asarray(outs[-1][2])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    student_model, student_params = build(6, 6)
    teacher_model, teacher_params = build(12, 12)
    # bf16 param storage: halves HBM param traffic at inference
    cast = lambda p: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)
    student_params = cast(student_params)
    teacher_params = cast(teacher_params)

    student_tput = bench_model(student_model, student_params)
    teacher_tput = bench_model(teacher_model, teacher_params)

    print(json.dumps({
        "metric": "retrieval_pairs_per_sec_per_chip",
        "value": round(student_tput, 2),
        "unit": "pairs/s",
        "vs_baseline": round(student_tput / teacher_tput, 3),
    }))


if __name__ == "__main__":
    main()
