"""Benchmark: pruned-student retrieval inference throughput (pairs/sec/chip).

Measures the eval-path unit of work (Eff_Retrieval.py:216-332): image encode
+ text encode + ITC features + ITM fusion rescore at 384px bf16 with the
Pallas fused-attention path, for THREE models:
  - teacher: dense 12L/12L (the paper's speedup baseline)
  - student: dense 6L/6L (general-distilled)
  - pruned:  6L/6L physically exported at the ITR sparsity target 0.25
    (BASELINE.md), MXU-aligned slicing
plus the stage-2 KD train-step time (BASELINE's second metric).

Each phase runs in its OWN subprocess — the remote compile helper dies when
one process compiles several large programs back-to-back (CLAUDE.md).

Prints ONE JSON line:
  {"metric": "pruned_retrieval_pairs_per_sec_per_chip", "value": N,
   "unit": "pairs/s", "vs_baseline": R, ...}
vs_baseline = pruned-student / dense-teacher throughput — the unit of the
paper's ~2.2x inference-speedup headline (arXiv:2210.07795, README.md:114).
"""

import json
import os
import subprocess
import sys
import time


def build(num_vision_layers, num_text_layers, image_res=384):
    import jax

    from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
    from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval

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


def retrieval_forward(model, params, image, text_ids, text_atts, impl="fused", dtype=None):
    import jax.numpy as jnp

    from efficientvlm_tpu.models.xvlm import mlp_head_apply

    dtype = dtype or jnp.bfloat16
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


# v5e peak compute per chip (BF16 MXU / INT8 MXU), for MFU
PEAK_TFLOPS = {"bf16": 197.0, "int8": 394.0}


def timed_tput(fn, args, items_per_call, *, iters=20, runs=3, warmups=3,
               peak="bf16"):
    """Median-of-`runs` pipelined throughput with >= `warmups` warm calls
    (the tunnel pays 28-37s of lazy buffer upload on the first 1-2 executions
    after compile — CLAUDE.md), plus XLA cost-analysis FLOPs -> MFU.

    Returns {"tput", "tputs", "tflops_per_s", "mfu"}. FLOPs come from the
    compiled module's cost analysis; for programs whose hot loop is a While
    (beam decode) XLA counts the body once, so callers mark those phases'
    mfu as None rather than report an undercount."""
    import jax
    import numpy as np

    from efficientvlm_tpu.train.profiler import timed_runs

    compiled = jax.jit(fn).lower(*args).compile()
    try:
        flops = float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:
        flops = 0.0
    # shared tunnel-safe timing core (warm calls, host-fetch sync, N runs)
    secs = timed_runs(compiled, args, iters=iters, runs=runs, warmups=warmups)
    tputs = [items_per_call / s for s in secs]
    tput = float(np.median(tputs))
    tflops_per_s = flops * tput / items_per_call / 1e12 if flops > 0 else None
    return {
        "tput": tput,
        "tputs": [round(t, 2) for t in tputs],
        "tflops_per_s": round(tflops_per_s, 2) if tflops_per_s else None,
        "mfu": round(tflops_per_s / PEAK_TFLOPS[peak], 4) if tflops_per_s else None,
    }


def bench_model(model, params, batch=32, image_res=384, iters=20, impl="fused",
                peak="bf16"):
    """impl='fused': the Pallas fused QKV+attention+gating+out-proj layer
    kernel (ops/pallas_fused_mha.py) — ~27% over XLA's fusion at these
    shapes, now supporting the pruned rectangular widths; 'xla' and the
    standalone 'pallas' attention kernel remain available."""
    import jax
    import jax.numpy as jnp

    image = jax.random.normal(jax.random.PRNGKey(1), (batch, image_res, image_res, 3), jnp.bfloat16)
    text_ids = jax.random.randint(jax.random.PRNGKey(2), (batch, 40), 0, 30522)
    text_atts = jnp.ones((batch, 40), jnp.int32)

    fwd = lambda p, i, ti, ta: retrieval_forward(model, p, i, ti, ta, impl=impl)
    return timed_tput(fwd, (params, image, text_ids, text_atts), batch,
                      iters=iters, peak=peak)


def _cast_bf16(params):
    import jax
    import jax.numpy as jnp

    # bf16 param storage: halves HBM param traffic at inference
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)


def bench_rerank(model, params, rows=4, k=256, image_res=384, txt_len=40, iters=8):
    """ITM k_test rerank chunk (evaluation/retrieval.py:_i2t_chunk shapes:
    rows_per_call=4 query images x k_test=256 candidate texts): the k
    candidates per image share its cross K/V via grouped-K/V attention
    (ops/attention.py) instead of repeat-projecting the image rows — the
    reranking stage is the reference retrieval eval's hot loop
    (Eff_Retrieval.py:285-319). Returns pairs/s keys prefixed rerank_."""
    import jax
    import jax.numpy as jnp

    from efficientvlm_tpu.evaluation.retrieval import itm_rerank_scores

    dtype = jnp.bfloat16
    n_patch = (image_res // 16) ** 2 + 1
    key = jax.random.PRNGKey(3)
    ib = jax.random.normal(key, (rows, n_patch, 768), dtype)
    txt = jax.random.normal(key, (rows * k, txt_len, 768), dtype)
    att = jnp.ones((rows * k, txt_len), jnp.int32)

    def chunk(p, ib, txt, att):
        # the SAME chunk program the retrieval eval runs (shared helper)
        return itm_rerank_scores(model, p, ib, txt, att, rows, k,
                                 dtype=dtype, impl="fused")

    r = timed_tput(chunk, (params, ib, txt, att), rows * k, iters=iters)
    return {"rerank_tput": r["tput"], "rerank_mfu": r["mfu"],
            "rerank_tflops_per_s": r["tflops_per_s"]}


def phase_teacher():
    model, params = build(12, 12)
    print(json.dumps(bench_model(model, _cast_bf16(params))))


def phase_rerank_teacher():
    # own subprocess: the remote compile helper dies compiling several
    # large programs back-to-back in one process (CLAUDE.md)
    model, params = build(12, 12)
    print(json.dumps(bench_rerank(model, _cast_bf16(params))))


def phase_student():
    model, params = build(6, 6)
    print(json.dumps(bench_model(model, _cast_bf16(params))))


def phase_pruned(sparsity=0.25):
    """Physical export at the ITR target sparsity 0.25 with the MXU-exact
    head-pair/128-wide allocation (aligned_zs): identical parameter
    sparsity to the uniform spread, but no zero-unit re-padding at export
    so every sliced matmul tiles the MXU exactly."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_prune_probe import aligned_zs

    from efficientvlm_tpu.pruning.export import prune_xvlm_params

    model, params = build(6, 6)
    zs = aligned_zs(sparsity)
    realized = zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    print(json.dumps({**bench_model(model, _cast_bf16(params)),
                      "sparsity": sparsity, "realized_sparsity": realized}))


def phase_rerank_pruned(sparsity=0.25):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_prune_probe import aligned_zs

    from efficientvlm_tpu.pruning.export import prune_xvlm_params

    model, params = build(6, 6)
    zs = aligned_zs(sparsity)
    zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    print(json.dumps(bench_rerank(model, _cast_bf16(params))))


def phase_pruned_int8(sparsity=0.25, mode="w8"):
    """The 0.25-pruned student served int8 (ops/quant.py) in the DEFAULT
    w8 weight-only mode: weights stream 1 byte/param, compute stays bf16.
    w8a8 was demoted after measurement (probe: s8 dot only 1.27x bf16 at
    these widths, and int8 params force attention off the fused kernel) —
    see ops/quant.py module docstring. Uses impl='xla' — the quantized
    dense format dispatches inside ops.basic.dense."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_prune_probe import aligned_zs

    from efficientvlm_tpu.ops.quant import quantize_params
    from efficientvlm_tpu.pruning.export import prune_xvlm_params

    model, params = build(6, 6)
    zs = aligned_zs(sparsity)
    zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    params = quantize_params(_cast_bf16(params), mode=mode)  # scales stay f32
    # w8 computes in bf16 (dequant fused into the dot) -> bf16 MFU peak
    print(json.dumps({**bench_model(model, params, impl="xla",
                                    peak="int8" if mode == "w8a8" else "bf16"),
                      "mode": mode, "sparsity": sparsity}))


def build_vqa(num_layers, image_res=480):
    import jax

    from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
    from efficientvlm_tpu.models.model_generation import XVLMForVQA
    from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    vcfg = VisionConfig.create(num_hidden_layers=num_layers, image_res=image_res)
    tcfg = TextConfig.create(
        num_hidden_layers=num_layers, fusion_layer=num_layers // 2, encoder_width=768,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = XVLMForVQA(vcfg, tcfg, Config({"pad_token_id": 0}))
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def bench_vqa(model, params, batch=16, image_res=480, iters=10, k=128,
              num_answers=3128, answer_len=6, impl="fused"):
    """The VQA eval unit of work (Eff_VQA.py evaluation): 480px image +
    question fusion encode, then the two-call k-way answer rerank
    (model_generation rank_answer). Throughput = questions/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    image = jax.random.normal(jax.random.PRNGKey(1), (batch, image_res, image_res, 3), jnp.bfloat16)
    q_ids = jax.random.randint(jax.random.PRNGKey(2), (batch, 25), 0, 30522)
    q_atts = jnp.ones((batch, 25), jnp.int32)
    a_ids = jax.random.randint(jax.random.PRNGKey(3), (num_answers, answer_len), 0, 30522)
    a_atts = jnp.ones((num_answers, answer_len), jnp.int32)

    fwd = lambda p, i, qi, qa: model.forward_eval(
        p, i, qi, qa, a_ids, a_atts, k=k, dtype=jnp.bfloat16, impl=impl)
    return timed_tput(fwd, (params, image, q_ids, q_atts), batch, iters=iters)


def phase_vqa_teacher():
    model, params = build_vqa(12)
    print(json.dumps(bench_vqa(model, _cast_bf16(params))))


def phase_pruned_vqa(sparsity=0.35):
    """BASELINE.md VQA operating point: sparsity 0.35 at 480px
    (configs/x-vlm-small-ft/VQA_480.yaml)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_prune_probe import aligned_zs

    from efficientvlm_tpu.pruning.export import prune_xvlm_params

    model, params = build_vqa(6)
    num_dec = model.decoder_cfg["num_hidden_layers"]
    zs = aligned_zs(sparsity, decoder_layers=num_dec)
    realized = zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    print(json.dumps({**bench_vqa(model, _cast_bf16(params)),
                      "sparsity": sparsity, "realized_sparsity": realized}))


def build_caption(num_layers, image_res=384):
    import jax

    from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
    from efficientvlm_tpu.models.model_generation import XVLMForCaptioning
    from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    vcfg = VisionConfig.create(num_hidden_layers=num_layers, image_res=image_res)
    tcfg = TextConfig.create(
        num_hidden_layers=num_layers, fusion_layer=num_layers // 2, encoder_width=768,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = XVLMForCaptioning(vcfg, tcfg, Config({}))
    return model, model.init(jax.random.PRNGKey(0))


def bench_caption(model, params, batch=16, image_res=384, iters=5,
                  num_beams=3, max_length=20, impl="fused"):
    """The captioning inference hot path (SURVEY §3.4: beam-search generate,
    reference model_generation.py:155-227 / Eff_Captioning eval): 384px
    encode + KV-cached 3-beam decode to 20 tokens. Throughput = images/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    image = jax.random.normal(jax.random.PRNGKey(1), (batch, image_res, image_res, 3), jnp.bfloat16)
    # "a picture of" style prompt: 4 tokens incl. [CLS], SEP dropped
    prompt = jnp.asarray([[101, 1037, 3861, 1997]] * batch, jnp.int32)

    gen = lambda p, img, pids: model.generate(
        p, img, pids, num_beams=num_beams, max_length=max_length, min_length=5,
        eos_id=102, pad_id=0, dtype=jnp.bfloat16, impl=impl)
    out = timed_tput(gen, (params, image, prompt), batch, iters=iters)
    # the decode loop is a While whose body XLA cost analysis counts once:
    # the FLOP estimate undercounts ~max_length x — don't report it as MFU
    out["tflops_per_s"] = out["mfu"] = None
    return out


def phase_caption_teacher():
    model, params = build_caption(12)
    print(json.dumps(bench_caption(model, _cast_bf16(params))))


def phase_pruned_caption(sparsity=0.25):
    """BASELINE.md captioning operating point: sparsity 0.25 at 384px."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_prune_probe import aligned_zs

    from efficientvlm_tpu.pruning.export import prune_xvlm_params

    model, params = build_caption(6)
    zs = aligned_zs(sparsity)
    realized = zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    print(json.dumps({**bench_caption(model, _cast_bf16(params)),
                      "sparsity": sparsity, "realized_sparsity": realized}))


def phase_serving(sparsity=0.25, clients=8, requests=64, impl="fused"):
    """Online-serving unit: the 0.25-pruned captioning model behind the
    dynamic-batching HTTP endpoint (efficientvlm_tpu/serving), hit by
    concurrent clients with real JPEG payloads — reports end-to-end req/s
    (decode + preprocess + coalesced beam decode) and the mean coalesced
    batch size."""
    import base64
    import io
    import threading
    import urllib.request

    import jax
    import numpy as np
    from PIL import Image

    from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # warm re-runs skip the tunnel cold compiles

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_prune_probe import aligned_zs

    from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
    from efficientvlm_tpu.pruning.export import prune_xvlm_params
    from efficientvlm_tpu.serving import (
        InferenceService, make_http_server, serve_forever_in_thread,
    )

    image_res = 384
    vcfg = VisionConfig.create(num_hidden_layers=6, image_res=image_res)
    tcfg = TextConfig.create(
        num_hidden_layers=6, fusion_layer=3, encoder_width=768,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    config = Config.from_dict({
        "vision": vcfg, "text": tcfg, "image_res": image_res,
        "text_encoder": "", "compute_dtype": "bf16", "attn_impl": impl,
        "prompt": "a picture of ", "num_beams": 3, "max_length": 20,
        "min_length": 5,
    })
    # init from the SAME constructor the service will use, so the pruned
    # tree matches the hosted model's geometry exactly
    from efficientvlm_tpu.drivers.captioning import build_models

    model, _ = build_models(config)
    params = model.init(jax.random.PRNGKey(0))
    zs = aligned_zs(sparsity)
    zs.pop("__realized_sparsity__")
    params = prune_xvlm_params(params, zs, fusion_layer=3, head_dim=64, mxu_align=True)
    service = InferenceService(
        "caption", config, params=_cast_bf16(params),
        max_batch_size=16, max_wait_ms=10.0)
    server = make_http_server(service, "127.0.0.1", 0)
    serve_forever_in_thread(server)
    host, port = server.server_address
    base = f"http://{host}:{port}/caption"

    rng = np.random.RandomState(0)
    payloads = []
    for i in range(clients):
        img = Image.fromarray(np.uint8(rng.rand(image_res, image_res, 3) * 255))
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        payloads.append(json.dumps(
            {"image_b64": base64.b64encode(buf.getvalue()).decode()}).encode())

    def _post(ci):
        urllib.request.urlopen(urllib.request.Request(
            base, data=payloads[ci % len(payloads)],
            headers={"Content-Type": "application/json"}), timeout=3000).read()

    # deterministic per-bucket warmup (compiles are not the bench), plus
    # two HTTP round-trips to warm the request path itself
    service.warmup_buckets(min(clients, 16))
    for _ in range(2):
        _post(0)
    service.reset_stats()

    n_done, lock = [0], threading.Lock()

    def client(ci):
        while True:
            with lock:
                if n_done[0] >= requests:
                    return
                n_done[0] += 1
            _post(ci)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    stats = service.stats()
    server.shutdown()
    service.close()
    def _r(x, nd=1):
        return round(x, nd) if x is not None else None

    print(json.dumps({
        "tput": round(requests / dt, 2),
        "mean_batch_size": round(stats["mean_batch_size"], 2),
        "p50_ms": _r(stats["p50_ms"]),
        "p95_ms": _r(stats["p95_ms"]),
        # per-stage attribution (queue vs host decode vs device)
        "queue_wait_p95_ms": _r(stats["queue_wait_p95_ms"]),
        "dispatch_mean_ms": _r(stats["dispatch_mean_ms"]),
        "finish_mean_ms": _r(stats["finish_mean_ms"]),
        "preprocess_mean_ms": _r(stats["preprocess_mean_ms"]),
        "buckets": stats["buckets"],
    }))


def _run_phase(phase: str, timeout=1200):
    env = dict(os.environ)
    here = os.path.dirname(os.path.abspath(__file__))
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", phase],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=here,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"phase {phase} produced no JSON: {out.stdout[-500:]} {out.stderr[-500:]}")


def _tunnel_alive() -> bool:
    from efficientvlm_tpu.utils.tunnel import relay_alive

    return relay_alive()


def _wait_for_tunnel(max_wait_s=1800) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if _tunnel_alive():
            return True
        print(f"### TPU tunnel down ({int(time.time() - t0)}s); retrying...",
              file=sys.stderr)
        time.sleep(60)
    return False


def main():
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        {"teacher": phase_teacher, "student": phase_student,
         "pruned": phase_pruned, "pruned_int8": phase_pruned_int8,
         "rerank_teacher": phase_rerank_teacher,
         "rerank_pruned": phase_rerank_pruned,
         "vqa_teacher": phase_vqa_teacher,
         "pruned_vqa": phase_pruned_vqa,
         "caption_teacher": phase_caption_teacher,
         "pruned_caption": phase_pruned_caption,
         "serving": phase_serving}[phase]()
        return

    if not _wait_for_tunnel():
        # every phase would burn its full subprocess timeout; say why ONCE
        print(json.dumps({
            "metric": "pruned_retrieval_pairs_per_sec_per_chip",
            "value": None, "unit": "pairs/s", "vs_baseline": None,
            "error": "TPU tunnel (127.0.0.1:8083) unreachable for 30 min",
        }))
        return

    _empty = {"tput": None, "mfu": None, "tputs": None}
    teacher_d = _run_phase("teacher")
    student_d = _run_phase("student")
    pruned_d = _run_phase("pruned")
    teacher, student, pruned = teacher_d["tput"], student_d["tput"], pruned_d["tput"]
    int8_d = dict(_empty)
    try:
        int8_d = _run_phase("pruned_int8")
    except Exception as e:
        print(f"### int8 phase failed: {e}", file=sys.stderr)
    pruned_int8 = int8_d.get("tput")
    rerank_p = rerank_t = {}
    try:
        rerank_p = _run_phase("rerank_pruned")
        rerank_t = _run_phase("rerank_teacher")
    except Exception as e:
        print(f"### rerank phase failed: {e}", file=sys.stderr)
    vqa_d = vqa_teacher_d = dict(_empty)
    try:
        vqa_d = _run_phase("pruned_vqa", timeout=1500)
        vqa_teacher_d = _run_phase("vqa_teacher", timeout=1500)
    except Exception as e:
        print(f"### vqa phase failed: {e}", file=sys.stderr)
    pruned_vqa, vqa_teacher = vqa_d.get("tput"), vqa_teacher_d.get("tput")
    pruned_caption = caption_teacher = None
    try:
        pruned_caption = _run_phase("pruned_caption", timeout=1800).get("tput")
        caption_teacher = _run_phase("caption_teacher", timeout=1800).get("tput")
    except Exception as e:
        print(f"### caption phase failed: {e}", file=sys.stderr)
    serving = None
    try:
        serving = _run_phase("serving", timeout=1800)
    except Exception as e:
        print(f"### serving phase failed: {e}", file=sys.stderr)
    kd_ms = None
    try:
        # scripts/bench_kd_step.py subprocesses its two programs itself
        # (teacher fwd / student update compile separately — remote-compile
        # constraint); invoke it directly to avoid a third nesting level
        here = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ)
        env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, os.path.join(here, "scripts", "bench_kd_step.py")],
            capture_output=True, text=True, timeout=4200, env=env, cwd=here,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                kd_ms = json.loads(line).get("value")
                break
            except json.JSONDecodeError:
                continue
        if kd_ms is None:
            print(f"### kd_step produced no JSON; stdout tail: {out.stdout[-400:]} "
                  f"stderr tail: {out.stderr[-400:]}", file=sys.stderr)
    except Exception as e:
        # a null headline metric must be LOUD, not silent (round-2 lesson)
        print(f"### kd_step bench failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "pruned_retrieval_pairs_per_sec_per_chip",
        "value": round(pruned, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pruned / teacher, 3),
        "teacher_pairs_per_sec": round(teacher, 2),
        "student_dense_pairs_per_sec": round(student, 2),
        "pruned_sparsity": 0.25,
        "student_vs_teacher": round(student / teacher, 3),
        # MFU vs v5e bf16 197 / int8 394 peak TFLOPS (XLA cost analysis)
        "mfu_pruned": pruned_d.get("mfu"),
        "mfu_teacher": teacher_d.get("mfu"),
        "mfu_student": student_d.get("mfu"),
        "mfu_pruned_int8": int8_d.get("mfu"),
        "mfu_pruned_vqa": vqa_d.get("mfu"),
        "mfu_vqa_teacher": vqa_teacher_d.get("mfu"),
        "tflops_per_s_pruned": pruned_d.get("tflops_per_s"),
        "tflops_per_s_teacher": teacher_d.get("tflops_per_s"),
        "pruned_tputs_median_of": pruned_d.get("tputs"),
        "teacher_tputs_median_of": teacher_d.get("tputs"),
        "pruned_int8_pairs_per_sec": round(pruned_int8, 2) if pruned_int8 else None,
        "pruned_int8_vs_teacher": (
            round(pruned_int8 / teacher, 3) if pruned_int8 else None),
        # ITM k_test rerank chunk (grouped cross-K/V; eval hot loop)
        "rerank_pruned_pairs_per_sec": (
            round(rerank_p["rerank_tput"], 2) if rerank_p.get("rerank_tput") else None),
        "rerank_teacher_pairs_per_sec": (
            round(rerank_t["rerank_tput"], 2) if rerank_t.get("rerank_tput") else None),
        "rerank_pruned_vs_teacher": (
            round(rerank_p["rerank_tput"] / rerank_t["rerank_tput"], 3)
            if rerank_p.get("rerank_tput") and rerank_t.get("rerank_tput") else None),
        "rerank_mfu_pruned": rerank_p.get("rerank_mfu"),
        "kd_step_ms_b16_224px": kd_ms,
        "pruned_vqa_480_q_per_sec": round(pruned_vqa, 2) if pruned_vqa else None,
        "vqa_teacher_q_per_sec": round(vqa_teacher, 2) if vqa_teacher else None,
        "pruned_vqa_sparsity": 0.35,
        "pruned_vqa_vs_teacher": (
            round(pruned_vqa / vqa_teacher, 3) if pruned_vqa and vqa_teacher else None),
        "pruned_caption_img_per_sec": round(pruned_caption, 2) if pruned_caption else None,
        "caption_teacher_img_per_sec": round(caption_teacher, 2) if caption_teacher else None,
        "pruned_caption_vs_teacher": (
            round(pruned_caption / caption_teacher, 3) if pruned_caption and caption_teacher else None),
        "serving_caption_req_per_sec": serving.get("tput") if serving else None,
        "serving_mean_batch_size": serving.get("mean_batch_size") if serving else None,
        "serving_p95_ms": serving.get("p95_ms") if serving else None,
        "serving_stages": ({k: serving.get(k) for k in (
            "queue_wait_p95_ms", "dispatch_mean_ms", "finish_mean_ms",
            "preprocess_mean_ms", "buckets")} if serving else None),
    }))


if __name__ == "__main__":
    main()
