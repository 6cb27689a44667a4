"""KD train-step time on real hardware (BASELINE's 'KD step time' metric):
one stage-2 retrieval pruning step = teacher forward + (student fwd w/
stochastic gates + full KD menu + Lagrangian + 3 optimizer updates), at
224px batch 16.

The remote compile helper CRASHES (broken pipe) when one process compiles
both large programs back-to-back (cumulative helper memory — CLAUDE.md), so
the two programs are timed in SEPARATE processes and the step time is their
sum (they execute back-to-back inside make_split_retrieval_train_step in
production):

  python scripts/bench_kd_step.py                 # parent: runs both phases
  python scripts/bench_kd_step.py --phase teacher_fwd [batch]
  python scripts/bench_kd_step.py --phase student_update [batch]

The student_update phase builds the teacher-output pytree with
jax.eval_shape (trace only, no teacher compile) and feeds zeros of the
right shapes — timing is shape-dependent, not value-dependent.
Prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def _models(batch, image_res, *, need_student=True, need_teacher_params=True):
    import jax
    import jax.numpy as jnp

    from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
    from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
    from efficientvlm_tpu.pruning.l0_module import XVLML0Module
    from efficientvlm_tpu.train.optim import (
        create_l0_optimizer,
        create_lagrangian_optimizer,
        create_optimizer,
    )
    from efficientvlm_tpu.train.steps import init_train_state

    vcfg_s = VisionConfig.create(num_hidden_layers=6, image_res=image_res, scan_layers=True)
    tcfg_s = TextConfig.create(num_hidden_layers=6, fusion_layer=3, encoder_width=768,
                               hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                               scan_layers=True)
    vcfg_t = VisionConfig.create(num_hidden_layers=12, image_res=image_res, scan_layers=True)
    tcfg_t = TextConfig.create(num_hidden_layers=12, fusion_layer=6, encoder_width=768,
                               hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                               scan_layers=True)
    student = XVLMForRetrieval(vcfg_s, tcfg_s, Config({"embed_dim": 256}))
    teacher = XVLMForRetrieval(vcfg_t, tcfg_t, Config({"embed_dim": 256}))
    # build only what the phase uses — every jitted init is a separate
    # (slow) remote compile and the helper dies on too many per process
    tparams = teacher.init(jax.random.PRNGKey(1)) if need_teacher_params else None
    opts = state = None
    if need_student:
        sparams = student.init(jax.random.PRNGKey(0))
        l0 = XVLML0Module(vision_layers=6, text_layers=3, cross_layers=3,
                          target_sparsity=0.25, lagrangian_warmup=100)
        l0_params = l0.init(jax.random.PRNGKey(2))
        opts = (
            create_optimizer(sparams, lr=3e-5, weight_decay=0.01, grad_clip=1.0),
            create_l0_optimizer(reg_lr=0.01),
            create_lagrangian_optimizer(reg_lr=0.01),
        )
        state = init_train_state(sparams, l0_params, opts)
    else:
        l0 = XVLML0Module(vision_layers=6, text_layers=3, cross_layers=3,
                          target_sparsity=0.25, lagrangian_warmup=100)
    batch_data = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (batch, image_res, image_res, 3), jnp.bfloat16),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (batch, 40), 0, 30522),
        "text_atts": jnp.ones((batch, 40), jnp.int32),
        "idx": jnp.arange(batch),
    }
    return student, teacher, tparams, l0, opts, state, batch_data


def _teacher_fwd_fn(teacher, impl="xla", probs=True):
    """teacher params are an ARGUMENT of the jitted fn — closed-over arrays
    inline into the lowered module as constants (~800MB of HLO for the 12L
    teacher), which the remote compile service rejects (HTTP 413).

    impl: 'xla' by default for the BENCH artifact — the fused+probs teacher
    program is faster steady-state but its 24-layer Mosaic compile blows the
    tunnel's compile budget on this host (measured >2000s cold); pass
    --impl fused to experiment when the helper is quiet.

    probs=False is the ablation arm (--phase ablate): same forward without
    the attention-map taps, isolating what emitting [B,H,T,T] f32 probs
    costs each impl (XLA DCEs the 6 untapped teacher layers' probs; the
    fused kernel is opaque and writes all 12)."""
    import jax
    import jax.numpy as jnp

    from efficientvlm_tpu.train.steps import subset_teacher_taps

    def teacher_fwd(tparams, batch, rng):
        out = teacher.forward(
            jax.lax.stop_gradient(tparams),
            batch["image"], batch["text_ids"], batch["text_atts"],
            idx=batch.get("idx"), zs=None, rng=rng,
            output_attentions=probs, output_hidden_states=True,
            train=False, dtype=jnp.bfloat16, impl=impl,
        )
        if not probs:
            for k in ("attention_dict", "cross_attention_dict"):
                out.pop(k, None)
        # only the student-mapped tap layers leave the program (the 6L
        # student reads every other 12L teacher layer; emitting all of them
        # would double the tap IO and the teacher-output tree)
        return jax.tree.map(jax.lax.stop_gradient, subset_teacher_taps(
            out, vision_layers=6, text_fusion=3, cross_layers=3,
        ))

    return teacher_fwd


def phase_teacher_fwd(batch=16, image_res=224, iters=8, impl="xla", probs=True):
    import jax
    import numpy as np

    _, teacher, tparams, _, _, _, batch_data = _models(batch, image_res, need_student=False)
    # AOT compile so XLA cost analysis supplies the program's FLOPs — the
    # official bench derives kd_step_mfu from the two split programs
    fwd = jax.jit(_teacher_fwd_fn(teacher, impl=impl, probs=probs)).lower(
        tparams, batch_data, jax.random.PRNGKey(5)).compile()
    try:
        flops = float(fwd.cost_analysis().get("flops", 0.0))
    except Exception:
        flops = 0.0
    for w in range(2):
        out = fwd(tparams, batch_data, jax.random.PRNGKey(5 + w))
        np.asarray(out["logits_dict"]["itm_head_logits"])  # host-fetch sync
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(tparams, batch_data, jax.random.PRNGKey(6 + i))
    np.asarray(out["logits_dict"]["itm_head_logits"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"phase": "teacher_fwd", "ms": round(dt * 1e3, 2),
                      "flops": flops, "impl": impl, "probs": probs}))


def phase_student_update(batch=16, image_res=224, iters=8, impl="xla"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientvlm_tpu.train.steps import TrainState, apply_updates_3way, retrieval_kd_losses

    student, teacher, _, l0, opts, state, batch_data = _models(
        batch, image_res, need_teacher_params=False)
    # shapes only — no teacher params/compile in this process
    t_abstract = jax.eval_shape(lambda k: teacher.init(k), jax.random.PRNGKey(1))
    tz = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t_abstract)
    teacher_fwd = _teacher_fwd_fn(teacher)
    t_shapes = jax.eval_shape(teacher_fwd, tz, batch_data, jax.random.PRNGKey(5))
    teacher_outputs = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t_shapes)

    def loss_fn(params, loga, lam, batch, t_out, rng, step):
        zrng, srng = jax.random.split(rng)
        zs = l0.forward_train({"loga": loga}, zrng)
        s_out = student.forward(
            params, batch["image"], batch["text_ids"], batch["text_atts"],
            idx=batch.get("idx"), zs=zs, rng=srng,
            output_attentions=True, output_hidden_states=True,
            train=True, dtype=jnp.bfloat16, impl=impl,
        )
        kd = retrieval_kd_losses(s_out, t_out)
        lag, _, _ = l0.lagrangian_regularization({"loga": loga, **lam}, step)
        loss = (kd["loss_kd"] + s_out["loss"]["loss_itc"] + s_out["loss"]["loss_itm"]) * 0.5 + lag
        return loss, loss

    def _student_update(state: TrainState, batch, t_out, rng):
        (_, loss), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, state.loga, state.lam, batch, t_out, rng, state.step
        )
        return apply_updates_3way(state, grads, opts), loss

    # AOT compile: cost analysis gives the fwd+bwd+update FLOPs for the
    # official kd_step_mfu
    student_update = jax.jit(_student_update).lower(
        state, batch_data, teacher_outputs, jax.random.PRNGKey(7)).compile()
    try:
        flops = float(student_update.cost_analysis().get("flops", 0.0))
    except Exception:
        flops = 0.0

    # 3 warmup calls: the first iterations also pay the lazy upload of the
    # ~0.6GB teacher-output tree + param state through the tunnel (measured
    # 28s/37s before settling at ~72ms)
    for w in range(3):
        state, loss = student_update(state, batch_data, teacher_outputs, jax.random.PRNGKey(7 + w))
        np.asarray(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = student_update(state, batch_data, teacher_outputs, jax.random.PRNGKey(20 + i))
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"phase": "student_update", "ms": round(dt * 1e3, 2),
                      "flops": flops}))


def main(batch=16, image_res=224, impl="xla"):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    total = {}
    for phase in ("teacher_fwd", "student_update"):
        # cold remote compiles have been observed anywhere from ~3 to >14
        # minutes depending on tunnel/helper load — budget generously; warm
        # runs hit the persistent compile cache and finish in ~1 min
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase,
             str(batch), "--impl", impl],
            capture_output=True, text=True, timeout=2000, env=env, cwd=here,
        )
        got = None
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                got = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if got is None:
            raise RuntimeError(f"{phase}: {out.stdout[-300:]} {out.stderr[-300:]}")
        total[phase] = got
    ms = total["teacher_fwd"]["ms"] + total["student_update"]["ms"]
    flops = total["teacher_fwd"].get("flops", 0) + total["student_update"].get("flops", 0)
    # v5e bf16 peak 197 TFLOP/s (same constant as bench.py PEAK_TFLOPS)
    mfu = flops / (ms / 1e3) / 197e12 if flops else None
    print(json.dumps({
        "metric": "kd_train_step_time",
        "value": round(ms, 2),
        "unit": "ms",
        "batch": batch,
        "image_res": image_res,
        "impl": impl,
        "teacher_fwd_ms": total["teacher_fwd"]["ms"],
        "student_update_ms": total["student_update"]["ms"],
        "teacher_fwd_mfu": (round(total["teacher_fwd"]["flops"]
                            / (total["teacher_fwd"]["ms"] / 1e3) / 197e12, 4)
                            if total["teacher_fwd"].get("flops") else None),
        "student_update_mfu": (round(total["student_update"]["flops"]
                               / (total["student_update"]["ms"] / 1e3) / 197e12, 4)
                               if total["student_update"].get("flops") else None),
        "mfu": round(mfu, 4) if mfu else None,
        "pairs_per_sec": round(batch / (ms / 1e3), 1),
    }))


def ablate(batch=16):
    """VERDICT r4 decomposition: teacher fwd at KD shapes (b16/224px) across
    (impl in xla,fused) x (attention-probs taps on,off), each in its own
    process (the compile helper dies on back-to-back large compiles).
    Answers 'why does the fused kernel not pay at KD shapes': XLA DCEs the
    6 untapped teacher layers' probs stores while the opaque fused kernel
    emits all 12, and the remaining attention time at T=197 is too small a
    slice for fusion to beat XLA's own elementwise fusion."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    grid = [("xla", True), ("xla", False), ("fused", True), ("fused", False)]
    results = {}
    for impl, probs in grid:
        cmd = [sys.executable, os.path.abspath(__file__), "--phase",
               "teacher_fwd", str(batch), "--impl", impl]
        if not probs:
            cmd.append("--no_probs")
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=2400, env=env, cwd=here)
        got = None
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                got = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        key = f"{impl}_{'probs' if probs else 'noprobs'}"
        results[key] = got["ms"] if got else None
        print(f"### {key}: {results[key]} ms", file=sys.stderr)
    print(json.dumps({"metric": "kd_teacher_fwd_ablation_ms",
                      "batch": batch, "image_res": 224, **results}))


if __name__ == "__main__":
    impl = "xla"
    probs = True
    if "--impl" in sys.argv:
        i = sys.argv.index("--impl")
        impl = sys.argv[i + 1]
        del sys.argv[i:i + 2]
    if "--no_probs" in sys.argv:
        probs = False
        sys.argv.remove("--no_probs")
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        b = int(sys.argv[sys.argv.index("--phase") + 2]) if len(sys.argv) > sys.argv.index("--phase") + 2 else 16
        if phase == "ablate":
            ablate(batch=b)
        elif phase == "teacher_fwd":
            phase_teacher_fwd(batch=b, impl=impl, probs=probs)
        else:
            phase_student_update(batch=b, impl=impl)
    else:
        main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 16, impl=impl)
