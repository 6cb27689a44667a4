"""int8 matmul diagnosis on the real chip (VERDICT r3 #2).

BENCH_r03 measured w8a8 ~1.9x SLOWER than bf16. Hypotheses:
  (a) the s8 x s8 -> s32 dot does not lower to the MXU int8 path (XLA
      converts operands to float) — then all quant overhead is pure loss;
  (b) the dynamic per-token activation quant (f32 abs-max/round/clip per
      dense call) costs more than the 2x MXU rate saves;
  (c) both.

This probe times, at retrieval-eval shapes ([rows, d] x [d, d]):
  bf16          — baseline dot
  s8_raw        — pre-quantized operands, dot only (MXU upper bound)
  w8a8_dyn_f32  — current ops.quant path (f32 quant pipeline)
  w8a8_dyn_bf16 — same but the quant pipeline stays in bf16
  w8a8_static   — static activation scale (no runtime abs-max)
  w8            — weight-only int8, dequant into a bf16 dot
and prints the compiled HLO around each dot so the lowering is visible.

  PYTHONPATH=.:/root/.axon_site python scripts/bench_int8_probe.py [--d 768]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


N_CHAIN = 64  # dots chained inside one jit (defeats dispatch/fetch noise)


def force_sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def timeit(fn, *args, iters=10, warmup=3):
    """Every case returns a SCALAR (fetch ~8 bytes, not the matrix) and
    chains N_CHAIN dependent dots on-device, so tunnel dispatch/download
    overhead is amortized to noise. Reported ms is per single dot. Timing
    core shared with bench.py (train/profiler.py median_time)."""
    from efficientvlm_tpu.train.profiler import median_time

    return median_time(fn, args, iters=iters, warmups=warmup) / N_CHAIN * 1e3


def dot_lines(compiled_text, n=6):
    """Grep the compiled HLO for dot/convolution lines (lowering evidence)."""
    pat = re.compile(r".*(dot|convolution)\(.*")
    return [ln.strip()[:160] for ln in compiled_text.splitlines() if pat.match(ln)][:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--rows", type=int, default=16 * 577)  # b16 x 384px tokens
    args = ap.parse_args()
    d, rows = args.d, args.rows

    rng = np.random.RandomState(0)
    x_bf16 = jnp.asarray(rng.randn(rows, d), jnp.bfloat16)
    w_bf16 = jnp.asarray(rng.randn(d, d), jnp.bfloat16)
    xq = jnp.asarray(rng.randint(-127, 128, (rows, d)), jnp.int8)
    wq = jnp.asarray(rng.randint(-127, 128, (d, d)), jnp.int8)
    w_scale = jnp.asarray(rng.rand(d) + 0.5, jnp.float32) / 127.0

    def _chain(step, x0):
        """Chain N_CHAIN dependent steps on-device; return a scalar."""
        x = jax.lax.fori_loop(0, N_CHAIN, lambda i, x: step(x), x0)
        return jnp.sum(x.astype(jnp.float32))

    def f_bf16(x, w):
        return _chain(lambda x: (x @ w) * jnp.bfloat16(0.036), x)

    def f_s8_raw(xq, wq):
        def step(xq):
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc & 127).astype(jnp.int8)

        return _chain(step, xq)

    def f_w8a8_dyn_f32(x, wq, ws):
        def step(x):
            x2 = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
            xs = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * xs * ws[None, :]
                    ).astype(jnp.bfloat16) * jnp.bfloat16(0.036)

        return _chain(step, x)

    def f_w8a8_dyn_bf16(x, wq, ws):
        def step(x):
            amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.bfloat16)
            xs = jnp.maximum(amax, 1e-6) / 127.0
            xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * xs.astype(jnp.float32)
                    * ws[None, :]).astype(jnp.bfloat16) * jnp.bfloat16(0.036)

        return _chain(step, x)

    def f_w8a8_static(x, wq, ws):
        def step(x):
            xs = jnp.bfloat16(4.0 / 127.0)  # calibrated constant
            xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (4.0 / 127.0) * ws[None, :]
                    ).astype(jnp.bfloat16) * jnp.bfloat16(0.036)

        return _chain(step, x)

    def f_w8(x, wq, ws):
        # NOTE: with one loop-invariant weight the dequant hoists out of the
        # chain, so this measures the bf16 dot only — w8's real win (int8
        # HBM weight streaming) shows up in end-to-end decode, not here.
        def step(x):
            w = wq.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16)[None, :]
            return (x @ w) * jnp.bfloat16(0.036)

        return _chain(step, x)

    cases = [
        ("bf16", f_bf16, (x_bf16, w_bf16)),
        ("s8_raw", f_s8_raw, (xq, wq)),
        ("w8a8_dyn_f32", f_w8a8_dyn_f32, (x_bf16, wq, w_scale)),
        ("w8a8_dyn_bf16", f_w8a8_dyn_bf16, (x_bf16, wq, w_scale)),
        ("w8a8_static", f_w8a8_static, (x_bf16, wq, w_scale)),
        ("w8", f_w8, (x_bf16, wq, w_scale)),
    ]
    flops = 2 * rows * d * d
    report = {"rows": rows, "d": d, "platform": jax.devices()[0].platform}
    for name, fn, fargs in cases:
        jf = jax.jit(fn)
        compiled = jf.lower(*fargs).compile()
        ms = timeit(jf, *fargs)
        report[name] = {"ms": round(ms, 4),
                        "tflops_per_s": round(flops / (ms / 1e3) / 1e12, 2)}
        print(f"--- {name}: {ms:.4f} ms  "
              f"({report[name]['tflops_per_s']} TFLOP/s)", file=sys.stderr)
        for ln in dot_lines(compiled.as_text()):
            print("   ", ln, file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
