"""Profiling / timing harness (SURVEY §5.1 upgrade over the reference's
ad-hoc time.time() probes): jax.profiler trace capture + robust step timing
that survives the tunneled backend's non-blocking block_until_ready.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, Optional

import jax
import numpy as np


def force_sync(tree) -> None:
    """Device sync that actually waits: host-fetch one leaf (on the tunneled
    TPU backend block_until_ready returns early)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture around a block; view with tensorboard or
    xprof."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2, pipelined: bool = True) -> dict:
    """Times a jitted fn. pipelined=True measures device throughput
    (dispatch all, sync once); False measures latency per call."""
    for _ in range(warmup):
        out = fn(*args)
    force_sync(out)
    if pipelined:
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        force_sync(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        times = [dt] * iters
    else:
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            force_sync(out)
            times.append(time.perf_counter() - t0)
    return {
        "mean_s": float(np.mean(times)),
        "median_s": float(np.median(times)),
        "min_s": float(np.min(times)),
        "iters": iters,
        "pipelined": pipelined,
    }


def timed_runs(fn: Callable, args: tuple, *, iters: int = 10, runs: int = 3,
               warmups: int = 3) -> list:
    """Seconds-per-call for `runs` independent pipelined timing loops
    (each: dispatch `iters` back-to-back calls, host-fetch ONE sync at the
    end). THE timing recipe for this environment, shared by bench.py and the
    scripts/bench_*_probe.py family so a fix to the tunnel gotchas lands
    everywhere at once: >=3 warm calls (first 1-2 executions after compile
    pay 28-37s of lazy buffer upload), sync via force_sync (host fetch — on
    the tunneled backend block_until_ready returns early), median-of-runs
    (tunnel throughput varies ~10% run to run)."""
    out = None
    for _ in range(warmups):
        out = fn(*args)
    force_sync(out)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        force_sync(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    return ts


def median_time(fn: Callable, args: tuple, *, iters: int = 10, runs: int = 3,
                warmups: int = 3) -> float:
    """Median seconds per call over `timed_runs` (see there for the recipe)."""
    return float(np.median(timed_runs(fn, args, iters=iters, runs=runs,
                                      warmups=warmups)))


def flops_of(fn: Callable, *args) -> Optional[float]:
    """XLA cost-analysis FLOP estimate of a jitted fn."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        return float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:
        return None


def report(name: str, timing: dict, *, flops: Optional[float] = None, items: Optional[int] = None) -> dict:
    out = {"name": name, **timing}
    if flops:
        out["tflops_per_s"] = flops / timing["median_s"] / 1e12
    if items:
        out["items_per_s"] = items / timing["median_s"]
    print(json.dumps(out))
    return out
