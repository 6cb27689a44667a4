"""Dynamic request batching for online serving.

TPU inference throughput comes from batch work on the MXU: one image at
batch 1 wastes most of the chip, and XLA recompiles per batch shape. The
batcher coalesces concurrent single requests into batches (up to
max_batch_size, waiting at most max_wait_ms after the first arrival) on ONE
worker thread — all device work stays single-threaded, only host-side
decode runs on the request threads — and `pad_to_bucket` quantizes batch
sizes to powers of two so the jitted program compiles a handful of shapes,
not one per batch size.

No reference counterpart (the reference ships no serving path); this backs
scripts/serve.py.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Sequence


def pad_to_bucket(n: int, max_batch_size: int) -> int:
    """Smallest power of two >= n, capped at max_batch_size. Static bucket
    shapes keep the number of jit specializations at log2(max_batch)."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch_size)


def pad_items(items: Sequence, bucket: int) -> list:
    """Pad a request list to the bucket size by repeating the last item
    (real compute on dummy rows is cheaper than a fresh compile)."""
    items = list(items)
    if len(items) < bucket:
        items = items + [items[-1]] * (bucket - len(items))
    return items


class DynamicBatcher:
    """submit(item) -> Future; a single worker drains the queue into
    batches and calls run_batch(items) -> results (one per item, same
    order). Exceptions from run_batch propagate to every Future of that
    batch. Thread-safe; close() stops the worker and fails every still-
    queued Future with RuntimeError("batcher closed") so no caller blocks
    out its full result timeout."""

    def __init__(
        self,
        run_batch: Callable[[List], List],
        *,
        max_batch_size: int = 16,
        max_wait_ms: float = 10.0,
        name: str = "batcher",
    ):
        self._run = run_batch
        self.max_batch_size = int(max_batch_size)
        self.max_wait_ms = float(max_wait_ms)
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.requests = 0
        self.batches = 0
        self.batched_requests = 0  # requests that shared a batch with others
        # bounded: long-lived servers must not accumulate one float per
        # request forever; percentiles only ever read the tail anyway
        from collections import deque

        self.latencies_ms = deque(maxlen=2000)
        self._thread = threading.Thread(target=self._loop, daemon=True, name=name)
        self._thread.start()

    def submit(self, item) -> Future:
        if self._stop.is_set():
            raise RuntimeError("batcher is closed")
        fut: Future = Future()
        self._q.put((item, fut, time.monotonic()))
        return fut

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(list(self.latencies_ms)[-1000:])
            return {
                "requests": self.requests,
                "batches": self.batches,
                "mean_batch_size": (self.requests / self.batches) if self.batches else 0.0,
                "batched_requests": self.batched_requests,
                "p50_ms": lat[len(lat) // 2] if lat else None,
                "p95_ms": lat[int(len(lat) * 0.95)] if lat else None,
            }

    def reset_stats(self) -> None:
        """Zero the counters (benches call this after warmup so compile
        waits don't pollute the latency percentiles)."""
        with self._lock:
            self.requests = self.batches = self.batched_requests = 0
            self.latencies_ms.clear()

    def _drain_failed(self) -> None:
        while True:
            try:
                _, fut, _ = self._q.get_nowait()
            except queue.Empty:
                return
            if not fut.done():
                fut.set_exception(RuntimeError("batcher closed"))

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        # backstop for the submit()/close() race: anything enqueued after
        # the worker's own exit drain still gets failed here
        self._drain_failed()

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_ms / 1e3
            while len(batch) < self.max_batch_size:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            items = [b[0] for b in batch]
            try:
                outs = self._run(items)
                if len(outs) != len(items):
                    raise RuntimeError(
                        f"run_batch returned {len(outs)} results for {len(items)} items")
                for (_, fut, _), out in zip(batch, outs):
                    fut.set_result(out)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for _, fut, _ in batch:
                    if not fut.done():
                        fut.set_exception(e)
            now = time.monotonic()
            with self._lock:
                self.requests += len(batch)
                self.batches += 1
                if len(batch) > 1:
                    self.batched_requests += len(batch)
                self.latencies_ms.extend((now - t0) * 1e3 for _, _, t0 in batch)
        self._drain_failed()  # stop requested: fail anything still queued
