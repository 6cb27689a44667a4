"""Host-side prefetching: overlap PIL decode/augment with device compute.

The reference leans on torch DataLoader worker processes
(num_workers, dataset/__init__.py:179-204); here a thread pool decodes
ahead into a bounded queue while the jitted step runs on-device — with a
thread pool per loader plus the device-side preprocessing
(data/device_pipeline.py), the host stays off the critical path.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional


class Prefetcher:
    """Wraps any batch iterable; keeps up to `depth` ready batches."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, depth: int = 2):
        self.iterable = iterable
        self.depth = depth

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err: list = []

        def worker():
            try:
                for item in self.iterable:
                    q.put(item)
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


class ParallelMapLoader:
    """Map-style loader with a thread pool for __getitem__ (decode/augment)
    and ordered batch assembly — the threaded analogue of DataLoader
    num_workers without torch."""

    def __init__(self, loader, num_workers: int = 4, prefetch_depth: int = 2):
        self.loader = loader
        self.num_workers = num_workers
        self.prefetch_depth = prefetch_depth

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self) -> Iterator:
        base = self.loader

        def gen():
            from collections import deque

            idx = base._indices()
            end = len(idx) - (len(idx) % base.batch_size) if base.drop_last else len(idx)
            starts = list(range(0, end, base.batch_size))
            in_flight = self.num_workers + self.prefetch_depth
            with ThreadPoolExecutor(self.num_workers) as pool:
                pending: deque = deque()

                def submit(i):
                    chunk = [int(j) for j in idx[i : i + base.batch_size]]
                    return pool.submit(
                        lambda c: base.collate_fn([base.dataset[j] for j in c]), chunk
                    )

                it = iter(starts)
                for i in it:
                    pending.append(submit(i))
                    if len(pending) >= in_flight:
                        break
                for i in it:
                    yield pending.popleft().result()
                    pending.append(submit(i))
                while pending:
                    yield pending.popleft().result()

        return iter(gen())
