"""Host-side prefetching: overlap PIL decode/augment with device compute.

The reference leans on torch DataLoader worker processes
(num_workers, dataset/__init__.py:179-204); here ProcessMapLoader forks a
worker-process pool that builds whole batches ahead of the jitted step —
measured on this machine the GIL makes a THREAD pool decode ~4x SLOWER at
8 workers than single-threaded (numpy RandAugment holds the GIL), while
forked processes scale; scripts/bench_input_pipeline.py records both.
ParallelMapLoader (threads) remains for cheap transforms and test configs.
"""

from __future__ import annotations

import multiprocessing as mp
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


# -- process-pool loader ------------------------------------------------------

_WORKER_DS = None
_WORKER_COLLATE = None


def _pml_init(dataset, collate_fn):
    global _WORKER_DS, _WORKER_COLLATE
    _WORKER_DS = dataset
    _WORKER_COLLATE = collate_fn


def _pml_batch(args):
    chunk, reseed = args
    if reseed is not None and hasattr(_WORKER_DS, "transform"):
        # decorrelate augmentation streams across forked workers (each fork
        # inherits the same rng state) while staying deterministic per batch
        import numpy as _np

        rng_holder = getattr(_WORKER_DS.transform, "rng", None)
        if rng_holder is not None:
            _WORKER_DS.transform.rng = _np.random.default_rng(reseed)
            if getattr(_WORKER_DS.transform, "randaug", None) is not None:
                _WORKER_DS.transform.randaug.rng = _WORKER_DS.transform.rng
    return _WORKER_COLLATE([_WORKER_DS[j] for j in chunk])


class ProcessMapLoader:
    """Map-style loader with a forked worker-process pool building whole
    batches (the true analogue of torch DataLoader num_workers): decode and
    numpy augmentation run WITHOUT the parent's GIL, so throughput scales
    with workers. Batches come back in order via pickled numpy arrays."""

    def __init__(self, loader, num_workers: int = 4, prefetch_depth: int = 2, seed: int = 42):
        self.loader = loader
        self.num_workers = num_workers
        self.prefetch_depth = prefetch_depth
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
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
            ctx = mp.get_context("fork")
            with ctx.Pool(self.num_workers, initializer=_pml_init,
                          initargs=(base.dataset, base.collate_fn)) as pool:
                pending: deque = deque()

                def submit(i):
                    chunk = [int(j) for j in idx[i : i + base.batch_size]]
                    reseed = (self.seed, self._epoch, i)
                    return pool.apply_async(_pml_batch, ((chunk, reseed),))

                it = iter(starts)
                for i in it:
                    pending.append(submit(i))
                    if len(pending) >= in_flight:
                        break
                for i in it:
                    yield pending.popleft().get()
                    pending.append(submit(i))
                while pending:
                    yield pending.popleft().get()

        return iter(gen())
