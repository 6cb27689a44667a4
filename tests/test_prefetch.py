"""Prefetcher / parallel loader tests."""

import numpy as np

from efficientvlm_tpu.data.datasets import SimpleLoader
from efficientvlm_tpu.data.prefetch import ParallelMapLoader, Prefetcher


class _SquareDataset:
    def __len__(self):
        return 20

    def __getitem__(self, i):
        return np.full((2,), i, np.int64)


def test_prefetcher_order_and_error():
    out = list(Prefetcher(iter(range(10)), depth=3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    import pytest

    with pytest.raises(ValueError):
        list(Prefetcher(boom(), depth=2))


def test_parallel_loader_matches_serial():
    ds = _SquareDataset()
    serial = SimpleLoader(ds, batch_size=4, shuffle=True, seed=7)
    parallel = ParallelMapLoader(SimpleLoader(ds, batch_size=4, shuffle=True, seed=7), num_workers=3)
    serial.set_epoch(1)
    parallel.set_epoch(1)
    a = [np.asarray(b) for b in serial]
    b = [np.asarray(b) for b in parallel]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
