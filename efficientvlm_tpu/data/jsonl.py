"""Sharded JSONL streaming reader.

Reproduces DistLineReadingDataset semantics (reference
dataset/dist_dataset.py:19-95): contiguous file-shard split first by
process rank, then by worker; optional file-level shuffle per epoch;
optional infinite repeat; broken lines skipped with a log instead of
killing training (pretrain_dataset.py:227-231).

Adds what the reference lacks: deterministic resume via (epoch, file_idx,
line_idx) cursors exposed in `state_dict()` / `load_state_dict()`.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator, List, Optional

import numpy as np


def split_shard(data: List[str], shard_idx: int, shard_size: int) -> List[str]:
    """Contiguous split (reference dist_dataset.py:89-95)."""
    num = len(data)
    if num < shard_size:
        raise RuntimeError(f"num:{num} < shard_size:{shard_size}")
    start_idx = (num * shard_idx) // shard_size
    end_idx = (num * (shard_idx + 1)) // shard_size
    return data[start_idx:end_idx]


def list_data_files(paths) -> List[str]:
    """Expand dirs/globs into a sorted file list (hdfs paths are treated as
    local mounts; the reference's hlist_files shells out to the hdfs CLI)."""
    if isinstance(paths, str):
        paths = [paths]
    files: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "*"))))
        elif os.path.isfile(p):
            files.append(p)
        else:
            files.extend(sorted(glob.glob(p)))
    return sorted(files)


class ShardedJsonlDataset:
    def __init__(
        self,
        data_paths,
        *,
        rank: int = 0,
        world_size: int = 1,
        num_workers: int = 1,
        worker_idx: int = 0,
        shuffle: bool = True,
        repeat: bool = False,
        seed: int = 42,
    ):
        self.files = list_data_files(data_paths)
        if not self.files:
            raise FileNotFoundError(f"no data files under {data_paths}")
        self.rank = rank
        self.world_size = world_size
        self.num_workers = num_workers
        self.worker_idx = worker_idx
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self.epoch = 0
        self._cursor = (0, 0)  # (file_idx_within_shard, line_idx)

    def shard_files(self, epoch: int) -> List[str]:
        files = list(self.files)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(files)
        files = split_shard(files, self.rank, self.world_size)
        if self.num_workers > 1:
            files = split_shard(files, self.worker_idx, self.num_workers)
        return files

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "cursor": list(self._cursor)}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = state["epoch"]
        self._cursor = tuple(state["cursor"])

    def __iter__(self) -> Iterator[dict]:
        while True:
            files = self.shard_files(self.epoch)
            start_file, start_line = self._cursor
            for fi in range(start_file, len(files)):
                with open(files[fi]) as f:
                    for li, line in enumerate(f):
                        if fi == start_file and li < start_line:
                            continue
                        self._cursor = (fi, li + 1)
                        try:
                            yield json.loads(line)
                        except Exception as e:  # skip broken lines
                            print(f"### skipping broken line in {files[fi]}: {e}")
                self._cursor = (fi + 1, 0)
            self.epoch += 1
            self._cursor = (0, 0)
            if not self.repeat:
                return
