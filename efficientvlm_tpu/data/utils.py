"""Data-side utilities: text normalization + cross-process result merging.

pre_question / pre_caption reproduce the reference normalization
(dataset/utils.py:17-57). collect_result reproduces the rank-sharded JSON
merge (dataset/utils.py:104-141) over jax.process_index/multihost barriers
instead of torch.distributed.
"""

from __future__ import annotations

import json
import os
import re
from typing import List, Optional


def pre_question(question: str, max_ques_words: int) -> str:
    question = re.sub(r"([,.'!?\"()*#:;~])", " ", question.lower())
    question = question.replace("-", " ").replace("/", " ")
    question = question.rstrip(" ")
    words = question.split(" ")
    if len(words) > max_ques_words:
        question = " ".join(words[:max_ques_words])
    return question


def pre_caption(caption: str, max_words: int) -> str:
    caption_raw = caption
    caption = re.sub(r"([,.'!?\"()*#:;~])", " ", caption.lower())
    caption = caption.replace("-", " ").replace("/", " ").replace("<person>", "person")
    caption = re.sub(r"\s{2,}", " ", caption)
    caption = caption.rstrip("\n").strip(" ")
    words = caption.split(" ")
    if len(words) > max_words:
        caption = " ".join(words[:max_words])
    if not caption:
        raise ValueError(f"pre_caption yields invalid text (raw: {caption_raw})")
    return caption


def write_jsonl(result: List[dict], path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for r in result:
            f.write(json.dumps(r) + "\n")


def read_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def _barrier():
    try:
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("collect_result")
    except Exception:
        pass


def collect_result(
    result: List[dict],
    filename: str,
    local_wdir: str,
    *,
    hdfs_wdir: str = "",
    rank: Optional[int] = None,
    world_size: Optional[int] = None,
    remove_duplicate: str = "",
    save_result: bool = False,
):
    """Per-rank jsonl dump -> barrier -> rank-0 merge. Returns merged list
    (or final file path when save_result).

    hdfs_wdir (reference --output_hdfs, dataset/utils.py collect_result):
    multi-host runs WITHOUT a shared filesystem publish per-rank files
    through hdfs://-style storage; rank 0 pulls every rank's file back
    before merging, and the merged result is uploaded too."""
    import jax

    from ..utils.io import hcopy

    rank = rank if rank is not None else jax.process_index()
    world_size = world_size if world_size is not None else jax.process_count()
    rank_file = os.path.join(local_wdir, f"{filename}_rank{rank}.json")
    write_jsonl(result, rank_file)
    if hdfs_wdir:
        hcopy(rank_file, f"{hdfs_wdir.rstrip('/')}/{filename}_rank{rank}.json")
    _barrier()

    if rank != 0:
        _barrier()
        return None

    merged: List[dict] = []
    for r in range(world_size):
        path = os.path.join(local_wdir, f"{filename}_rank{r}.json")
        if hdfs_wdir and r != rank:
            hcopy(f"{hdfs_wdir.rstrip('/')}/{filename}_rank{r}.json", path)
        merged += read_jsonl(path)
    if remove_duplicate:
        seen, dedup = set(), []
        for res in merged:
            if res[remove_duplicate] not in seen:
                seen.add(res[remove_duplicate])
                dedup.append(res)
        merged = dedup
    out = merged
    if save_result:
        final = os.path.join(local_wdir, f"{filename}.json")
        with open(final, "w") as f:
            json.dump(merged, f, ensure_ascii=False, indent=4)
        if hdfs_wdir:
            hcopy(final, f"{hdfs_wdir.rstrip('/')}/{filename}.json")
        out = final
    _barrier()
    return out


def collect_tensor_result(result, filename: str, local_wdir: str, *, rank=None, world_size=None):
    """Per-rank array dump -> barrier -> rank-0 merge (reference
    dataset/utils.py:143-164, torch.save replaced with npz)."""
    import jax
    import numpy as np

    rank = rank if rank is not None else jax.process_index()
    world_size = world_size if world_size is not None else jax.process_count()
    os.makedirs(local_wdir, exist_ok=True)
    np.savez(os.path.join(local_wdir, f"{filename}_rank{rank}.npz"),
             *[np.asarray(r) for r in result])
    _barrier()
    if rank != 0:
        _barrier()
        return None
    merged = []
    for r in range(world_size):
        with np.load(os.path.join(local_wdir, f"{filename}_rank{r}.npz")) as z:
            merged.extend(z[k] for k in z.files)
    _barrier()
    return merged
