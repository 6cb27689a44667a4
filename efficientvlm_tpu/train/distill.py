"""Knowledge-distillation losses + teacher->student layer mapping.

Reproduces GeneralDistill.py:60-104 semantics:

- get_cor_teacher: hidden-state lists (len L+1) map teacher[i*block] with
  block=(T-1)/(S-1); attention lists (len L) map block ends
  teacher[i*block+block-1];
- kd_mse over matched lists; attention maps are scaled by their last dim
  (seq len) and filtered at <= -1e2 (vestigial on probs, kept for parity);
- image hidden KD drops the final entry (layer==6 skip, is_img path);
- soft_cross_entropy = KL(batchmean) between teacher probs and student
  log-probs.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def get_cor_teacher(teacher_reps: Sequence[Array], student_reps: Sequence[Array], *, is_attn: bool = False) -> List[Array]:
    t, s = len(teacher_reps), len(student_reps)
    if is_attn:
        assert t % s == 0, (t, s)
        block = t // s
        return [teacher_reps[i * block + block - 1] for i in range(s)]
    assert (t - 1) % (s - 1) == 0, (t, s)
    block = (t - 1) // (s - 1)
    return [teacher_reps[i * block] for i in range(s)]


def _mse(a: Array, b: Array) -> Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def kd_loss(
    student_reps: Sequence[Array],
    teacher_reps: Sequence[Array],
    *,
    is_attn: bool = False,
    is_img: bool = False,
) -> Array:
    total = 0.0
    for layer, (s, t) in enumerate(zip(student_reps, teacher_reps)):
        if is_attn:
            s = jnp.where(s <= -1e2, 0.0, s)
            t = jnp.where(t <= -1e2, 0.0, t)
            total = total + _mse(s, t) * s.shape[-1]
        elif is_img and layer == 6:
            # reference drops the 7th image hidden entry (GeneralDistill.py:73-76)
            continue
        else:
            total = total + _mse(s, t)
    return total


def kd_pair(student_out: dict, teacher_out: dict, *, hidden_key="hidden_states", attn_key="attentions", is_img=False):
    """(hidden_loss, attn_loss) for one matched encoder output pair."""
    t_hidden = get_cor_teacher([jax.lax.stop_gradient(x) for x in teacher_out[hidden_key]], student_out[hidden_key])
    t_attn = get_cor_teacher([jax.lax.stop_gradient(x) for x in teacher_out[attn_key]], student_out[attn_key], is_attn=True)
    h = kd_loss(student_out[hidden_key], t_hidden, is_img=is_img)
    a = kd_loss(student_out[attn_key], t_attn, is_attn=True)
    return h, a


def subset_taps(taps: Sequence[Array], n_student: int, *, is_attn: bool = False) -> list:
    """Pre-select the student-mapped teacher tap layers (get_cor_teacher's
    mapping) so a SPLIT teacher program only materializes the taps the
    student update will read — for a 12L->6L pair this halves the
    teacher-output tree (the [B,H,S,S] probs dominate its bytes).
    Composes with kd_list because get_cor_teacher over equal-length lists
    is the identity mapping."""
    want = n_student if is_attn else n_student + 1
    if len(taps) == want:
        return list(taps)
    return get_cor_teacher(list(taps), [None] * want, is_attn=is_attn)


def kd_list(student: Sequence[Array], teacher: Sequence[Array], *, is_attn=False, is_img=False) -> Array:
    t = get_cor_teacher([jax.lax.stop_gradient(x) for x in teacher], student, is_attn=is_attn)
    return kd_loss(student, t, is_attn=is_attn, is_img=is_img)


def soft_cross_entropy(predicts: Array, targets: Array) -> Array:
    """KLDivLoss(batchmean)(log_softmax(student), softmax(teacher))
    (GeneralDistill.py:84-89): sum over classes, mean over batch rows."""
    p = predicts.reshape(-1, predicts.shape[-1]).astype(jnp.float32)
    t = jax.lax.stop_gradient(targets.reshape(-1, targets.shape[-1]).astype(jnp.float32))
    student_logp = jax.nn.log_softmax(p, axis=-1)
    teacher_prob = jax.nn.softmax(t, axis=-1)
    teacher_logp = jnp.log(jnp.clip(teacher_prob, 1e-12))
    kl = (teacher_prob * (teacher_logp - student_logp)).sum(-1)
    return kl.mean()
