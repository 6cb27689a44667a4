"""Jitted train steps: student fwd + teacher fwd + KD + Lagrangian + all
three optimizer updates in ONE compiled program, data-parallel over the mesh.

This is the TPU-native redesign of the reference's per-step Python
orchestration (Eff_Retrieval.py:75-213: separate forward calls, loss.backward,
three .step()/.zero_grad() calls, host-side constrain_parameters) — here the
whole thing traces into a single XLA program; gradient reductions across the
data axis are emitted by the compiler.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..pruning.l0_module import L0Module
from . import distill as D

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    loga: Any
    lam: Any
    opt_state: Any
    l0_state: Any
    lam_state: Any
    step: Array


def init_train_state(params, l0_params, optimizers) -> TrainState:
    opt, l0_opt, lam_opt = optimizers
    lam = {"lambda_1": l0_params["lambda_1"], "lambda_2": l0_params["lambda_2"]}
    return TrainState(
        params=params,
        loga=l0_params["loga"],
        lam=lam,
        opt_state=opt.init(params),
        l0_state=l0_opt.init(l0_params["loga"]),
        lam_state=lam_opt.init(lam),
        step=jnp.array(0, jnp.int32),
    )


def apply_updates_3way(state: TrainState, grads, optimizers) -> TrainState:
    """Apply the main/L0/Lagrangian updates + loga clamp (the in-graph
    equivalent of constrain_parameters, Eff_Retrieval.py:182-196)."""
    opt, l0_opt, lam_opt = optimizers
    gp, gl, glam = grads
    u, opt_state = opt.update(gp, state.opt_state, state.params)
    params = optax.apply_updates(state.params, u)
    u, l0_state = l0_opt.update(gl, state.l0_state, state.loga)
    loga = optax.apply_updates(state.loga, u)
    loga = jax.tree.map(lambda v: jnp.clip(v, np.log(1e-2), np.log(1e2)), loga)
    u, lam_state = lam_opt.update(glam, state.lam_state, state.lam)
    lam = optax.apply_updates(state.lam, u)
    return TrainState(params, loga, lam, opt_state, l0_state, lam_state, state.step + 1)


def retrieval_kd_losses(student_outputs: dict, teacher_outputs: dict, *, temperature: float = 1.0) -> dict:
    """KD loss menu of Eff_Retrieval.py:113-170 (weights 0.2/0.5/0.33)."""
    sh, th = student_outputs["hidden_dict"], teacher_outputs["hidden_dict"]
    sa, ta = student_outputs["attention_dict"], teacher_outputs["attention_dict"]
    sc, tc = student_outputs["cross_attention_dict"], teacher_outputs["cross_attention_dict"]
    sl, tl = student_outputs["logits_dict"], teacher_outputs["logits_dict"]

    text_h = D.kd_list(sh["text_hidden_states"], th["text_hidden_states"])
    text_a = D.kd_list(sa["text_attentions"], ta["text_attentions"], is_attn=True)
    img_h = D.kd_list(sh["image_hidden_states"], th["image_hidden_states"], is_img=True)
    img_a = D.kd_list(sa["image_attentions"], ta["image_attentions"], is_attn=True)
    pos_h = D.kd_list(sh["itm_pos_hidden_states"], th["itm_pos_hidden_states"])
    neg_h = D.kd_list(sh["itm_neg_hidden_states"], th["itm_neg_hidden_states"])
    pos_a = D.kd_list(sa["itm_pos_attentions"], ta["itm_pos_attentions"], is_attn=True)
    neg_a = D.kd_list(sa["itm_neg_attentions"], ta["itm_neg_attentions"], is_attn=True)
    pos_x = D.kd_list(sc["itm_pos_cross_attentions"], tc["itm_pos_cross_attentions"], is_attn=True)
    neg_x = D.kd_list(sc["itm_neg_cross_attentions"], tc["itm_neg_cross_attentions"], is_attn=True)
    itm_logits = D.soft_cross_entropy(
        sl["itm_head_logits"] / temperature, tl["itm_head_logits"] / temperature
    )

    loss_text_kd = text_h + text_a
    loss_img_kd = 0.2 * img_h + img_a
    loss_cross_kd = (neg_h + pos_h + pos_a + pos_x + neg_a + neg_x) * 0.5
    loss_kd = itm_logits + (loss_text_kd + loss_img_kd + loss_cross_kd) * 0.33
    return {
        "loss_kd": loss_kd,
        "loss_text_kd": loss_text_kd,
        "loss_img_kd": loss_img_kd,
        "loss_cross_kd": loss_cross_kd,
        "loss_itm_logits_kd": itm_logits,
    }


def clamp_temp(params):
    """reference models/model_pretrain.py:37: temp.clamp_(0.001, 0.5)."""
    if "temp" in params:
        params = dict(params)
        params["temp"] = jnp.clip(params["temp"], 0.001, 0.5)
    return params


def gd_kd_losses(student_outputs: dict, teacher_outputs: dict, *, temperature: float = 1.0) -> dict:
    """General-distillation KD menu (GeneralDistill.py:193-260): hidden +
    attention KD for text/image/itm-pos/itm-neg/mlm taps, soft-CE on ITM and
    MLM logits; image hidden weighted 0.1, image hidden entry 6 dropped."""
    sh, th = student_outputs["hidden_dict"], teacher_outputs["hidden_dict"]
    sa, ta = student_outputs["attention_dict"], teacher_outputs["attention_dict"]
    sl, tl = student_outputs["logits_dict"], teacher_outputs["logits_dict"]

    text_h = D.kd_list(sh["text_hidden_states"], th["text_hidden_states"])
    text_a = D.kd_list(sa["text_attentions"], ta["text_attentions"], is_attn=True)
    img_h = D.kd_list(sh["image_hidden_states"], th["image_hidden_states"], is_img=True)
    img_a = D.kd_list(sa["image_attentions"], ta["image_attentions"], is_attn=True)
    pos_h = D.kd_list(sh["itm_pos_hidden_states"], th["itm_pos_hidden_states"])
    pos_a = D.kd_list(sa["itm_pos_attentions"], ta["itm_pos_attentions"], is_attn=True)
    neg_h = D.kd_list(sh["itm_neg_hidden_states"], th["itm_neg_hidden_states"])
    neg_a = D.kd_list(sa["itm_neg_attentions"], ta["itm_neg_attentions"], is_attn=True)
    mlm_h = D.kd_list(sh["mlm_hidden_states"], th["mlm_hidden_states"])
    mlm_a = D.kd_list(sa["mlm_attentions"], ta["mlm_attentions"], is_attn=True)
    mlm_logits = D.soft_cross_entropy(sl["mlm_logits"] / temperature, tl["mlm_logits"] / temperature)
    itm_logits = D.soft_cross_entropy(sl["itm_head_logits"] / temperature, tl["itm_head_logits"] / temperature)

    loss_text_kd = text_a + text_h
    loss_img_kd = img_a + 0.1 * img_h
    loss_cross_kd = neg_a + neg_h + pos_a + pos_h + mlm_a + mlm_h
    loss_kd = itm_logits + mlm_logits + loss_text_kd + loss_img_kd + loss_cross_kd
    return {
        "loss_kd": loss_kd,
        "loss_text_kd": loss_text_kd,
        "loss_img_kd": loss_img_kd,
        "loss_cross_kd": loss_cross_kd,
        "loss_mlm_logits_kd": mlm_logits,
        "loss_itm_logits_kd": itm_logits,
    }


def make_gd_train_step(
    student_model,
    teacher_model,
    optimizer,
    *,
    teacher_params,
    temperature: float = 1.0,
    kd_weight: float = 0.4,
    axis_name: Optional[str] = None,
    with_bbox: bool = False,
    dtype=None,
    impl: str = "xla",
) -> Callable:
    """One jitted general-distillation step (GeneralDistill.py:107-437):
    student+teacher pretrain forward, 0.6*task + 0.4*KD, single optimizer.
    `with_bbox` selects the region-batch variant (ret_bbox_loss=True).
    State: (params, opt_state, step)."""

    def loss_fn(params, batch, rng, step, tp):
        srng, trng = jax.random.split(rng)
        fwd_kw = dict(
            text_ids_masked=batch.get("text_ids_masked"),
            masked_pos=batch.get("masked_pos"),
            masked_ids=batch.get("masked_ids"),
            output_attentions=True, output_hidden_states=True,
            axis_name=axis_name, dtype=dtype, impl=impl,
        )
        if with_bbox:
            fwd_kw.update(
                image_atts=batch.get("image_atts"),
                idx_to_group_img=batch.get("idx_to_group_img"),
                target_bbox=batch.get("target_bbox"),
                is_image=batch.get("is_image"),
                ret_bbox_loss=True,
            )
        student_outputs = student_model.forward(
            params, batch["image"], batch["text_ids"], batch["text_atts"],
            rng=srng, train=True, **fwd_kw,
        )
        teacher_outputs = teacher_model.forward(
            jax.lax.stop_gradient(tp),
            batch["image"], batch["text_ids"], batch["text_atts"],
            rng=trng, train=False, **fwd_kw,
        )
        kd = gd_kd_losses(student_outputs, teacher_outputs, temperature=temperature)
        l = student_outputs["loss"]
        loss_small = l["loss_itc"] + l["loss_itm"] + l["loss_mlm"]
        if with_bbox:
            loss_small = loss_small + l["loss_bbox"] + l["loss_giou"]
        loss = (1.0 - kd_weight) * loss_small + kd_weight * kd["loss_kd"]
        metrics = {"loss": loss, **l, **kd}
        return loss, metrics

    def train_step(state, batch: dict, rng: Array, teacher_params_arg=None):
        # teacher params ride as an ARGUMENT: closed-over arrays inline into
        # the lowered module as constants (hundreds of MB at production
        # size — the remote compile service rejects the payload and compile
        # time explodes); passed as an arg they are ordinary parameters.
        tp = teacher_params_arg if teacher_params_arg is not None else teacher_params
        params, opt_state, step = state
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng, step, tp)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = clamp_temp(optax.apply_updates(params, updates))
        return (params, opt_state, step + 1), metrics

    return train_step


def make_pretrain_train_step(
    model,
    optimizer,
    *,
    axis_name: Optional[str] = None,
    with_bbox: bool = False,
    dtype=None,
    impl: str = "xla",
) -> Callable:
    """One jitted plain X-VLM pretrain step — no teacher, no KD (reference
    run.py:201-208 pretrain_4m_base / pretrain_4m_small -> Pretrain.py:
    ITC + ITM + MLM, + bbox/GIoU on region batches). Same state layout as
    the GD step ((params, opt_state, step)) so the gd driver serves both;
    the unused teacher_params arg keeps the data_parallel_step signature."""

    def loss_fn(params, batch, rng):
        fwd_kw = dict(
            text_ids_masked=batch.get("text_ids_masked"),
            masked_pos=batch.get("masked_pos"),
            masked_ids=batch.get("masked_ids"),
            axis_name=axis_name, dtype=dtype, impl=impl,
        )
        if with_bbox:
            fwd_kw.update(
                image_atts=batch.get("image_atts"),
                idx_to_group_img=batch.get("idx_to_group_img"),
                target_bbox=batch.get("target_bbox"),
                is_image=batch.get("is_image"),
                ret_bbox_loss=True,
            )
        outputs = model.forward(
            params, batch["image"], batch["text_ids"], batch["text_atts"],
            rng=rng, train=True, **fwd_kw,
        )
        l = outputs["loss"]
        loss = l["loss_itc"] + l["loss_itm"] + l["loss_mlm"]
        if with_bbox:
            loss = loss + l["loss_bbox"] + l["loss_giou"]
        return loss, {"loss": loss, **l}

    def train_step(state, batch: dict, rng: Array, teacher_params_arg=None):
        params, opt_state, step = state
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = clamp_temp(optax.apply_updates(params, updates))
        return (params, opt_state, step + 1), metrics

    return train_step


def _split_text_cross(hidden, attns, fusion_layer):
    """VQA/NLVR KD splits the multi_modal text stack at the fusion boundary
    (Eff_VQA.py:121-135: hidden [:fusion+1]=text, [fusion+1:]=cross outputs;
    attn [:fusion]=text, [fusion:]=cross self-attn)."""
    return (
        hidden[: fusion_layer + 1],
        hidden[fusion_layer + 1 :],
        attns[:fusion_layer],
        attns[fusion_layer:],
    )


def vqa_kd_losses(student_outputs, teacher_outputs, *, fusion_layer_s, fusion_layer_t, temperature=1.0):
    """Eff_VQA.py:113-172."""
    sh, th = student_outputs["hidden_dict"], teacher_outputs["hidden_dict"]
    sa, ta = student_outputs["attention_dict"], teacher_outputs["attention_dict"]
    sc, tc = student_outputs["cross_attention_dict"], teacher_outputs["cross_attention_dict"]

    s_text_h = sh["text_hidden_states"]
    t_text_h = D.get_cor_teacher([jax.lax.stop_gradient(x) for x in th["text_hidden_states"]], s_text_h)
    s_text_a = sa["text_attentions"]
    t_text_a = D.get_cor_teacher([jax.lax.stop_gradient(x) for x in ta["text_attentions"]], s_text_a, is_attn=True)
    s_th, s_ch, s_ta, s_ca = _split_text_cross(s_text_h, s_text_a, fusion_layer_s)
    t_th, t_ch, t_ta, t_ca = _split_text_cross(t_text_h, t_text_a, fusion_layer_s)

    text_h = D.kd_loss(s_th, t_th)
    text_a = D.kd_loss(s_ta, t_ta, is_attn=True)
    cross_h = D.kd_loss(s_ch, t_ch)
    cross_sa = D.kd_loss(s_ca, t_ca, is_attn=True)
    cross_x = D.kd_list(sc["cross_attentions"], tc["cross_attentions"], is_attn=True)

    img_h = D.kd_list(sh["image_hidden_states"], th["image_hidden_states"], is_img=True)
    img_a = D.kd_list(sa["image_attentions"], ta["image_attentions"], is_attn=True)

    dec_h = D.kd_list(sh["decoder_hidden_states"], th["decoder_hidden_states"], is_img=True)
    dec_a = D.kd_list(sa["decoder_attentions"], ta["decoder_attentions"], is_attn=True)
    dec_x = D.kd_list(sc["decoder_cross_attentions"], tc["decoder_cross_attentions"], is_attn=True)

    logits = D.soft_cross_entropy(
        student_outputs["logits_dict"]["logits"] / temperature,
        teacher_outputs["logits_dict"]["logits"] / temperature,
    )
    loss_text_kd = text_a + text_h
    loss_img_kd = img_a + img_h * 0.2
    loss_cross_kd = (cross_h + cross_sa + cross_x) * 0.5
    loss_decoder_kd = dec_a + dec_h + dec_x
    loss_kd = logits + loss_text_kd + loss_img_kd + loss_cross_kd + loss_decoder_kd
    return {
        "loss_kd": loss_kd, "loss_text_kd": loss_text_kd, "loss_img_kd": loss_img_kd,
        "loss_cross_kd": loss_cross_kd, "loss_decoder_kd": loss_decoder_kd,
        "loss_logits_kd": logits,
    }


def nlvr_kd_losses(student_outputs, teacher_outputs, *, fusion_layer_s, temperature=1.0):
    """Eff_NLVR.py:112-146 (img hidden 0.1; kd = logits + text +
    (img+cross)*0.33). NOTE the NLVR text stack has 2x cross layers."""
    sh, th = student_outputs["hidden_dict"], teacher_outputs["hidden_dict"]
    sa, ta = student_outputs["attention_dict"], teacher_outputs["attention_dict"]
    sc, tc = student_outputs["cross_attention_dict"], teacher_outputs["cross_attention_dict"]

    s_text_h = sh["text_hidden_states"]
    t_text_h = D.get_cor_teacher([jax.lax.stop_gradient(x) for x in th["text_hidden_states"]], s_text_h)
    s_text_a = sa["text_attentions"]
    t_text_a = D.get_cor_teacher([jax.lax.stop_gradient(x) for x in ta["text_attentions"]], s_text_a, is_attn=True)
    s_th, s_ch, s_ta, s_ca = _split_text_cross(s_text_h, s_text_a, fusion_layer_s)
    t_th, t_ch, t_ta, t_ca = _split_text_cross(t_text_h, t_text_a, fusion_layer_s)

    text_h = D.kd_loss(s_th, t_th)
    text_a = D.kd_loss(s_ta, t_ta, is_attn=True)
    cross_h = D.kd_loss(s_ch, t_ch)
    cross_sa = D.kd_loss(s_ca, t_ca, is_attn=True)
    cross_x = D.kd_list(sc["cross_attentions"], tc["cross_attentions"], is_attn=True)
    img_h = D.kd_list(sh["image_hidden_states"], th["image_hidden_states"], is_img=True)
    img_a = D.kd_list(sa["image_attentions"], ta["image_attentions"], is_attn=True)
    logits = D.soft_cross_entropy(
        student_outputs["logits_dict"]["cls_head_logits"] / temperature,
        teacher_outputs["logits_dict"]["cls_head_logits"] / temperature,
    )
    loss_text_kd = text_a + text_h
    loss_img_kd = img_a + img_h * 0.1
    loss_cross_kd = (cross_h + cross_sa + cross_x) * 0.5
    loss_kd = logits + loss_text_kd + (loss_img_kd + loss_cross_kd) * 0.33
    return {
        "loss_kd": loss_kd, "loss_text_kd": loss_text_kd, "loss_img_kd": loss_img_kd,
        "loss_cross_kd": loss_cross_kd, "loss_logits_kd": logits,
    }


def captioning_kd_losses(student_outputs, teacher_outputs, *, temperature=1.0):
    """Eff_Captioning.py:108-144 (kd = logits + img + decoder; no text tower)."""
    sh, th = student_outputs["hidden_dict"], teacher_outputs["hidden_dict"]
    sa, ta = student_outputs["attention_dict"], teacher_outputs["attention_dict"]
    sc, tc = student_outputs["cross_attention_dict"], teacher_outputs["cross_attention_dict"]

    img_h = D.kd_list(sh["image_hidden_states"], th["image_hidden_states"], is_img=True)
    img_a = D.kd_list(sa["image_attentions"], ta["image_attentions"], is_attn=True)
    dec_h = D.kd_list(sh["decoder_hidden_states"], th["decoder_hidden_states"], is_img=True)
    dec_a = D.kd_list(sa["decoder_attentions"], ta["decoder_attentions"], is_attn=True)
    dec_x = D.kd_list(sc["decoder_cross_attentions"], tc["decoder_cross_attentions"], is_attn=True)
    logits = D.soft_cross_entropy(
        student_outputs["logits_dict"]["logits"] / temperature,
        teacher_outputs["logits_dict"]["logits"] / temperature,
    )
    loss_img_kd = img_a + img_h * 0.1
    loss_decoder_kd = dec_a + dec_h + dec_x
    loss_kd = logits + loss_img_kd + loss_decoder_kd
    return {
        "loss_kd": loss_kd, "loss_img_kd": loss_img_kd,
        "loss_decoder_kd": loss_decoder_kd, "loss_logits_kd": logits,
    }


def make_task_train_step(
    student_forward: Callable,
    teacher_forward: Callable,
    kd_fn: Callable,
    l0_module: L0Module,
    optimizers,
    *,
    teacher_params,
    task_weight: float,
    kd_weight: float,
    axis_name: Optional[str] = None,
    frozen_zs: Optional[dict] = None,
) -> Callable:
    """Generic stage-2 pruning fine-tune step shared by VQA / NLVR /
    captioning (Eff_VQA.py:74-214, Eff_NLVR.py:73-190, Eff_Captioning.py:
    74-180): loss = task_weight*task + kd_weight*KD + lagrangian; 3
    optimizers.

    frozen_zs implements stop_prune (Eff_VQA.py:375-378 / efficient_models/
    model_generation.py:98-103): the driver computes the deterministic gate
    masks once at the stop epoch and rebuilds the step with them — the
    student then fine-tunes against the EXACT binary network that will be
    exported, the Lagrangian term is dropped, and gate/λ updates become
    zero.

    student_forward(params, zs, batch, rng) -> outputs dict
    teacher_forward(teacher_params, batch, rng) -> outputs dict
    kd_fn(student_outputs, teacher_outputs) -> dict with 'loss_kd'
    """

    def loss_fn(params, loga, lam, batch, rng, step, tp):
        zrng, srng, trng = jax.random.split(rng, 3)
        if frozen_zs is not None:
            zs = jax.tree.map(jax.lax.stop_gradient, frozen_zs)
        else:
            zs = l0_module.forward_train({"loga": loga}, zrng)
        student_outputs = student_forward(params, zs, batch, srng)
        teacher_outputs = teacher_forward(jax.lax.stop_gradient(tp), batch, trng)
        kd = kd_fn(student_outputs, teacher_outputs)
        loss_task = student_outputs["loss"]
        if frozen_zs is not None:
            lagrangian_loss = jnp.zeros(())
            expected_sparsity = target_sparsity = jnp.zeros(())
        else:
            lagrangian_loss, expected_sparsity, target_sparsity = (
                l0_module.lagrangian_regularization({"loga": loga, **lam}, step)
            )
        loss = task_weight * loss_task + kd_weight * kd["loss_kd"] + lagrangian_loss
        metrics = {
            "loss": loss, "loss_task": loss_task,
            "lagrangian_loss": lagrangian_loss,
            "expected_sparsity": expected_sparsity,
            "target_sparsity": target_sparsity, **kd,
        }
        return loss, metrics

    def train_step(state: TrainState, batch: dict, rng: Array, teacher_params_arg=None):
        # see make_gd_train_step: teacher params must be an argument, not a
        # closure constant, or they inline into the compiled module
        tp = teacher_params_arg if teacher_params_arg is not None else teacher_params
        (_, metrics), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, state.loga, state.lam, batch, rng, state.step, tp
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        if frozen_zs is not None:
            # post-freeze: only the main optimizer steps (the reference stops
            # calling l0/lagrangian .step() entirely)
            opt = optimizers[0]
            u, opt_state = opt.update(grads[0], state.opt_state, state.params)
            params = optax.apply_updates(state.params, u)
            state = TrainState(params, state.loga, state.lam, opt_state,
                               state.l0_state, state.lam_state, state.step + 1)
        else:
            state = apply_updates_3way(state, grads, optimizers)
        return state, metrics

    return train_step


def subset_teacher_taps(out: dict, *, vision_layers: int, text_fusion: int,
                        cross_layers: int) -> dict:
    """Shrink a teacher KD-output tree to the STUDENT-mapped tap layers
    (train/distill.py:subset_taps). Used by split-step teacher programs so
    the unread taps are never materialized as program outputs (XLA then
    dead-code-eliminates their stores); the monolithic step needs no such
    trimming because DCE sees the whole graph."""

    def n_for(key: str) -> int:
        if key.startswith("image"):
            return vision_layers
        if key.startswith("text"):
            return text_fusion
        return cross_layers  # itm_pos_* / itm_neg_* fusion-mode taps

    return {
        "hidden_dict": {k: D.subset_taps(v, n_for(k))
                        for k, v in out["hidden_dict"].items()},
        # attention dicts may be absent (probs-off ablation arms)
        "attention_dict": {k: D.subset_taps(v, n_for(k), is_attn=True)
                           for k, v in out.get("attention_dict", {}).items()},
        "cross_attention_dict": {k: D.subset_taps(v, n_for(k), is_attn=True)
                                 for k, v in out.get("cross_attention_dict", {}).items()},
        "logits_dict": out["logits_dict"],
    }


def make_split_retrieval_train_step(
    student_model,
    teacher_model,
    l0_module: L0Module,
    optimizers,
    *,
    teacher_params,
    temperature: float = 1.0,
    dtype=None,
    impl: str = "xla",
    axis_name: Optional[str] = None,
    mesh=None,
):
    """Two-program variant of the retrieval KD step: the teacher forward and
    the student update compile as SEPARATE XLA programs (the monolithic
    teacher+student+grads graph can exceed the compiler's memory at
    production scale). Teacher outputs stay on-device between the calls.

    With mesh+axis_name, EACH program is its own jit(shard_map) over the
    'data' axis (an outer shard_map would inline the inner jits back into
    one program, defeating the split): teacher taps come out batch-sharded
    and feed the student program without leaving the devices; grads and
    metrics pmean inside the student program.

    Returns train_step(state, batch, rng) like make_retrieval_train_step;
    internally two jits."""
    assert (mesh is None) == (axis_name is None), (
        "split step: pass mesh AND axis_name together (each program wraps "
        "its own shard_map) or neither (single-device / global-batch)")
    sv = student_model.vision_cfg["num_hidden_layers"]
    sf = student_model.text_cfg["fusion_layer"]
    sx = student_model.text_cfg["num_hidden_layers"] - sf

    def _teacher_fwd(tp, batch, rng):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        out = teacher_model.forward(
            jax.lax.stop_gradient(tp),
            batch["image"], batch["text_ids"], batch["text_atts"],
            idx=batch.get("idx"), zs=None, rng=rng,
            output_attentions=True, output_hidden_states=True,
            axis_name=axis_name, train=False, dtype=dtype, impl=impl,
        )
        # stop gradients & drop the loss dict (host scalars not needed);
        # keep only the student-mapped tap layers as program outputs
        return jax.tree.map(jax.lax.stop_gradient, subset_teacher_taps(
            out, vision_layers=sv, text_fusion=sf, cross_layers=sx,
        ))

    def loss_fn(params, loga, lam, batch, teacher_outputs, rng, step):
        zrng, srng = jax.random.split(rng)
        zs = l0_module.forward_train({"loga": loga}, zrng)
        student_outputs = student_model.forward(
            params, batch["image"], batch["text_ids"], batch["text_atts"],
            idx=batch.get("idx"), zs=zs, rng=srng,
            output_attentions=True, output_hidden_states=True,
            axis_name=axis_name, train=True, dtype=dtype, impl=impl,
        )
        kd = retrieval_kd_losses(student_outputs, teacher_outputs, temperature=temperature)
        loss_itc = student_outputs["loss"]["loss_itc"]
        loss_itm = student_outputs["loss"]["loss_itm"]
        lagrangian_loss, expected_sparsity, target_sparsity = (
            l0_module.lagrangian_regularization({"loga": loga, **lam}, step)
        )
        loss = (kd["loss_kd"] + loss_itc + loss_itm) * 0.5 + lagrangian_loss
        metrics = {
            "loss": loss, "loss_itc": loss_itc, "loss_itm": loss_itm,
            "lagrangian_loss": lagrangian_loss,
            "expected_sparsity": expected_sparsity,
            "target_sparsity": target_sparsity, **kd,
        }
        return loss, metrics

    def _student_update(state: TrainState, batch, teacher_outputs, rng):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (_, metrics), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, state.loga, state.lam, batch, teacher_outputs, rng, state.step
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        return apply_updates_3way(state, grads, optimizers), metrics

    if mesh is not None and axis_name is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        teacher_fwd = jax.jit(shard_map(
            _teacher_fwd, mesh=mesh,
            in_specs=(P(), P(axis_name), P()),
            out_specs=P(axis_name),  # taps stay batch-sharded on-device
            check_vma=False,
        ))
        student_update = jax.jit(shard_map(
            _student_update, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))
    else:
        teacher_fwd = jax.jit(_teacher_fwd)
        student_update = jax.jit(_student_update)

    def train_step(state: TrainState, batch: dict, rng: Array, teacher_params_arg=None):
        tp = teacher_params_arg if teacher_params_arg is not None else teacher_params
        trng, srng = jax.random.split(rng)
        teacher_outputs = teacher_fwd(tp, batch, trng)
        return student_update(state, batch, teacher_outputs, srng)

    return train_step


def make_retrieval_train_step(
    student_model,
    teacher_model,
    l0_module: L0Module,
    optimizers,
    *,
    teacher_params,
    temperature: float = 1.0,
    axis_name: Optional[str] = None,
    dtype=None,
    impl: str = "xla",
) -> Callable:
    """One jitted pruning-fine-tune step (Eff_Retrieval.py:75-213):
    student fwd w/ stochastic gates + KD vs frozen teacher + Lagrangian,
    3 optimizer updates. Returns (state, metrics)."""

    def loss_fn(params, loga, lam, batch, rng, step, tp):
        zrng, srng, trng = jax.random.split(rng, 3)
        zs = l0_module.forward_train({"loga": loga}, zrng)
        student_outputs = student_model.forward(
            params, batch["image"], batch["text_ids"], batch["text_atts"],
            idx=batch.get("idx"), zs=zs, rng=srng,
            output_attentions=True, output_hidden_states=True,
            axis_name=axis_name, train=True, dtype=dtype, impl=impl,
        )
        teacher_outputs = teacher_model.forward(
            jax.lax.stop_gradient(tp),
            batch["image"], batch["text_ids"], batch["text_atts"],
            idx=batch.get("idx"), zs=None, rng=trng,
            output_attentions=True, output_hidden_states=True,
            axis_name=axis_name, train=False, dtype=dtype, impl=impl,
        )
        kd = retrieval_kd_losses(student_outputs, teacher_outputs, temperature=temperature)
        loss_itc = student_outputs["loss"]["loss_itc"]
        loss_itm = student_outputs["loss"]["loss_itm"]
        loss_small = loss_itc + loss_itm
        lagrangian_loss, expected_sparsity, target_sparsity = (
            l0_module.lagrangian_regularization({"loga": loga, **lam}, step)
        )
        loss = (kd["loss_kd"] + loss_small) * 0.5 + lagrangian_loss
        metrics = {
            "loss": loss,
            "loss_itc": loss_itc,
            "loss_itm": loss_itm,
            "lagrangian_loss": lagrangian_loss,
            "expected_sparsity": expected_sparsity,
            "target_sparsity": target_sparsity,
            **kd,
        }
        return loss, metrics

    def train_step(state: TrainState, batch: dict, rng: Array, teacher_params_arg=None):
        # see make_gd_train_step: teacher params must be an argument, not a
        # closure constant, or they inline into the compiled module
        tp = teacher_params_arg if teacher_params_arg is not None else teacher_params
        (_, metrics), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, state.loga, state.lam, batch, rng, state.step, tp
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        state = apply_updates_3way(state, grads, optimizers)
        return state, metrics

    return train_step
