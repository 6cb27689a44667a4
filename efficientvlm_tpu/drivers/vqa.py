"""Eff_VQA driver: stage-2 VQA pruning fine-tune with decoder KD +
answer-ranking evaluation (reference Eff_VQA.py)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import SimpleLoader, VQADataset, vqa_collate
from ..data.tokenizer import build_tokenizer
from ..data.transforms import ImageTransform
from ..data.utils import collect_result
from ..models.model_generation import XVLMForVQA
from ..pruning.l0_module import VQAL0Module
from ..train.steps import init_train_state, make_task_train_step, vqa_kd_losses
from ..utils import MetricLogger
from ..utils.dist import get_rank
from . import common


def build_models(config: Config):
    vcfg, tcfg = common.model_configs(config)
    tv, tt = common.teacher_configs(config)
    cfg = Config(config)
    cfg["num_dec_layers"] = config.get("num_dec_layers", tcfg["num_hidden_layers"] - tcfg["fusion_layer"])
    tcfg_args = Config(config)
    tcfg_args["num_dec_layers"] = config.get("teacher_num_dec_layers", tt["num_hidden_layers"] - tt["fusion_layer"])
    student = XVLMForVQA(vcfg, tcfg, cfg)
    teacher = XVLMForVQA(tv, tt, tcfg_args)
    return student, teacher


def load_torch_params(model, ckpt_path, use_stored_decoder: bool = True):
    """Import a reference torch/HF VQA checkpoint for `model` (reference
    EffXVLMForVQA.load_pretrained remaps incl. decoder-from-cross init).
    use_stored_decoder = reference is_eval (--evaluate/--load_vqa_pretrain):
    a VQA-shaped checkpoint keeps its trained decoder instead of the
    cross-layer re-derivation. Returns None when the path is absent.
    Shared by the driver and scripts/infer.py (which always evaluates, so
    True is the default)."""
    import os as _os

    from ..train import checkpoint as ckpt_io

    if not (ckpt_path and _os.path.exists(ckpt_path)):
        return None
    sd = ckpt_io.load_torch_state_dict(ckpt_path)
    return ckpt_io.vqa_params_from_state_dict(
        sd, vision_layers=model.vision_cfg["num_hidden_layers"],
        text_layers=model.text_cfg["num_hidden_layers"],
        fusion_layer=model.text_cfg["fusion_layer"],
        num_dec_layers=model.decoder_cfg["num_hidden_layers"],
        num_patches=model.vision_cfg.num_patches,
        use_stored_decoder=use_stored_decoder,
    )


def build_l0(config: Config) -> VQAL0Module:
    vcfg, tcfg = common.model_configs(config)
    return VQAL0Module(
        vision_layers=vcfg["num_hidden_layers"],
        text_layers=tcfg["fusion_layer"],
        cross_layers=tcfg["num_hidden_layers"] - tcfg["fusion_layer"],
        hidden_size=tcfg["hidden_size"],
        intermediate_size=tcfg["intermediate_size"],
        num_heads=tcfg["num_attention_heads"],
        vision_hidden_size=vcfg["vision_width"],
        vision_intermediate_size=vcfg["intermediate_size"],
        vision_num_heads=vcfg["num_attention_heads"],
        target_sparsity=float(config.get("sparsity", 0.0)),
        # head pairs (128 lanes at head_dim 64): export never re-pads
        head_group=int(config.get("head_gate_group", 1)),
    )


def evaluation(model, params, loader, tokenizer, config: Config, *, zs=None, dtype=None):
    """Answer-ranking eval (Eff_VQA.py:217-240): rank the answer_list,
    emit [{'question_id','answer'}]."""
    answer_list = [a + "[SEP]" for a in loader.dataset.answer_list]
    ans = tokenizer(answer_list, padding="longest", truncation=True, max_length=20)
    k = min(int(config.get("k_test", 128)), len(answer_list))
    results = []
    impl = config.get("attn_impl", "fused")
    if dtype is None and config.get("compute_dtype", "bf16") == "bf16":
        dtype = jnp.bfloat16
    fwd = jax.jit(lambda p, img, qi, qa: model.forward_eval(
        p, img, qi, qa, jnp.asarray(ans["input_ids"]), jnp.asarray(ans["attention_mask"]),
        k=k, zs=zs, dtype=dtype, impl=impl,
    ))
    for images, questions, qids in loader:
        tok = tokenizer(list(questions), padding="max_length", truncation=True,
                        max_length=config.get("max_tokens", 40))
        topk_ids, topk_probs = fwd(
            params, jnp.asarray(images), jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"])
        )
        best = np.asarray(topk_ids)[:, 0]
        for qid, aid in zip(qids, best):
            results.append({"question_id": int(qid), "answer": loader.dataset.answer_list[int(aid)]})
    return results


def main(args: Config, config: Config) -> dict:
    info = common.setup(args, config)
    tokenizer = build_tokenizer(config.get("text_encoder", ""))
    image_res = config.get("image_res", 480)

    student, teacher = build_models(config)

    # reference Eff_VQA.py:311: student is_eval = --evaluate or
    # --load_vqa_pretrain (plain fine-tunes re-derive the decoder from the
    # cross layers even for VQA-shaped checkpoints); the teacher always
    # loads is_eval=True (Eff_VQA.py:321)
    sparams = load_torch_params(
        student, args.get("checkpoint"),
        use_stored_decoder=bool(args.get("evaluate") or args.get("load_vqa_pretrain")),
    ) or student.init(jax.random.PRNGKey(0))
    tparams = load_torch_params(
        teacher, args.get("teacher_chkpt"), use_stored_decoder=True,
    ) or teacher.init(jax.random.PRNGKey(1))
    l0 = build_l0(config)
    l0_params = l0.init(jax.random.PRNGKey(2))

    test_ds = VQADataset(
        config["test_file"], common.eval_transform(config, image_res),
        config.get("vqa_root", ""), config.get("vg_root", ""), split="test",
        answer_list=config.get("answer_list", ""),
    )
    test_loader = SimpleLoader(
        test_ds, batch_size=config.get("batch_size_test", 16),
        rank=info["rank"], world_size=info["world_size"],
    )

    if args.get("evaluate"):
        zs = (common.native_eval_gates(l0, args, config)
              if common.is_native_checkpoint(args, config)
              else l0.forward_deterministic({"loga": l0_params["loga"]}))
        results = evaluation(student, sparams, test_loader, tokenizer, config, zs=zs)
        merged = collect_result(results, "vqa_result", args.get("output_dir", "/tmp"),
                                hdfs_wdir=args.get("output_hdfs", ""),
                                rank=info["rank"], world_size=info["world_size"])
        return {"results": merged}

    train_ds = VQADataset(
        config["train_file"],
        common.preprocess_transform(
            config, default=ImageTransform.train_wohflip(image_res, seed=args.get("seed", 42))),
        config.get("vqa_root", ""), config.get("vg_root", ""), split="train",
        seed=args.get("seed", 42),
    )
    # per-device batch (reference per-GPU bs, Eff_VQA.py:326-328) × local
    # chips; the collate builds one self-consistent answer block per chip
    n_dev = jax.local_device_count()
    bs = int(args.get("bs") or config.get("batch_size_train", 8)) * n_dev
    from functools import partial

    train_loader = common.maybe_parallel_loader(SimpleLoader(
        train_ds, batch_size=bs, shuffle=True, drop_last=True,
        rank=info["rank"], world_size=info["world_size"],
        collate_fn=partial(vqa_collate, n_shards=n_dev),
    ), config)
    epochs = int(args.get("epoch") or config.get("schedular", {}).get("epochs", 10))
    steps_per_epoch = max(len(train_loader), 1)
    l0.lagrangian_warmup = int(
        float(config.get("L0_schedular", {}).get("lagrangian_warmup_epochs", 1)) * steps_per_epoch
    )
    optimizers = common.build_optimizers(sparams, config, epochs * steps_per_epoch)
    state = init_train_state(sparams, l0_params, optimizers)

    fusion_s = student.text_cfg["fusion_layer"]
    fusion_t = teacher.text_cfg["fusion_layer"]

    def student_forward(params, zs, batch, rng):
        return student.forward_train(
            params, batch["image"], batch["q_ids"], batch["q_atts"],
            batch["a_ids"], batch["a_atts"], batch["weights"], batch["k_index"],
            zs=zs, rng=rng, output_attentions=True, output_hidden_states=True, train=True,
        )

    def teacher_forward(params, batch, rng):
        return teacher.forward_train(
            params, batch["image"], batch["q_ids"], batch["q_atts"],
            batch["a_ids"], batch["a_atts"], batch["weights"], batch["k_index"],
            rng=rng, output_attentions=True, output_hidden_states=True, train=False,
            impl=config.get("attn_impl", "fused"),  # eval-mode: fused+probs
        )

    kd_fn = lambda s, t: vqa_kd_losses(  # noqa: E731
        s, t, fusion_layer_s=fusion_s, fusion_layer_t=fusion_t,
        temperature=float(args.get("temperature", 1.0)),
    )

    def build_step(frozen_zs=None):
        return common.data_parallel_step(common.wrap_step_with_preprocess(
            make_task_train_step(
                student_forward, teacher_forward, kd_fn,
                l0, optimizers, teacher_params=None,
                task_weight=0.6, kd_weight=0.4,
                axis_name=common.dp_axis_name(), frozen_zs=frozen_zs,
            ), config, hflip=False,  # reference VQA transform has no hflip
        ), with_teacher=True)

    step_fn, mesh, _ = build_step()

    start_epoch, resume_batches = 0, 0
    if args.get("resume") and args.get("output_dir"):
        restored = common.restore_full_state(args["output_dir"], state)
        if restored is not None:
            state, extra = restored
            start_epoch = int(extra.get("epoch", -1)) + 1
            resume_batches = int(extra.get("batches_done", 0))
            print(f"### resumed from epoch {start_epoch} (full state incl. optimizers)"
                  + (f" at batch {resume_batches}" if resume_batches else ""))

    stop_prune_epoch = args.get("stop_prune_epoch")
    start_eval = int(config.get("start_eval", 0))
    base_rng = jax.random.PRNGKey(int(args.get("seed", 42)))
    frozen_zs = None
    prof = common.StepProfiler(config, args.get("output_dir", ""))
    for epoch in range(start_epoch, epochs):
        if (stop_prune_epoch is not None and epoch >= int(stop_prune_epoch)
                and frozen_zs is None):
            # stop_prune (Eff_VQA.py:375-378): freeze the deterministic
            # binary gates into the step — post-freeze fine-tuning sees the
            # exact network that will be exported
            frozen_zs = l0.forward_deterministic({"loga": state.loga})
            step_fn, mesh, _ = build_step(frozen_zs)
            print(f"### stop_prune at epoch {epoch}: gates frozen deterministic")
        train_loader.set_epoch(epoch)
        rng = jax.random.fold_in(base_rng, epoch)
        logger = MetricLogger()
        def make_batch(items):
            images, questions, answers, weights, k_index = items
            q = tokenizer(list(questions), padding="max_length", truncation=True,
                          max_length=config.get("max_tokens", 40))
            a = tokenizer(list(answers), padding="max_length", truncation=True, max_length=20)
            return common.place_batch({
                "image": jnp.asarray(images),
                "q_ids": jnp.asarray(q["input_ids"]), "q_atts": jnp.asarray(q["attention_mask"]),
                "a_ids": jnp.asarray(a["input_ids"]), "a_atts": jnp.asarray(a["attention_mask"]),
                "weights": jnp.asarray(weights), "k_index": jnp.asarray(k_index),
            }, mesh)

        state = common.run_train_epoch(
            train_loader, logger, step_fn, state, rng, make_batch, prof,
            epoch=epoch, output_dir=args.get("output_dir", ""),
            teacher_params=tparams,
            resume_batches=resume_batches if epoch == start_epoch else 0,
            header=f"Train Epoch: [{epoch}]",
        )
        prof.close()
        logger.synchronize_between_processes()
        common.log_stats(
            {"epoch": epoch, **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()}},
            args.get("output_dir", ""),
        )
        common.save_training_state(
            args.get("output_dir", ""), epoch,
            {"model": state.params, "l0": {"loga": state.loga, **state.lam}, "epoch": epoch},
        )
        common.save_full_state(args.get("output_dir", ""), state, {"epoch": epoch})
        if epoch >= start_eval:
            # per-epoch evaluation + cross-rank merge
            # (Eff_VQA.py:217-240, 337-339, 396-405)
            zs = frozen_zs if frozen_zs is not None else l0.forward_deterministic({"loga": state.loga})
            results = evaluation(student, state.params, test_loader, tokenizer, config, zs=zs)
            merged = collect_result(
                results, f"vqa_result_epoch{epoch}", args.get("output_dir", "/tmp"),
                hdfs_wdir=args.get("output_hdfs", ""),
                rank=info["rank"], world_size=info["world_size"], save_result=True,
            )
            if merged is not None:
                common.log_stats({"epoch": epoch, "eval_result_file": str(merged)},
                                 args.get("output_dir", ""))
    return {"state": state}
