"""Eff_Retrieval driver: stage-2 ITR pruning fine-tune with KD + two-stage
sharded evaluation (reference Eff_Retrieval.py)."""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import RetrievalEvalDataset, RetrievalTrainDataset, SimpleLoader
from ..data.tokenizer import build_tokenizer
from ..data.transforms import ImageTransform
from ..evaluation import retrieval as R
from ..models.model_retrieval import XVLMForRetrieval
from ..pruning.l0_module import XVLML0Module
from ..train.steps import init_train_state, make_retrieval_train_step
from ..utils import MetricLogger
from ..utils.dist import get_rank, get_world_size
from . import common


def build_models(config: Config):
    vcfg, tcfg = common.model_configs(config)
    tv, tt = common.teacher_configs(config)
    student = XVLMForRetrieval(vcfg, tcfg, config)
    teacher = XVLMForRetrieval(tv, tt, config)
    return student, teacher


def build_l0(config: Config) -> XVLML0Module:
    vcfg, tcfg = common.model_configs(config)
    l0_cfg = config.get("L0_schedular", Config())
    return XVLML0Module(
        vision_layers=vcfg["num_hidden_layers"],
        text_layers=tcfg["fusion_layer"],
        cross_layers=tcfg["num_hidden_layers"] - tcfg["fusion_layer"],
        hidden_size=tcfg["hidden_size"],
        intermediate_size=tcfg["intermediate_size"],
        num_heads=tcfg["num_attention_heads"],
        vision_hidden_size=vcfg["vision_width"],
        vision_intermediate_size=vcfg["intermediate_size"],
        vision_num_heads=vcfg["num_attention_heads"],
        droprate_init=float(l0_cfg.get("droprate_init", 0.5)),
        temperature=float(l0_cfg.get("temperature", 2.0 / 3.0)),
        target_sparsity=float(config.get("sparsity", 0.0)),
        # head pairs (128 lanes at head_dim 64): export never re-pads
        head_group=int(config.get("head_gate_group", 1)),
    )


def evaluate(model, params, eval_loader, eval_dataset, tokenizer, config: Config, *, zs=None, dtype=None):
    """Two-stage eval (Eff_Retrieval.py:216-332) + itm_eval; batches spread
    over local chips (R.eval_mesh) on top of the reference's rank sharding;
    encoders/ITM rescore run the fused kernels (attn_impl, default fused)."""
    texts = eval_dataset.text
    tok = tokenizer(texts, padding="max_length", truncation=True,
                    max_length=config.get("max_tokens", 40))
    mesh = R.eval_mesh()
    impl = config.get("attn_impl", "fused")
    if dtype is None and config.get("compute_dtype", "bf16") == "bf16":
        import jax.numpy as _jnp

        dtype = _jnp.bfloat16
    text_feats, text_embeds = R.encode_texts(
        model, params, tok["input_ids"], tok["attention_mask"], zs=zs,
        batch_size=config.get("batch_size_test_text", 64), dtype=dtype, mesh=mesh, impl=impl,
    )
    image_batches = (np.asarray(b[0]) for b in eval_loader)
    image_feats, image_embeds = R.encode_images(
        model, params, image_batches, zs=zs, dtype=dtype, mesh=mesh, impl=impl)
    score_i2t, score_t2i = R.retrieval_scores(
        model, params, image_feats, image_embeds, text_feats,
        np.asarray(tok["attention_mask"]), text_embeds,
        zs=zs, k_test=config.get("k_test", 256),
        rank=get_rank(), world_size=get_world_size(), dtype=dtype, mesh=mesh, impl=impl,
    )
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        score_i2t = np.asarray(multihost_utils.process_allgather(score_i2t)).sum(0)
        score_t2i = np.asarray(multihost_utils.process_allgather(score_t2i)).sum(0)
    return R.itm_eval(score_i2t, score_t2i, eval_dataset.txt2img, eval_dataset.img2txt)


def main(args: Config, config: Config) -> dict:
    info = common.setup(args, config)
    tokenizer = build_tokenizer(config.get("text_encoder", ""))
    image_res = config.get("image_res", 224)

    train_ds = RetrievalTrainDataset(
        config["train_file"],
        common.preprocess_transform(
            config, default=ImageTransform.train(image_res, seed=args.get("seed", 42))),
        config.get("image_root", ""), max_words=config.get("max_tokens", 40),
    )
    # per-device batch (reference per-GPU bs, Eff_Retrieval.py:448-450) ×
    # local chips = this host's loader batch; shard_map splits it per chip.
    n_dev = jax.local_device_count()
    bs = int(args.get("bs") or config.get("batch_size_train", 24)) * n_dev
    train_loader = SimpleLoader(
        train_ds, batch_size=bs, shuffle=True, drop_last=True,
        rank=info["rank"], world_size=info["world_size"],
    )
    train_loader = common.maybe_parallel_loader(train_loader, config)
    val_ds = RetrievalEvalDataset(
        config["val_file"], common.eval_transform(config, image_res), config.get("image_root", ""),
    )
    val_loader = SimpleLoader(val_ds, batch_size=config.get("batch_size_test", 24))
    test_ds = RetrievalEvalDataset(
        config["test_file"], common.eval_transform(config, image_res), config.get("image_root", ""),
    )
    test_loader = SimpleLoader(test_ds, batch_size=config.get("batch_size_test", 24))

    student, teacher = build_models(config)
    sparams = common.maybe_load_params(student, args, config, lambda: student.init(jax.random.PRNGKey(0)))
    teacher_args = Config({"checkpoint": args.get("teacher_chkpt")})
    tparams = common.maybe_load_params(teacher, teacher_args, Config(), lambda: teacher.init(jax.random.PRNGKey(1)))

    l0 = build_l0(config)
    l0_params = l0.init(jax.random.PRNGKey(2))

    epochs = int(args.get("epoch") or config.get("schedular", {}).get("epochs", 10))
    steps_per_epoch = max(len(train_loader), 1)
    total_steps = epochs * steps_per_epoch
    l0.lagrangian_warmup = int(
        float(config.get("L0_schedular", {}).get("lagrangian_warmup_epochs", 1)) * steps_per_epoch
    )
    optimizers = common.build_optimizers(sparams, config, total_steps)
    state = init_train_state(sparams, l0_params, optimizers)

    start_epoch, resume_batches = 0, 0
    if args.get("resume") and args.get("output_dir"):
        restored = common.restore_full_state(args["output_dir"], state)
        if restored is not None:
            state, extra = restored
            start_epoch = int(extra.get("epoch", -1)) + 1
            # a preemption save records mid-epoch progress: replay this
            # epoch, fast-forwarding the completed batches (run_train_epoch)
            resume_batches = int(extra.get("batches_done", 0))
            print(f"### resumed from epoch {start_epoch} (full state incl. optimizers)"
                  + (f" at batch {resume_batches}" if resume_batches else ""))

    if args.get("evaluate"):
        zs = (common.native_eval_gates(l0, args, config)
              if common.is_native_checkpoint(args, config)
              else l0.forward_deterministic({"loga": state.loga}))
        results = evaluate(student, state.params, test_loader, test_ds, tokenizer, config, zs=zs)
        common.log_stats({"test": results}, args.get("output_dir", ""))
        return results

    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if config.get("compute_dtype", "bf16") == "bf16" else None
    impl = config.get("attn_impl", "fused")
    # zero1: true — ZeRO-1 optimizer-state sharding (parallel/zero.py): the
    # step is written on GLOBAL arrays (axis_name=None; XLA inserts the
    # collectives) and the 3 optimizers' moments live sharded over 'data'.
    # split_kd_step: true — the production two-program KD step (teacher fwd
    # and student update compile separately; the monolithic graph is heavy
    # at scale, CLAUDE.md). Not combined with zero1/device_preprocess.
    if (config.get("split_kd_step") and not config.get("zero1")
            and not config.get("device_preprocess")):
        from ..train.steps import make_split_retrieval_train_step

        mesh, axis = common.data_mesh()
        step_fn = make_split_retrieval_train_step(
            student, teacher, l0, optimizers, teacher_params=None,
            temperature=float(args.get("temperature", 1.0)),
            dtype=dtype, impl=impl, axis_name=axis, mesh=mesh,
        )
    else:
        step_fn, mesh, state = common.build_train_step(
            lambda axis_name: common.wrap_step_with_preprocess(
                make_retrieval_train_step(
                    student, teacher, l0, optimizers, teacher_params=None,
                    temperature=float(args.get("temperature", 1.0)),
                    axis_name=axis_name, dtype=dtype, impl=impl,
                ), config,
            ), config, state, with_teacher=True)

    best = 0.0
    best_epoch = 0
    base_rng = jax.random.PRNGKey(int(args.get("seed", 42)))
    prof = common.StepProfiler(config, args.get("output_dir", ""))
    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        # epoch-keyed rng stream so a resumed run replays the interrupted
        # epoch bit-for-bit (reference resumes at epoch granularity)
        rng = jax.random.fold_in(base_rng, epoch)
        logger = MetricLogger()

        def make_batch(items):
            images, captions, idx = items
            tok = tokenizer(list(captions), padding="longest", truncation=True,
                            max_length=config.get("max_tokens", 40))
            return common.place_batch({
                "image": jnp.asarray(images),
                "text_ids": jnp.asarray(tok["input_ids"]),
                "text_atts": jnp.asarray(tok["attention_mask"]),
                "idx": jnp.asarray(idx),
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

        zs = l0.forward_deterministic({"loga": state.loga})
        val_results = evaluate(student, state.params, val_loader, val_ds, tokenizer, config, zs=zs)
        sizes = l0.calculate_model_size(zs)
        stats = {
            "epoch": epoch,
            **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()},
            **{f"val_{k}": v for k, v in val_results.items()},
            "sparsity": sizes["pruned_model_sparsity"],
        }
        common.log_stats(stats, args.get("output_dir", ""))
        common.save_full_state(args.get("output_dir", ""), state, {"epoch": epoch})
        if val_results["r_mean"] >= best:
            best, best_epoch = val_results["r_mean"], epoch
            common.save_training_state(
                args.get("output_dir", ""), "best",
                {"model": state.params, "l0": {"loga": state.loga, **state.lam}, "epoch": epoch},
            )
    common.log_stats({"best_epoch": best_epoch, "best_r_mean": best}, args.get("output_dir", ""))
    return {"best_epoch": best_epoch, "best_r_mean": best, "state": state}
