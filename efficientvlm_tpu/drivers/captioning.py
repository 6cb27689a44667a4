"""Eff_Captioning driver: stage-2 COCO captioning pruning fine-tune with KD;
eval = beam-search generation -> COCO metrics (reference Eff_Captioning.py).
Also serves the domain post-pretrain (Captioning_pretrain.py) when run
without a teacher (kd_weight=0)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import (
    CaptioningEvalDataset,
    CaptioningSCSTDataset,
    CaptioningTrainDataset,
    SimpleLoader,
    scst_collate,
)
from ..data.tokenizer import build_tokenizer
from ..data.transforms import ImageTransform
from ..data.utils import collect_result
from ..evaluation.caption_metrics import coco_caption_eval
from ..models.model_generation import XVLMForCaptioning
from ..pruning.l0_module import XVLML0Module
from ..train.steps import captioning_kd_losses, init_train_state, make_task_train_step
from ..utils import MetricLogger
from . import common


def build_models(config: Config):
    vcfg, tcfg = common.model_configs(config)
    tv, tt = common.teacher_configs(config)
    return XVLMForCaptioning(vcfg, tcfg, config), XVLMForCaptioning(tv, tt, config)


def load_torch_params(model, ckpt_path, load_capt_pretrain: bool = False):
    """Import a reference torch/HF captioning checkpoint for `model`
    (reference EffXVLMForCaptioning.load_pretrained remaps). Returns None
    when the path is absent. Shared by the driver and scripts/infer.py."""
    import os as _os

    from ..train import checkpoint as ckpt_io

    if not (ckpt_path and _os.path.exists(ckpt_path)):
        return None
    sd = ckpt_io.load_torch_state_dict(ckpt_path)
    return ckpt_io.captioning_params_from_state_dict(
        sd, vision_layers=model.vision_cfg["num_hidden_layers"],
        text_layers=model.text_cfg["num_hidden_layers"],
        fusion_layer=model.text_cfg["fusion_layer"],
        num_patches=model.vision_cfg.num_patches,
        load_capt_pretrain=load_capt_pretrain,
    )


def build_l0(config: Config) -> XVLML0Module:
    vcfg, tcfg = common.model_configs(config)
    return XVLML0Module(
        vision_layers=vcfg["num_hidden_layers"],
        text_layers=tcfg["fusion_layer"],
        cross_layers=tcfg["num_hidden_layers"] - tcfg["fusion_layer"],
        hidden_size=tcfg["hidden_size"],
        intermediate_size=tcfg["intermediate_size"],
        num_heads=tcfg["num_attention_heads"],
        target_sparsity=float(config.get("sparsity", 0.0)),
        # head pairs (128 lanes at head_dim 64): export never re-pads
        head_group=int(config.get("head_gate_group", 1)),
    )


def evaluation(model, params, loader, tokenizer, config: Config, *, zs=None, dtype=None):
    """Beam-search caption generation (Eff_Captioning.py:184-208)."""
    prompt = config.get("prompt", "a picture of ")
    prompt_ids = tokenizer([prompt])["input_ids"][:, :-1]  # drop [SEP]
    num_beams = int(config.get("num_beams", 3))
    max_len = int(config.get("max_length", 20))
    results = []
    impl = config.get("attn_impl", "fused")
    if dtype is None and config.get("compute_dtype", "bf16") == "bf16":
        dtype = jnp.bfloat16
    gen = jax.jit(lambda p, img, pids: model.generate(
        p, img, pids, max_length=max_len, min_length=int(config.get("min_length", 5)),
        num_beams=num_beams, eos_id=tokenizer.sep_token_id, pad_id=tokenizer.pad_token_id,
        zs=zs, dtype=dtype, impl=impl,
    ))
    for images, image_ids in loader:
        b = len(image_ids)
        pids = jnp.asarray(np.repeat(prompt_ids, b, axis=0))
        tokens = gen(params, jnp.asarray(images), pids)
        for img_id, toks in zip(image_ids, np.asarray(tokens)):
            caption = tokenizer.decode(toks, skip_special_tokens=True)
            caption = caption[len(prompt.strip()):].strip() if caption.startswith(prompt.strip()) else caption
            results.append({"image_id": int(img_id), "caption": caption})
    return results


def main(args: Config, config: Config) -> dict:
    info = common.setup(args, config)
    tokenizer = build_tokenizer(config.get("text_encoder", ""))
    image_res = config.get("image_res", 384)
    prompt = config.get("prompt", "a picture of ")
    prompt_len = len(tokenizer([prompt])["input_ids"][0]) - 1
    config["prompt_length"] = prompt_len

    student, teacher = build_models(config)
    student.prompt_length = prompt_len
    teacher.prompt_length = prompt_len
    def load_capt(model, ckpt_path):
        return load_torch_params(
            model, ckpt_path,
            load_capt_pretrain=bool(args.get("load_capt_pretrain")))

    sparams = load_capt(student, args.get("checkpoint")) or student.init(jax.random.PRNGKey(0))
    tparams = load_capt(teacher, args.get("teacher_chkpt")) or teacher.init(jax.random.PRNGKey(1))
    l0 = build_l0(config)
    l0_params = l0.init(jax.random.PRNGKey(2))

    val_ds = CaptioningEvalDataset(config["val_file"], common.eval_transform(config, image_res), config.get("image_root", ""))
    val_loader = SimpleLoader(val_ds, batch_size=config.get("batch_size_test", 16),
                              rank=info["rank"], world_size=info["world_size"])

    if args.get("evaluate"):
        zs = (common.native_eval_gates(l0, args, config)
              if common.is_native_checkpoint(args, config)
              else l0.forward_deterministic({"loga": l0_params["loga"]}))
        results = evaluation(student, sparams, val_loader, tokenizer, config, zs=zs)
        merged = collect_result(results, "caption_result", args.get("output_dir", "/tmp"),
                                hdfs_wdir=args.get("output_hdfs", ""),
                                rank=info["rank"], world_size=info["world_size"],
                                remove_duplicate="image_id")
        return {"results": merged}

    if args.get("scst"):
        return scst_train(args, config, student, sparams, l0, l0_params,
                          tokenizer, val_loader, info, prompt, prompt_len)

    train_ds = CaptioningTrainDataset(
        config["train_file"],
        common.preprocess_transform(
            config, default=ImageTransform.train(image_res, seed=args.get("seed", 42))),
        config.get("image_root", ""), prompt=prompt, max_words=config.get("max_tokens", 30),
    )
    # per-device batch (reference per-GPU bs) × local chips
    n_dev = jax.local_device_count()
    bs = int(args.get("bs") or config.get("batch_size_train", 16)) * n_dev
    train_loader = common.maybe_parallel_loader(
        SimpleLoader(train_ds, batch_size=bs, shuffle=True, drop_last=True,
                     rank=info["rank"], world_size=info["world_size"]), config)
    epochs = int(args.get("epoch") or config.get("schedular", {}).get("epochs", 5))
    steps_per_epoch = max(len(train_loader), 1)
    l0.lagrangian_warmup = int(
        float(config.get("L0_schedular", {}).get("lagrangian_warmup_epochs", 1)) * steps_per_epoch
    )
    optimizers = common.build_optimizers(sparams, config, epochs * steps_per_epoch)
    state = init_train_state(sparams, l0_params, optimizers)

    def student_forward(params, zs, batch, rng):
        return student.forward(
            params, batch["image"], batch["caption_ids"], batch["caption_atts"],
            pad_token_id=tokenizer.pad_token_id, prompt_length=prompt_len, zs=zs,
            rng=rng, output_attentions=True, output_hidden_states=True, train=True,
        )

    def teacher_forward(params, batch, rng):
        return teacher.forward(
            params, batch["image"], batch["caption_ids"], batch["caption_atts"],
            pad_token_id=tokenizer.pad_token_id, prompt_length=prompt_len,
            rng=rng, output_attentions=True, output_hidden_states=True, train=False,
            impl=config.get("attn_impl", "fused"),  # eval-mode: fused+probs
        )

    step_fn, mesh, state = common.build_train_step(
        lambda axis_name: common.wrap_step_with_preprocess(
            make_task_train_step(
                student_forward, teacher_forward,
                lambda s, t: captioning_kd_losses(s, t, temperature=float(args.get("temperature", 1.0))),
                l0, optimizers, teacher_params=None,
                task_weight=0.7, kd_weight=0.3,  # Eff_Captioning.py:144
                axis_name=axis_name,
            ), config,
        ), config, state, with_teacher=True)

    start_epoch, resume_batches = 0, 0
    if args.get("resume") and args.get("output_dir"):
        restored = common.restore_full_state(args["output_dir"], state)
        if restored is not None:
            state, extra = restored
            start_epoch = int(extra.get("epoch", -1)) + 1
            resume_batches = int(extra.get("batches_done", 0))
            print(f"### resumed from epoch {start_epoch} (full state incl. optimizers)"
                  + (f" at batch {resume_batches}" if resume_batches else ""))

    base_rng = jax.random.PRNGKey(int(args.get("seed", 42)))
    prof = common.StepProfiler(config, args.get("output_dir", ""))
    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        rng = jax.random.fold_in(base_rng, epoch)
        logger = MetricLogger()
        def make_batch(items):
            images, captions, _ = items
            tok = tokenizer(list(captions), padding="max_length", truncation=True,
                            max_length=config.get("max_tokens", 30))
            return common.place_batch({
                "image": jnp.asarray(images),
                "caption_ids": jnp.asarray(tok["input_ids"]),
                "caption_atts": jnp.asarray(tok["attention_mask"]),
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
        results = evaluation(student, state.params, val_loader, tokenizer, config, zs=zs)
        ann_file = config.get("val_gt_file")
        metrics_out = {}
        if ann_file:
            import json

            ann = json.load(open(ann_file))
            metrics_out = coco_caption_eval(ann, results)
        common.log_stats(
            {"epoch": epoch, **metrics_out,
             **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()}},
            args.get("output_dir", ""),
        )
        common.save_training_state(
            args.get("output_dir", ""), epoch,
            {"model": state.params, "l0": {"loga": state.loga, **state.lam}, "epoch": epoch},
        )
        common.save_full_state(args.get("output_dir", ""), state, {"epoch": epoch})
    return {"state": state}


def scst_train(args, config, student, sparams, l0, l0_params, tokenizer,
               val_loader, info, prompt, prompt_len):
    """--scst fine-tune (reference Eff_Captioning.py:415 + ScstRewardCriterion,
    utils/__init__.py:16-97): device-sampled captions, host CIDEr-D
    advantage vs greedy baseline, advantage-weighted logprob update. Gates
    are frozen deterministic (SCST runs after the pruning fine-tune)."""
    from ..train.scheduler import create_scheduler
    from ..train.optim import create_optimizer
    from ..train.scst import ScstRewardCriterion, make_scst_step

    image_res = config.get("image_res", 384)
    n_dev = jax.local_device_count()
    sample_n = int(config.get("scst_sample_n", 5))
    bs = int(args.get("bs") or config.get("batch_size_train_scst",
                                          config.get("batch_size_train", 8))) * n_dev
    train_ds = CaptioningSCSTDataset(
        config["train_file"], ImageTransform.train(image_res, seed=args.get("seed", 42)),
        config.get("image_root", ""), max_words=config.get("max_tokens", 30),
        n_gts=sample_n, seed=int(args.get("seed", 42)),
    )
    train_loader = common.maybe_parallel_loader(SimpleLoader(
        train_ds, batch_size=bs, shuffle=True, drop_last=True,
        rank=info["rank"], world_size=info["world_size"], collate_fn=scst_collate,
    ), config)
    epochs = int(args.get("epoch") or config.get("schedular", {}).get("epochs", 3))
    steps_per_epoch = max(len(train_loader), 1)
    opt_cfg = config.get("optimizer", Config())
    sched = create_scheduler(
        lr=float(opt_cfg.get("lr_scst", opt_cfg.get("lr", 1e-5))),
        num_training_steps=epochs * steps_per_epoch,
        num_warmup_steps=config.get("schedular", {}).get("num_warmup_steps", 0),
    )
    optimizer = create_optimizer(
        sparams, lr=sched, weight_decay=float(opt_cfg.get("weight_decay", 0.01)),
        grad_clip=float(config.get("accelerator", {}).get("CLIP_GRAD_NORM", 1.0) or 0) or None,
    )
    zs = (l0.forward_deterministic({"loga": l0_params["loga"]})
          if float(config.get("sparsity", 0.0)) > 0 else None)
    eos_id = tokenizer.sep_token_id
    pad_id = tokenizer.pad_token_id
    max_len = int(config.get("max_length", 20))
    sample_fn, grad_step = make_scst_step(
        student, optimizer,
        prompt_length=prompt_len, pad_token_id=pad_id, eos_id=eos_id,
        sample_n=sample_n, max_length=max_len,
        min_length=int(config.get("min_length", 5)),
        top_p=float(config.get("scst_top_p", 1.0)),
        zs=zs, axis_name=common.dp_axis_name(),
    )
    sample_fn = jax.jit(sample_fn)
    grad_fn, mesh, _ = common.data_parallel_step(grad_step)
    criterion = ScstRewardCriterion(sample_n=sample_n, baseline_type="greedy")
    prompt_ids = np.asarray(tokenizer([prompt])["input_ids"])[:, :-1]

    state = (sparams, optimizer.init(sparams), jnp.asarray(0))
    base_rng = jax.random.PRNGKey(int(args.get("seed", 42)))
    start_epoch = 0
    if args.get("resume") and args.get("output_dir"):
        restored = common.restore_full_state(args["output_dir"], state)
        if restored is not None:
            state, extra = restored
            start_epoch = int(extra.get("epoch", -1)) + 1
            print(f"### scst resumed from epoch {start_epoch}")
    world = common.get_world_size()
    reward_hist = []
    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        rng = jax.random.fold_in(base_rng, epoch)
        logger = MetricLogger()
        n_batches = 0
        for images, gt_lists in logger.log_every(train_loader, 10, f"SCST Epoch: [{epoch}]"):
            b = len(gt_lists)
            rng, srng, grng = jax.random.split(rng, 3)
            pids = jnp.asarray(np.repeat(prompt_ids, b, axis=0))
            sample_toks, greedy_toks = sample_fn(state[0], jnp.asarray(images), pids, srng)
            sampled = [tokenizer.decode(t, skip_special_tokens=True)
                       for t in np.asarray(sample_toks)]
            greedy = [tokenizer.decode(t, skip_special_tokens=True)
                      for t in np.asarray(greedy_toks)]
            adv = criterion.rewards(gt_lists, sampled, greedy)
            batch = common.place_batch({
                "image": jnp.asarray(images),
                "tokens": jnp.asarray(sample_toks),
                "advantages": jnp.asarray(adv),
            }, mesh)
            state, metrics = grad_fn(state, batch, grng)
            logger.update(reward=criterion.get_score(),
                          **{k: float(v) for k, v in metrics.items()})
            reward_hist.append(criterion.get_score())
            n_batches += 1
            # preemption: epoch-granular save (the SCST loop is host-synced
            # by design — the CIDEr reward decodes every batch — so replay
            # of the interrupted epoch is the natural resume unit)
            if (common.preempted() if world == 1
                    else (n_batches % 10 == 0 and common.preempted_sync())):
                if args.get("output_dir"):
                    common.save_full_state(args["output_dir"], state,
                                           {"epoch": epoch - 1, "scst": True})
                    common.wait_for_saves()
                    common.log_stats({"preempted": True, "epoch": epoch,
                                      "scst": True}, args["output_dir"])
                print(f"### scst preempted in epoch {epoch}: state saved, exiting")
                raise SystemExit(0)
        logger.synchronize_between_processes()
        common.log_stats(
            {"epoch": epoch, "scst": True,
             **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()}},
            args.get("output_dir", ""),
        )
        common.save_full_state(args.get("output_dir", ""), state, {"epoch": epoch})
    return {"state": state, "reward_history": reward_hist}
