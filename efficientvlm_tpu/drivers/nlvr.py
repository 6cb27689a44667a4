"""Eff_NLVR driver: stage-2 NLVR2 pruning fine-tune with KD; eval=accuracy
(reference Eff_NLVR.py). Also NLVR domain pretrain (NLVR_pretrain.py) via
main(pretrain=True) using the text-pair 3-way head is left to the task
config (cls head size)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import NLVRDataset, SimpleLoader
from ..data.tokenizer import build_tokenizer
from ..data.transforms import ImageTransform
from ..evaluation.grounding import nlvr_accuracy
from ..models.model_nlvr import XVLMForNLVR
from ..pruning.l0_module import NLVRL0Module
from ..train.steps import init_train_state, make_task_train_step, nlvr_kd_losses
from ..utils import MetricLogger
from . import common


def build_models(config: Config):
    vcfg, tcfg = common.model_configs(config)
    tv, tt = common.teacher_configs(config)
    return XVLMForNLVR(vcfg, tcfg, config), XVLMForNLVR(tv, tt, config)


def build_l0(config: Config) -> NLVRL0Module:
    vcfg, tcfg = common.model_configs(config)
    return NLVRL0Module(
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


def evaluate(model, params, loader, tokenizer, config: Config, *, zs=None, dtype=None) -> float:
    preds, targets = [], []
    impl = config.get("attn_impl", "fused")
    if dtype is None and config.get("compute_dtype", "bf16") == "bf16":
        dtype = jnp.bfloat16
    fwd = jax.jit(lambda p, img, ti, ta, tg: model.forward(
        p, img, ti, ta, tg, train=False, zs=zs, dtype=dtype, impl=impl))
    for image0, image1, sentences, labels in loader:
        tok = tokenizer(list(sentences), padding="max_length", truncation=True,
                        max_length=config.get("max_tokens", 40))
        images = jnp.concatenate([jnp.asarray(image0), jnp.asarray(image1)], axis=0)
        logits = fwd(params, images, jnp.asarray(tok["input_ids"]),
                     jnp.asarray(tok["attention_mask"]), jnp.asarray(labels))
        preds.append(np.asarray(logits))
        targets.append(np.asarray(labels))
    return nlvr_accuracy(np.concatenate(preds), np.concatenate(targets))


def main(args: Config, config: Config) -> dict:
    info = common.setup(args, config)
    tokenizer = build_tokenizer(config.get("text_encoder", ""))
    image_res = config.get("image_res", 384)
    tform_train = common.preprocess_transform(
        config, default=ImageTransform.train(image_res, seed=args.get("seed", 42)))
    tform_test = common.eval_transform(config, image_res)

    student, teacher = build_models(config)

    def load_nlvr(model, ckpt_path):
        import os as _os
        from ..train import checkpoint as ckpt_io

        if not (ckpt_path and _os.path.exists(ckpt_path)):
            return None
        sd = ckpt_io.load_torch_state_dict(ckpt_path)
        loaded = ckpt_io.nlvr_params_from_state_dict(
            sd, vision_layers=model.vision_cfg["num_hidden_layers"],
            text_layers=model.base_text_cfg["num_hidden_layers"],
            fusion_layer=model.base_text_cfg["fusion_layer"],
            num_patches=model.vision_cfg.num_patches,
            load_nlvr_pretrain=bool(args.get("load_nlvr_pretrain")),
        )
        if "cls_head" not in loaded:  # from-scratch task head
            loaded["cls_head"] = model.init(jax.random.PRNGKey(9))["cls_head"]
        return loaded

    sparams = load_nlvr(student, args.get("checkpoint")) or student.init(jax.random.PRNGKey(0))
    tparams = load_nlvr(teacher, args.get("teacher_chkpt")) or teacher.init(jax.random.PRNGKey(1))
    l0 = build_l0(config)
    l0_params = l0.init(jax.random.PRNGKey(2))

    val_ds = NLVRDataset(config["val_file"], tform_test, config.get("image_root", ""))
    val_loader = SimpleLoader(val_ds, batch_size=config.get("batch_size_test", 16))
    test_ds = NLVRDataset(config["test_file"], tform_test, config.get("image_root", ""))
    test_loader = SimpleLoader(test_ds, batch_size=config.get("batch_size_test", 16))

    if args.get("evaluate"):
        zs = (common.native_eval_gates(l0, args, config)
              if common.is_native_checkpoint(args, config)
              else l0.forward_deterministic({"loga": l0_params["loga"]}))
        acc = evaluate(student, sparams, test_loader, tokenizer, config, zs=zs)
        common.log_stats({"test_acc": acc}, args.get("output_dir", ""))
        return {"test_acc": acc}

    train_ds = NLVRDataset(config["train_file"], tform_train, config.get("image_root", ""))
    # per-device batch (reference per-GPU bs) × local chips
    n_dev = jax.local_device_count()
    bs = int(args.get("bs") or config.get("batch_size_train", 16)) * n_dev
    train_loader = common.maybe_parallel_loader(SimpleLoader(
        train_ds, batch_size=bs, shuffle=True, drop_last=True,
        rank=info["rank"], world_size=info["world_size"],
    ), config)
    epochs = int(args.get("epoch") or config.get("schedular", {}).get("epochs", 10))
    steps_per_epoch = max(len(train_loader), 1)
    l0.lagrangian_warmup = int(
        float(config.get("L0_schedular", {}).get("lagrangian_warmup_epochs", 1)) * steps_per_epoch
    )
    optimizers = common.build_optimizers(sparams, config, epochs * steps_per_epoch,
                                         init_param_paths=("cls_head",))
    state = init_train_state(sparams, l0_params, optimizers)

    fusion_s = student.num_text_layers

    # the two images travel as separate batch keys so the data axis shards
    # example-aligned blocks; the [2b]-stacked layout the model consumes is
    # rebuilt per shard inside the step
    def student_forward(params, zs, batch, rng):
        images = jnp.concatenate([batch["image0"], batch["image1"]], axis=0)
        return student.forward(
            params, images, batch["text_ids"], batch["text_atts"], batch["targets"],
            zs=zs, rng=rng, train=True, output_attentions=True, output_hidden_states=True,
        )

    def teacher_forward(params, batch, rng):
        images = jnp.concatenate([batch["image0"], batch["image1"]], axis=0)
        return teacher.forward(
            params, images, batch["text_ids"], batch["text_atts"], batch["targets"],
            # teacher runs in eval mode (no dropout) so KD targets are
            # deterministic — reference teacher is .eval() (Eff_NLVR.py);
            # eval-mode forwards take the fused probs-emitting kernel path
            rng=rng, train=False, output_attentions=True, output_hidden_states=True,
            impl=config.get("attn_impl", "fused"),
        )

    step_fn, mesh, state = common.build_train_step(
        lambda axis_name: common.wrap_step_with_preprocess(
            make_task_train_step(
                student_forward, teacher_forward,
                lambda s, t: nlvr_kd_losses(s, t, fusion_layer_s=fusion_s,
                                            temperature=float(args.get("temperature", 1.0))),
                l0, optimizers, teacher_params=None,
                task_weight=0.8, kd_weight=0.2,  # Eff_NLVR.py:150
                axis_name=axis_name,
            ), config, image_keys=("image0", "image1"),
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

    best, best_epoch = 0.0, 0
    base_rng = jax.random.PRNGKey(int(args.get("seed", 42)))
    prof = common.StepProfiler(config, args.get("output_dir", ""))
    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        rng = jax.random.fold_in(base_rng, epoch)
        logger = MetricLogger()
        def make_batch(items):
            image0, image1, sentences, labels = items
            tok = tokenizer(list(sentences), padding="max_length", truncation=True,
                            max_length=config.get("max_tokens", 40))
            return common.place_batch({
                "image0": jnp.asarray(image0),
                "image1": jnp.asarray(image1),
                "text_ids": jnp.asarray(tok["input_ids"]),
                "text_atts": jnp.asarray(tok["attention_mask"]),
                "targets": jnp.asarray(labels),
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
        val_acc = evaluate(student, state.params, val_loader, tokenizer, config, zs=zs)
        common.log_stats(
            {"epoch": epoch, "val_acc": val_acc,
             **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()}},
            args.get("output_dir", ""),
        )
        common.save_full_state(args.get("output_dir", ""), state, {"epoch": epoch})
        if val_acc >= best:
            best, best_epoch = val_acc, epoch
            common.save_training_state(
                args.get("output_dir", ""), "best",
                {"model": state.params, "l0": {"loga": state.loga, **state.lam}, "epoch": epoch},
            )
    return {"best_epoch": best_epoch, "best_acc": best, "state": state}
