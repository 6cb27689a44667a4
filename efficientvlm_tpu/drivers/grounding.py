"""Visual-grounding driver: bbox-regression fine-tune + RefCOCO+-style eval.

The reference ships the grounding models and datasets but never wires a
driver (models/model_grounding.py, efficient_models/model_grounding.py are
vestigial); this driver completes the task family with the same shape as the
other stage-2 drivers: data-parallel jitted step (bbox L1 + GIoU loss,
models/xvlm.py:587-612), optional L0 gates at a sparsity target, per-epoch
eval via grounding_eval_bbox, full-state checkpointing + resume."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import GroundingBboxDataset, SimpleLoader
from ..data.tokenizer import build_tokenizer
from ..data.transforms import ImageTransform
from ..evaluation.grounding import grounding_eval_bbox
from ..models.model_grounding import XVLMForGrounding
from ..pruning.l0_module import XVLML0Module
from ..train.steps import init_train_state, make_task_train_step
from ..utils import MetricLogger
from . import common


def build_models(config: Config):
    vcfg, tcfg = common.model_configs(config)
    tv, tt = common.teacher_configs(config)
    return XVLMForGrounding(vcfg, tcfg, config), XVLMForGrounding(tv, tt, config)


def build_l0(config: Config) -> XVLML0Module:
    vcfg, tcfg = common.model_configs(config)
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
        target_sparsity=float(config.get("sparsity", 0.0)),
        # head pairs (128 lanes at head_dim 64): export never re-pads
        head_group=int(config.get("head_gate_group", 1)),
    )


def evaluate(model, params, loader, tokenizer, config: Config, *, zs=None, dtype=None):
    """Predict boxes for the eval split; returns [{'ref_id','pred'}]."""
    impl = config.get("attn_impl", "fused")
    if dtype is None and config.get("compute_dtype", "bf16") == "bf16":
        dtype = jnp.bfloat16
    fwd = jax.jit(lambda p, img, ti, ta: model.forward(
        p, img, ti, ta, train=False, zs=zs, dtype=dtype, impl=impl))
    results = []
    for images, captions, ref_ids, widths, heights in loader:
        tok = tokenizer(list(captions), padding="max_length", truncation=True,
                        max_length=config.get("max_tokens", 30))
        coords = fwd(params, jnp.asarray(images), jnp.asarray(tok["input_ids"]),
                     jnp.asarray(tok["attention_mask"]))
        for rid, c, w, h in zip(ref_ids, np.asarray(coords), widths, heights):
            results.append({"ref_id": int(rid), "pred": [float(v) for v in c],
                            "width": int(w), "height": int(h)})
    return results


def main(args: Config, config: Config) -> dict:
    info = common.setup(args, config)
    tokenizer = build_tokenizer(config.get("text_encoder", ""))
    image_res = config.get("image_res", 384)

    student, teacher = build_models(config)
    sparams = common.maybe_load_params(student, args, config, lambda: student.init(jax.random.PRNGKey(0), with_bbox_head=True))
    l0 = build_l0(config)
    l0_params = l0.init(jax.random.PRNGKey(2))

    test_ds = GroundingBboxDataset(
        config["test_file"], common.eval_transform(config, image_res), config.get("image_root", ""),
        image_res=image_res, mode="test",
    )
    test_loader = SimpleLoader(test_ds, batch_size=config.get("batch_size_test", 16),
                               rank=info["rank"], world_size=info["world_size"])

    if args.get("evaluate"):
        zs = (common.native_eval_gates(l0, args, config)
              if common.is_native_checkpoint(args, config)
              else l0.forward_deterministic({"loga": l0_params["loga"]}))
        results = evaluate(student, sparams, test_loader, tokenizer, config, zs=zs)
        metrics = {}
        if config.get("ref_boxes"):
            import json as _json

            gt = _json.load(open(config["ref_boxes"]))
            metrics = grounding_eval_bbox(
                results, {int(k): v["bbox"] for k, v in gt.items()},
                {int(k): v.get("split", "val") for k, v in gt.items()},
            )
        return {"results": results, **metrics}

    train_ds = GroundingBboxDataset(
        config["train_file"], ImageTransform.box(image_res, seed=args.get("seed", 42)),
        config.get("image_root", ""), image_res=image_res, mode="train",
        careful_hflip=bool(config.get("careful_hflip", True)), seed=args.get("seed", 42),
    )
    n_dev = jax.local_device_count()
    bs = int(args.get("bs") or config.get("batch_size_train", 16)) * n_dev
    train_loader = common.maybe_parallel_loader(
        SimpleLoader(train_ds, batch_size=bs, shuffle=True, drop_last=True,
                     rank=info["rank"], world_size=info["world_size"]), config)
    epochs = int(args.get("epoch") or config.get("schedular", {}).get("epochs", 10))
    steps_per_epoch = max(len(train_loader), 1)
    l0.lagrangian_warmup = int(
        float(config.get("L0_schedular", {}).get("lagrangian_warmup_epochs", 1)) * steps_per_epoch
    )
    optimizers = common.build_optimizers(sparams, config, epochs * steps_per_epoch)
    state = init_train_state(sparams, l0_params, optimizers)

    def student_forward(params, zs, batch, rng):
        loss_bbox, loss_giou = student.forward(
            params, batch["image"], batch["text_ids"], batch["text_atts"],
            target_bbox=batch["target_bbox"], zs=zs, rng=rng, train=True,
        )
        return {"loss": loss_bbox + loss_giou,
                "loss_bbox": loss_bbox, "loss_giou": loss_giou,
                # the generic task step calls kd_fn(student, teacher); no KD
                # for grounding (the reference has no grounding KD recipe)
                }

    def teacher_forward(params, batch, rng):
        return {}

    step_fn, mesh, _ = common.data_parallel_step(make_task_train_step(
        student_forward, teacher_forward,
        lambda s, t: {"loss_kd": jnp.zeros(())},
        l0, optimizers, teacher_params={},
        task_weight=1.0, kd_weight=0.0,
        axis_name=common.dp_axis_name(),
    ), with_teacher=True)

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
            images, captions, targets = items
            tok = tokenizer(list(captions), padding="max_length", truncation=True,
                            max_length=config.get("max_tokens", 30))
            return common.place_batch({
                "image": jnp.asarray(images),
                "text_ids": jnp.asarray(tok["input_ids"]),
                "text_atts": jnp.asarray(tok["attention_mask"]),
                "target_bbox": jnp.asarray(np.stack(targets)),
            }, mesh)

        state = common.run_train_epoch(
            train_loader, logger, step_fn, state, rng, make_batch, prof,
            epoch=epoch, output_dir=args.get("output_dir", ""),
            teacher_params={},
            resume_batches=resume_batches if epoch == start_epoch else 0,
            header=f"Train Epoch: [{epoch}]",
        )
        prof.close()
        logger.synchronize_between_processes()
        common.log_stats(
            {"epoch": epoch, **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()}},
            args.get("output_dir", ""),
        )
        common.save_full_state(args.get("output_dir", ""), state, {"epoch": epoch})
    return {"state": state}
