"""GeneralDistill driver: stage-1 general distillation pretrain
(reference GeneralDistill.py): teacher(12L/12L) -> student(6L/6L) over the
sharded image-text JSONL stream, with region-batch interleave, 0.6/0.4
task/KD loss mix, step-based checkpointing + resume.

Also serves PLAIN X-VLM pretraining — no teacher, no KD (reference
run.py:201-208 pretrain_4m_base / pretrain_4m_small -> Pretrain.py) — when
the task name starts with "pretrain": same stream/region interleave and
checkpointing, the step is make_pretrain_train_step."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import PretrainImageTextDataset, RegionTextDataset
from ..data.tokenizer import build_tokenizer
from ..models.model_pretrain import XVLMForPretrain
from ..train import checkpoint as ckpt_io
from ..train.steps import make_gd_train_step, make_pretrain_train_step
from ..utils import MetricLogger
from ..utils.dist import get_rank
from . import common


def build_models(config: Config):
    vcfg, tcfg = common.model_configs(config)
    tv, tt = common.teacher_configs(config)
    return XVLMForPretrain(vcfg, tcfg, config), XVLMForPretrain(tv, tt, config)


def main(args: Config, config: Config) -> dict:
    info = common.setup(args, config)
    tokenizer = build_tokenizer(config.get("text_encoder", ""))

    # pretrain_* tasks run the SAME loop without a teacher (ref Pretrain.py)
    distill = not str(args.get("task", "gd_4m_small")).startswith("pretrain")
    if distill:
        student, teacher = build_models(config)
    else:
        vcfg, tcfg = common.model_configs(config)
        student, teacher = XVLMForPretrain(vcfg, tcfg, config), None
    # --student_chkpt (reference run.py GD launch) takes precedence over the
    # generic --checkpoint for the student tower
    student_args = args
    if args.get("student_chkpt"):
        student_args = Config({**args.to_dict(), "checkpoint": args["student_chkpt"]})
    sparams = common.maybe_load_params(
        student, student_args, config, lambda: student.init(jax.random.PRNGKey(0), with_bbox_head=True)
    )
    tparams = common.maybe_load_params(
        teacher, Config({"checkpoint": args.get("teacher_chkpt")}), Config(),
        lambda: teacher.init(jax.random.PRNGKey(1), with_bbox_head=True),
    ) if distill else None

    # per-device batch (reference per-GPU bs, Pretrain_XVLM_small_4m.yaml
    # images.batch_size=128) × local chips = this host's stream batch
    n_dev = jax.local_device_count()
    # device_preprocess: host decodes to uint8 only; crop/flip/RandAugment/
    # normalize compile into the train step (BASELINE north star)
    device_preprocess = bool(config.get("device_preprocess"))
    transform = None
    if device_preprocess:
        from ..data.transforms import ImageTransform

        transform = ImageTransform.uint8(config.get("image_res", 224))
    general_ds = PretrainImageTextDataset(
        config, config["train_file"], tokenizer,
        rank=info["rank"], world_size=info["world_size"], repeat=True,
        seed=int(args.get("seed", 42)), transform=transform,
    )
    general_ds.batch_size *= n_dev
    region_ds = None
    iter_perc = 0.0
    if config.get("train_file_regions"):
        region_ds = RegionTextDataset(
            config, config["train_file_regions"], tokenizer,
            rank=info["rank"], world_size=info["world_size"], repeat=True,
            seed=int(args.get("seed", 42)),
        )
        region_ds.batch_size *= n_dev
        iter_perc = float(config.get("regions", {}).get("iter_perc", 0.5))

    epochs = int(config.get("schedular", {}).get("epochs", 41))
    steps_per_epoch = config.get("train_dataset_size", 10000) // max(
        config.get("images", {}).get("batch_size", 128) * n_dev * info["world_size"], 1
    )
    total_steps = epochs * steps_per_epoch
    optimizer, _, _ = common.build_optimizers(sparams, config, total_steps)
    opt_state = optimizer.init(sparams)
    start_step = 0

    state = (sparams, opt_state, jnp.asarray(start_step))
    # resume (GeneralDistill.py:512-520) — full state incl. optimizer moments
    # AND the data-stream cursors (deterministic mid-epoch resume the
    # reference lacks; ShardedJsonlDataset.state_dict)
    if args.get("resume") and args.get("output_dir"):
        restored = common.restore_full_state(args["output_dir"], state)
        if restored is not None:
            state, extra = restored
            start_step = int(extra.get("step", 0))
            def _restore_stream(stream, st):
                stream.load_state_dict({
                    "epoch": int(st["epoch"]),
                    "cursor": [int(st["file"]), int(st["line"])],
                })

            if "general_stream" in extra:
                _restore_stream(general_ds.stream, extra["general_stream"])
            if region_ds is not None and "region_stream" in extra:
                _restore_stream(region_ds.stream, extra["region_stream"])
            print(f"### resumed from step {start_step} (full state incl. optimizer)")

    temperature = float(args.get("temperature", 1.0))
    axis = common.dp_axis_name()

    def with_device_preprocess(step):
        if not device_preprocess:
            return step
        from ..data.device_pipeline import preprocess_train

        image_res = int(config.get("image_res", 224))

        def wrapped(state, batch, rng, teacher_params=None):
            prng, srng = jax.random.split(rng)
            batch = dict(batch)
            batch["image"] = preprocess_train(prng, batch["image"], image_res)
            return step(state, batch, srng, teacher_params)

        return wrapped

    def make_step(**kw):
        if distill:
            return make_gd_train_step(student, teacher, optimizer, teacher_params=None,
                                      temperature=temperature, axis_name=axis, **kw)
        return make_pretrain_train_step(student, optimizer, axis_name=axis, **kw)

    general_step, mesh, _ = common.data_parallel_step(
        with_device_preprocess(make_step()), with_teacher=True)
    region_step = common.data_parallel_step(
        make_step(with_bbox=True), with_teacher=True)[0] if region_ds is not None else None

    # rank-independent: rng rides the jitted shard_map as a REPLICATED input
    # (P() spec) — every process must supply the same value, and the step's
    # per-shard fold_in(axis_index) already decorrelates device shards.
    base_rng = jax.random.PRNGKey(int(args.get("seed", 42)))
    ckpt_freq = int(config.get("ckpt_frequent_step", 10000))
    max_steps = int(args.get("max_steps") or total_steps)
    seed = int(args.get("seed", 42))

    logger = MetricLogger()
    prof = common.StepProfiler(config, args.get("output_dir", ""))
    general_iter = iter(general_ds.batches())
    region_iter = iter(region_ds.batches(
        config.get("regions", {}).get("max_images", 48) * n_dev, n_shards=n_dev,
    )) if region_ds else None

    def steps():
        for i in range(start_step, max_steps):
            yield i

    # training starts: release any checkpoint-sized host tree the load
    # memo still pins (params are on device)
    ckpt_io.clear_load_memo()

    def _stream_extra():
        def _stream_state(stream):
            sd = stream.state_dict()
            return {"epoch": sd["epoch"], "file": sd["cursor"][0], "line": sd["cursor"][1]}

        extra = {"general_stream": _stream_state(general_ds.stream)}
        if region_ds is not None:
            extra["region_stream"] = _stream_state(region_ds.stream)
        return extra

    pending = None  # previous step's metrics, fetched one step late so
    # host batch prep (JSONL decode) overlaps device compute
    for step in logger.log_every(steps(), 50, "GD Train:", total=max_steps - start_step):
        # step-keyed rng + region-choice so a resumed run continues the
        # exact stochastic stream of the uninterrupted one
        srng = jax.random.fold_in(base_rng, step)
        use_region = region_iter is not None and (
            np.random.default_rng((seed, step)).random() < iter_perc
        )
        if use_region:
            batch = common.place_batch({k: jnp.asarray(v) for k, v in next(region_iter).items()}, mesh)
            state, metrics = region_step(state, batch, srng, tparams)
        else:
            batch = common.place_batch({k: jnp.asarray(v) for k, v in next(general_iter).items()}, mesh)
            state, metrics = general_step(state, batch, srng, tparams)
        prof.tick(metrics)
        if pending is not None:
            logger.update(**{k: float(v) for k, v in pending.items()})
        pending = metrics
        # preemption (SIGTERM grace window): save the step-exact full state
        # incl. stream cursors and exit — --resume continues mid-stream.
        # Multi-process ranks agree collectively on a 50-step cadence.
        if (common.preempted() if info["world_size"] == 1
                else ((step + 1) % 50 == 0 and common.preempted_sync())):
            if pending is not None:  # lag-1 fetch owes the last metrics
                logger.update(**{k: float(v) for k, v in pending.items()})
                pending = None
            if args.get("output_dir"):
                common.save_full_state(args["output_dir"], state,
                                       {"step": step + 1, **_stream_extra()})
                common.wait_for_saves()
                common.log_stats({"preempted": True, "step": step + 1},
                                 args["output_dir"])
            print(f"### preempted at step {step + 1}: full state saved, exiting cleanly")
            raise SystemExit(0)
        if (step + 1) % ckpt_freq == 0 and args.get("output_dir"):
            if get_rank() == 0:
                ckpt_io.Checkpointer(
                    args["output_dir"],
                    keep_last=config.get("ckpt_keep_last"),
                ).save_checkpoint(step + 1, {"model": state[0], "step": step + 1})
            # background: the periodic full-state write (GBs at real scale)
            # overlaps the next ckpt_freq steps instead of stalling them
            common.save_full_state(args["output_dir"], state,
                                   {"step": step + 1, **_stream_extra()},
                                   background=True)
            common.log_stats(
                {"step": step + 1,
                 **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()}},
                args["output_dir"],
            )
    if pending is not None:
        logger.update(**{k: float(v) for k, v in pending.items()})
    prof.close()
    if args.get("output_dir"):
        if get_rank() == 0:
            ckpt_io.Checkpointer(args["output_dir"]).save_checkpoint(
                "final", {"model": state[0], "step": max_steps},
            )
        common.save_full_state(args["output_dir"], state, {"step": max_steps})
    return {"state": state}
