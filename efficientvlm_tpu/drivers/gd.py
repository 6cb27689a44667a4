"""GeneralDistill driver: stage-1 general distillation pretrain
(reference GeneralDistill.py): teacher(12L/12L) -> student(6L/6L) over the
sharded image-text JSONL stream, with region-batch interleave, 0.6/0.4
task/KD loss mix, step-based checkpointing + resume."""

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
from ..train.steps import make_gd_train_step
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

    student, teacher = build_models(config)
    sparams = common.maybe_load_params(
        student, args, config, lambda: student.init(jax.random.PRNGKey(0), with_bbox_head=True)
    )
    tparams = common.maybe_load_params(
        teacher, Config({"checkpoint": args.get("teacher_chkpt")}), Config(),
        lambda: teacher.init(jax.random.PRNGKey(1), with_bbox_head=True),
    )

    general_ds = PretrainImageTextDataset(
        config, config["train_file"], tokenizer,
        rank=info["rank"], world_size=info["world_size"], repeat=True,
        seed=int(args.get("seed", 42)),
    )
    region_ds = None
    iter_perc = 0.0
    if config.get("train_file_regions"):
        region_ds = RegionTextDataset(
            config, config["train_file_regions"], tokenizer,
            rank=info["rank"], world_size=info["world_size"], repeat=True,
            seed=int(args.get("seed", 42)),
        )
        iter_perc = float(config.get("regions", {}).get("iter_perc", 0.5))

    epochs = int(config.get("schedular", {}).get("epochs", 41))
    steps_per_epoch = config.get("train_dataset_size", 10000) // max(
        config.get("images", {}).get("batch_size", 128) * info["world_size"], 1
    )
    total_steps = epochs * steps_per_epoch
    optimizer, _, _ = common.build_optimizers(sparams, config, total_steps)
    opt_state = optimizer.init(sparams)
    start_step = 0

    # resume (GeneralDistill.py:512-520)
    if args.get("resume") and args.get("output_dir"):
        latest = ckpt_io.Checkpointer(args["output_dir"]).load_latest()
        if latest is not None:
            sparams = latest["model"]
            start_step = int(latest.get("step", 0))
            print(f"### resumed from step {start_step}")

    temperature = float(args.get("temperature", 1.0))
    general_step = jax.jit(make_gd_train_step(
        student, teacher, optimizer, teacher_params=tparams, temperature=temperature,
    ))
    region_step = jax.jit(make_gd_train_step(
        student, teacher, optimizer, teacher_params=tparams, temperature=temperature,
        with_bbox=True,
    )) if region_ds is not None else None

    state = (sparams, opt_state, jnp.asarray(start_step))
    rng = jax.random.PRNGKey(int(args.get("seed", 42)) + info["rank"])
    host_rng = np.random.default_rng(int(args.get("seed", 42)))
    ckpt_freq = int(config.get("ckpt_frequent_step", 10000))
    max_steps = int(args.get("max_steps") or total_steps)

    logger = MetricLogger()
    general_iter = iter(general_ds.batches())
    region_iter = iter(region_ds.batches(config.get("regions", {}).get("max_images", 48))) if region_ds else None

    def steps():
        for i in range(start_step, max_steps):
            yield i

    for step in logger.log_every(steps(), 50, "GD Train:", total=max_steps - start_step):
        rng, srng = jax.random.split(rng)
        use_region = region_iter is not None and host_rng.random() < iter_perc
        if use_region:
            batch = {k: jnp.asarray(v) for k, v in next(region_iter).items()}
            state, metrics = region_step(state, batch, srng)
        else:
            batch = {k: jnp.asarray(v) for k, v in next(general_iter).items()}
            state, metrics = general_step(state, batch, srng)
        logger.update(**{k: float(v) for k, v in metrics.items()})
        if (step + 1) % ckpt_freq == 0 and get_rank() == 0 and args.get("output_dir"):
            ckpt_io.Checkpointer(args["output_dir"]).save_checkpoint(
                step + 1, {"model": state[0], "step": step + 1},
                training_states={"model": state[0], "step": step + 1},
            )
            common.log_stats(
                {"step": step + 1,
                 **{f"train_{k}": f"{m.global_avg:.5f}" for k, m in logger.meters.items()}},
                args["output_dir"],
            )
    if get_rank() == 0 and args.get("output_dir"):
        ckpt_io.Checkpointer(args["output_dir"]).save_checkpoint(
            "final", {"model": state[0], "step": max_steps},
            training_states={"model": state[0], "step": max_steps},
        )
    return {"state": state}
