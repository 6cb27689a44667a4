"""CLI launcher with reference task-name parity (reference run.py).

Task router: gd_4m_small (general distillation), pretrain_4m_base /
pretrain_4m_small (plain X-VLM pretraining, no teacher),
itr_coco (Eff_Retrieval), vqa_480 (Eff_VQA), nlvr / nlvr_domain (Eff_NLVR /
NLVR domain pretrain), coco_captioning / coco_capt_domain (Eff_Captioning /
captioning domain pretrain).

Unlike the reference (which shells out to torch.distributed.launch,
run.py:41-64), drivers run in-process: JAX uses all local chips from one
process; multi-host runs launch this CLI once per host and
jax.distributed.initialize() rendezvous via env vars (MASTER_ADDR/RANK/
WORLD_SIZE or JAX_COORDINATOR_ADDRESS).
"""

from __future__ import annotations

import argparse
import os
import sys

from efficientvlm_tpu.config import Config, load_task_config

TASK_CONFIGS = {
    "gd_4m_small": "configs/Pretrain_XVLM_small_4m.yaml",
    "pretrain_4m_base": "configs/Pretrain_XVLM_base_clipvit_4m.yaml",
    "pretrain_4m_small": "configs/Pretrain_XVLM_small_4m.yaml",
    "itr_coco": "configs/x-vlm-small-ft/Retrieval_coco.yaml",
    "vqa_480": "configs/x-vlm-small-ft/VQA_480.yaml",
    "nlvr": "configs/x-vlm-small-ft/NLVR.yaml",
    "nlvr_domain": "configs/x-vlm-small-ft/NLVR_pretrain_O1.yaml",
    "coco_captioning": "configs/x-vlm-small-ft/Captioning.yaml",
    "coco_capt_domain": "configs/x-vlm-small-ft/Captioning_pretrain_O1.yaml",
    "grounding": "configs/x-vlm-small-ft/Grounding.yaml",
}


def run(args: Config, config: Config):
    task = args["task"]
    if task in ("gd_4m_small", "pretrain_4m_small", "pretrain_4m_base"):
        from efficientvlm_tpu.drivers import gd

        return gd.main(args, config)
    if task == "itr_coco":
        from efficientvlm_tpu.drivers import retrieval

        return retrieval.main(args, config)
    if task == "vqa_480":
        from efficientvlm_tpu.drivers import vqa

        return vqa.main(args, config)
    if task in ("nlvr", "nlvr_domain"):
        from efficientvlm_tpu.drivers import nlvr

        return nlvr.main(args, config)
    if task in ("coco_captioning", "coco_capt_domain"):
        from efficientvlm_tpu.drivers import captioning

        return captioning.main(args, config)
    if task == "grounding":
        from efficientvlm_tpu.drivers import grounding

        return grounding.main(args, config)
    raise ValueError(f"unknown task: {task}")


def main(argv=None):
    # The ambient TPU plugin pins jax_platforms via jax.config at interpreter
    # startup, which silently overrides env JAX_PLATFORMS=cpu (CPU smoke runs
    # with a virtual device mesh). Re-assert the env choice before any
    # backend initializes.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    # persistent XLA compile cache: repeated smoke runs (and the remote TPU
    # compiles) start from compiled programs (CLAUDE.md: enable in every
    # bench/driver entry point)
    from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    # TPU maintenance / spot eviction delivers SIGTERM with a grace window:
    # flag it so the train loops save full state at a step boundary and exit
    # cleanly — `--resume` then continues step-exact (GD: stream cursors;
    # fine-tunes: epoch + batch cursor). See drivers/common.run_train_epoch.
    from efficientvlm_tpu.drivers.common import install_preemption_handler

    install_preemption_handler()

    parser = argparse.ArgumentParser()
    parser.add_argument("--task", required=True, choices=sorted(TASK_CONFIGS))
    parser.add_argument("--config", default="", type=str)
    parser.add_argument("--model", default="x-vlm-small-ft", type=str,
                        help="fine-tune config set under configs/ (reference run.py)")
    parser.add_argument("--dist", default="", type=str,
                        help="accepted for reference-script compatibility and "
                             "ignored: drivers run in-process on all local chips; "
                             "multi-host runs launch once per host (README)")
    parser.add_argument("--output_dir", default="output", type=str)
    parser.add_argument("--checkpoint", default="", type=str)
    parser.add_argument("--teacher_chkpt", default="", type=str)
    parser.add_argument("--student_chkpt", default="", type=str,
                        help="general-distillation student init (reference run.py)")
    parser.add_argument("--load_ckpt_from", default="", type=str,
                        help="domain pre-trained params for nlvr/captioning "
                             "fine-tunes (reference run.py:97-119: implies the "
                             "matching --load_*_pretrain remap)")
    parser.add_argument("--output_hdfs", default="", type=str,
                        help="hdfs:// dir for cross-host collect_result merging "
                             "(VQA/captioning eval on hosts without a shared FS)")
    parser.add_argument("--bs", default=-1, type=int, help="global batch size")
    parser.add_argument("--epoch", default=-1, type=int)
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--sparsity", default=None, type=float)
    parser.add_argument("--lr", default=None, type=float,
                        help="override optimizer.lr (reference Eff_* mains)")
    parser.add_argument("--reg_lr", default=None, type=float,
                        help="override optimizer.reg_learning_rate (L0/λ lr)")
    parser.add_argument("--load_vqa_pretrain", action="store_true",
                        help="reference flag: load a VQA-shaped checkpoint "
                             "as-is. Accepted for parity; the VQA remap "
                             "auto-detects stored text_decoder keys")
    parser.add_argument("--temperature", default=1.0, type=float)
    parser.add_argument("--stop_prune_epoch", default=None, type=int)
    parser.add_argument("--scst", action="store_true",
                        help="Self-critical sequence training (captioning)")
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--load_nlvr_pretrain", action="store_true")
    parser.add_argument("--load_capt_pretrain", action="store_true")
    parser.add_argument("--max_steps", default=None, type=int)
    parsed = parser.parse_args(argv)

    cfg_path = parsed.config or TASK_CONFIGS[parsed.task].replace(
        "x-vlm-small-ft", parsed.model)
    repo_root = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isabs(cfg_path):
        cfg_path = os.path.join(repo_root, cfg_path)
    config = load_task_config(cfg_path, repo_root=repo_root)

    # CLI overrides merged like the reference mains (Eff_Retrieval.py:388-403)
    if parsed.bs > 0:
        config["batch_size_train"] = parsed.bs
    if parsed.epoch > 0:
        config.setdefault("schedular", Config())["epochs"] = parsed.epoch
    if parsed.sparsity is not None:
        config["sparsity"] = parsed.sparsity
    if parsed.lr is not None:
        config.setdefault("optimizer", Config())["lr"] = parsed.lr
    if parsed.reg_lr is not None:
        config.setdefault("optimizer", Config())["reg_learning_rate"] = parsed.reg_lr

    args = Config({k: v for k, v in vars(parsed).items() if v not in ("", -1, None, False)})
    # --load_ckpt_from: reference run.py fetches the domain-pretrain ckpt and
    # rewrites --checkpoint with the matching remap flag (run.py:97-119)
    if args.get("load_ckpt_from"):
        args["checkpoint"] = args["load_ckpt_from"]
        if parsed.task in ("nlvr",):
            args["load_nlvr_pretrain"] = True
        elif parsed.task in ("coco_captioning",):
            args["load_capt_pretrain"] = True
    return run(args, config)


if __name__ == "__main__":
    main()
