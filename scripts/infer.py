"""Offline batch inference from an exported checkpoint (serving CLI).

Loads any native checkpoint — dense, physically pruned, or int8-quantized
(scripts/export_pruned.py) — or a torch `.th`, and runs the inference unit
of the chosen task on ad-hoc inputs:

  caption: generate captions for a folder (or list) of images
    python scripts/infer.py --task caption --checkpoint pruned.ckpt \
        --config configs/tests/Captioning_synth.yaml --images /path/to/imgs \
        --out captions.json

  vqa: answer (image, question) pairs from a JSONL/JSON file with keys
    {"image": ..., "question": ...} ranked over --answer_list
    python scripts/infer.py --task vqa --checkpoint pruned.ckpt \
        --config configs/tests/VQA_synth.yaml --requests q.json \
        --answer_list answers.json --image_root imgs/ --out answers.json

The compute path is the drivers' eval unit (beam generate / k-way answer
rank) on bf16 with the configured attention impl; a params-only export runs
the dense program, snapshots apply their stored deterministic gates
(drivers/common.native_eval_gates semantics).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu
else:
    # On the tunneled TPU backend a downed relay makes jax.devices() HANG
    # (it retries forever) — probe first and fail loudly instead.
    from efficientvlm_tpu.utils.tunnel import tunnel_responsive

    if not tunnel_responsive():
        raise SystemExit(
            "TPU tunnel (127.0.0.1:8083) is unreachable or wedged (port may accept while RPCs hang); jax.devices() would "
            "hang. Re-run with JAX_PLATFORMS=cpu or restore the relay.")

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.config import load_task_config
from efficientvlm_tpu.data.tokenizer import build_tokenizer
from efficientvlm_tpu.data.transforms import ImageTransform
from efficientvlm_tpu.data.datasets import load_transformed


def _load_images(paths, transform, image_root=""):
    return jnp.asarray(np.stack([
        np.asarray(load_transformed(transform, p, is_path=True, image_root=image_root))
        for p in paths
    ]))


_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp")


def _load_params_and_gates(model, l0, ckpt_path, torch_loader):
    """Load a checkpoint ONCE and return (params, eval zs).

    Native .ckpt (dense snapshot / physical export / full training state):
    one msgpack read yields both the model tree and the stored gates
    (deterministic masks when trained log-alphas are present, None for
    gate-free trees — reference load_pruned_model semantics). A torch
    `.th`/HF `.bin` goes through the task-specific driver remap (the
    generic XVLM pretrain remap has no text_decoder subtree)."""
    from efficientvlm_tpu.train import checkpoint as ckpt_io

    if not os.path.exists(ckpt_path):
        raise SystemExit(f"--checkpoint not found: {ckpt_path}")
    if ckpt_path.endswith(".ckpt"):
        params, gates = ckpt_io.extract_model_and_gates(ckpt_io.load_params(ckpt_path))
        zs = (l0.forward_deterministic({"loga": gates["loga"]})
              if gates is not None else None)
        return params, zs
    params = torch_loader(model, ckpt_path)
    if params is None:
        raise SystemExit(f"could not import torch checkpoint: {ckpt_path}")
    return params, None


def _batches(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=["caption", "vqa"])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", required=True, help="task YAML (model geometry)")
    ap.add_argument("--images", default="", help="caption: dir or comma list of images")
    ap.add_argument("--requests", default="", help="vqa: JSON/JSONL of {image, question}")
    ap.add_argument("--answer_list", default="", help="vqa: JSON list of answers")
    ap.add_argument("--image_root", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_task_config(args.config if os.path.isabs(args.config)
                              else os.path.join(repo_root, args.config),
                              repo_root=repo_root)
    tokenizer = build_tokenizer(config.get("text_encoder", ""))
    image_res = int(config.get("image_res", 384))
    transform = ImageTransform.test(image_res)
    impl = config.get("attn_impl", "fused")
    dtype = jnp.bfloat16 if config.get("compute_dtype", "bf16") == "bf16" else None

    results = []
    if args.task == "caption":
        from efficientvlm_tpu.drivers.captioning import (
            build_l0, build_models, load_torch_params)

        model, _ = build_models(config)
        params, zs = _load_params_and_gates(
            model, build_l0(config), args.checkpoint, load_torch_params)
        prompt = config.get("prompt", "a picture of ")
        prompt_ids = tokenizer([prompt])["input_ids"][:, :-1]
        model.prompt_length = prompt_ids.shape[1]
        gen = jax.jit(lambda p, img, pids: model.generate(
            p, img, pids, max_length=int(config.get("max_length", 20)),
            min_length=int(config.get("min_length", 5)),
            num_beams=int(config.get("num_beams", 3)),
            eos_id=tokenizer.sep_token_id, pad_id=tokenizer.pad_token_id,
            zs=zs, dtype=dtype, impl=impl))
        if os.path.isdir(args.images):
            paths = sorted(
                p for p in os.listdir(args.images)
                if p.lower().endswith(_IMAGE_EXTS)
                and os.path.isfile(os.path.join(args.images, p)))
            root = args.images
        else:
            paths, root = [p for p in args.images.split(",") if p], args.image_root
        for chunk in _batches(paths, args.batch_size):
            imgs = _load_images(chunk, transform, root)
            pids = jnp.asarray(np.repeat(prompt_ids, len(chunk), axis=0))
            toks = np.asarray(gen(params, imgs, pids))
            for p, t in zip(chunk, toks):
                cap = tokenizer.decode(t, skip_special_tokens=True)
                cap = cap[len(prompt.strip()):].strip() if cap.startswith(prompt.strip()) else cap
                results.append({"image": p, "caption": cap})
    else:  # vqa
        from efficientvlm_tpu.drivers.vqa import (
            build_l0, build_models, load_torch_params)

        model, _ = build_models(config)
        params, zs = _load_params_and_gates(
            model, build_l0(config), args.checkpoint, load_torch_params)
        answers = json.load(open(args.answer_list or config["answer_list"]))
        ans_tok = tokenizer([a + "[SEP]" for a in answers], padding="longest",
                            truncation=True, max_length=20)
        k = min(int(config.get("k_test", 128)), len(answers))
        fwd = jax.jit(lambda p, img, qi, qa: model.forward_eval(
            p, img, qi, qa, jnp.asarray(ans_tok["input_ids"]),
            jnp.asarray(ans_tok["attention_mask"]), k=k, zs=zs, dtype=dtype, impl=impl))
        text = open(args.requests).read().strip()
        reqs = json.loads(text) if text.startswith("[") else [
            json.loads(l) for l in text.splitlines() if l.strip()]
        for chunk in _batches(reqs, args.batch_size):
            imgs = _load_images([r["image"] for r in chunk], transform, args.image_root)
            tok = tokenizer([r["question"] for r in chunk], padding="max_length",
                            truncation=True, max_length=int(config.get("max_tokens", 40)))
            topk_ids, _ = fwd(params, imgs, jnp.asarray(tok["input_ids"]),
                              jnp.asarray(tok["attention_mask"]))
            for r, aid in zip(chunk, np.asarray(topk_ids)[:, 0]):
                results.append({**r, "answer": answers[int(aid)]})

    out = json.dumps(results, ensure_ascii=False, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
        print(f"wrote {len(results)} results to {args.out}")
    else:
        print(out)


if __name__ == "__main__":
    main()
