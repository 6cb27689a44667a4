"""Offline batch-inference CLI (scripts/infer.py): caption a folder of
images end-to-end from (a) a native params-only export and (b) a reference
torch-layout `.th` checkpoint (imported via the task-specific
captioning remap — reference EffXVLMForCaptioning.load_pretrained)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from efficientvlm_tpu.config import load_task_config
from efficientvlm_tpu.drivers import common
from efficientvlm_tpu.models.model_generation import XVLMForCaptioning
from efficientvlm_tpu.train import checkpoint as ckpt_io

CONFIG = "configs/tests/Captioning_synth.yaml"


def _make_images(d, n=3):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            os.path.join(d, f"img_{i}.jpg"))
    # non-image clutter the CLI must skip, not crash on
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("not an image")
    os.makedirs(os.path.join(d, "subdir"), exist_ok=True)
    return n


def _run_infer(ckpt, images_dir, out_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/infer.py"),
         "--task", "caption", "--checkpoint", ckpt, "--config", CONFIG,
         "--images", images_dir, "--out", out_path, "--batch_size", "4"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    with open(out_path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def capt_params():
    config = load_task_config(os.path.join(REPO, CONFIG), repo_root=REPO)
    vcfg, tcfg = common.model_configs(config)
    model = XVLMForCaptioning(vcfg, tcfg, config)
    return model, model.init(jax.random.PRNGKey(0)), config


def test_infer_caption_native_ckpt(tmp_path, capt_params):
    _, params, _ = capt_params
    n = _make_images(str(tmp_path / "imgs"))
    ckpt = str(tmp_path / "export.ckpt")
    ckpt_io.save_pytree(ckpt, params)  # params-only export -> dense program
    results = _run_infer(ckpt, str(tmp_path / "imgs"), str(tmp_path / "out.json"))
    assert len(results) == n
    assert all(set(r) == {"image", "caption"} for r in results)


def test_infer_vqa_native_ckpt(tmp_path):
    from efficientvlm_tpu.drivers.vqa import build_models

    config = load_task_config(os.path.join(REPO, "configs/tests/VQA_synth.yaml"),
                              repo_root=REPO)
    student, _ = build_models(config)
    ckpt = str(tmp_path / "export.ckpt")
    ckpt_io.save_pytree(ckpt, student.init(jax.random.PRNGKey(0)))
    _make_images(str(tmp_path / "imgs"), n=2)
    reqs = [{"image": "img_0.jpg", "question": "what color is it?"},
            {"image": "img_1.jpg", "question": "how many dogs?"}]
    with open(tmp_path / "reqs.json", "w") as f:
        json.dump(reqs, f)
    answers = ["red", "blue", "two", "none"]
    with open(tmp_path / "answers.json", "w") as f:
        json.dump(answers, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/infer.py"),
         "--task", "vqa", "--checkpoint", ckpt,
         "--config", "configs/tests/VQA_synth.yaml",
         "--requests", str(tmp_path / "reqs.json"),
         "--answer_list", str(tmp_path / "answers.json"),
         "--image_root", str(tmp_path / "imgs"),
         "--out", str(tmp_path / "out.json")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    with open(tmp_path / "out.json") as f:
        results = json.load(f)
    assert len(results) == 2
    assert all(res["answer"] in answers for res in results)


def test_infer_caption_torch_th(tmp_path, capt_params):
    import torch

    from efficientvlm_tpu.models.xvlm import XVLM

    model, _, config = capt_params
    n = _make_images(str(tmp_path / "imgs"))
    # reference-layout state dict (pretrain XVLM keys); the captioning remap
    # copies the text encoder into text_decoder on import
    xvlm = XVLM(model.vision_cfg, model.text_cfg, config)
    sd = ckpt_io.xvlm_state_dict_from_params(
        xvlm.init(jax.random.PRNGKey(1)),
        fusion_layer=model.text_cfg["fusion_layer"])
    ckpt = str(tmp_path / "ref.th")
    torch.save({"model": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}}, ckpt)
    results = _run_infer(ckpt, str(tmp_path / "imgs"), str(tmp_path / "out.json"))
    assert len(results) == n
    assert all(r["caption"] is not None for r in results)
