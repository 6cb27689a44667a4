"""End-to-end driver smoke tests on synthetic data (1 epoch, tiny dims)."""

import base64
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig


def tiny_config(tmp_path, **extra):
    cfg = Config.from_dict({
        "vision": VisionConfig.create(
            vision_width=32, num_attention_heads=4, intermediate_size=64,
            num_hidden_layers=2, image_res=32, patch_size=8, local_attn_depth=1,
        ),
        "text": TextConfig.create(
            vocab_size=200, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=64, encoder_width=32, max_position_embeddings=48,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        "teacher_vision": VisionConfig.create(
            vision_width=32, num_attention_heads=4, intermediate_size=64,
            num_hidden_layers=4, image_res=32, patch_size=8,
        ),
        "teacher_text": TextConfig.create(
            vocab_size=200, hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=64, encoder_width=32, max_position_embeddings=48,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        "image_res": 32,
        "patch_size": 8,
        "embed_dim": 16,
        "temp": 0.07,
        "max_tokens": 12,
        "text_encoder": "",  # fallback WordPiece tokenizer
        "batch_size_train": 2,  # per-device; ×8 local devices = host batch 16
        "batch_size_test": 4,
        "batch_size_test_text": 8,
        "k_test": 4,
        "sparsity": 0.2,
        "optimizer": {"lr": 1e-3, "reg_learning_rate": 0.05, "weight_decay": 0.01, "lr_mult": 1},
        "schedular": {"epochs": 1, "num_warmup_steps": 0},
        "L0_schedular": {"lagrangian_warmup_epochs": 1},
    })
    cfg.update(extra)
    return cfg


def write_images(dirpath, n):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(np.uint8(rng.rand(40, 40, 3) * 255)).save(os.path.join(dirpath, f"{i}.jpg"))


@pytest.fixture()
def args(tmp_path):
    return Config({"seed": 1, "output_dir": str(tmp_path / "out"), "epoch": 1})


def test_retrieval_driver(tmp_path, args):
    from efficientvlm_tpu.drivers import retrieval

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    train_ann = [{"image": f"{i}.jpg", "caption": f"a dog photo {i}", "image_id": f"im{i}"} for i in range(16)]
    eval_ann = [{"image": f"{i}.jpg", "caption": [f"a dog {i}", f"photo {i}"]} for i in range(4)]
    json.dump(train_ann, open(tmp_path / "train.json", "w"))
    json.dump(eval_ann, open(tmp_path / "val.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "train.json")],
        val_file=str(tmp_path / "val.json"),
        test_file=str(tmp_path / "val.json"),
        image_root=img_root,
    )
    out = retrieval.main(args, cfg)
    assert "best_r_mean" in out and 0 <= out["best_r_mean"] <= 100
    assert os.path.exists(os.path.join(args["output_dir"], "log.txt"))


def test_nlvr_driver(tmp_path, args):
    from efficientvlm_tpu.drivers import nlvr

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    ann = [{"images": [f"{i}.jpg", f"{(i+1) % 16}.jpg"], "sentence": f"two images {i}",
            "label": "True" if i % 2 else "False"} for i in range(16)]
    json.dump(ann, open(tmp_path / "nlvr.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "nlvr.json")],
        val_file=str(tmp_path / "nlvr.json"),
        test_file=str(tmp_path / "nlvr.json"),
        image_root=img_root,
    )
    out = nlvr.main(args, cfg)
    assert 0 <= out["best_acc"] <= 100


def test_captioning_driver(tmp_path, args):
    from efficientvlm_tpu.drivers import captioning

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    train_ann = [{"image": f"{i}.jpg", "caption": f"a dog in photo {i}", "image_id": f"im{i}"} for i in range(16)]
    eval_ann = [{"image": f"COCO_val_00000{i}.jpg"} for i in range(4)]
    # eval images must exist under image_root with those names
    for i in range(4):
        Image.fromarray(np.uint8(np.random.rand(40, 40, 3) * 255)).save(
            os.path.join(img_root, f"COCO_val_00000{i}.jpg"))
    json.dump(train_ann, open(tmp_path / "ct.json", "w"))
    json.dump(eval_ann, open(tmp_path / "cv.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "ct.json")],
        val_file=str(tmp_path / "cv.json"),
        image_root=img_root,
        prompt="a picture of ",
        label_smoothing=0.1,
        num_beams=2,
        max_length=8,
        min_length=2,
        max_tokens=12,
    )
    out = captioning.main(args, cfg)
    assert "state" in out


def test_vqa_driver(tmp_path, args):
    from efficientvlm_tpu.drivers import vqa

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    train_ann = [{"image": f"{i}.jpg", "question": f"what is in photo {i}?",
                  "answer": ["dog", "dog"], "question_id": i} for i in range(16)]
    test_ann = [{"image": f"{i}.jpg", "question": f"what is this {i}?", "question_id": i}
                for i in range(4)]
    json.dump(train_ann, open(tmp_path / "vt.json", "w"))
    json.dump(test_ann, open(tmp_path / "vv.json", "w"))
    json.dump(["dog", "cat", "two", "red"], open(tmp_path / "ans.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "vt.json")],
        test_file=[str(tmp_path / "vv.json")],
        answer_list=str(tmp_path / "ans.json"),
        vqa_root=img_root,
        num_dec_layers=2,
        teacher_num_dec_layers=2,
        k_test=2,
    )
    out = vqa.main(args, cfg)
    assert "state" in out

    # eval path
    args2 = Config({**args, "evaluate": True, "output_dir": str(tmp_path / "out2")})
    res = vqa.main(args2, cfg)
    assert len(res["results"]) == 4
    assert all("answer" in r for r in res["results"])


def test_gd_driver(tmp_path, args):
    from efficientvlm_tpu.drivers import gd

    # tiny base64 pretrain stream
    rows = []
    rng = np.random.RandomState(0)
    for i in range(12):
        img = Image.fromarray(np.uint8(rng.rand(32, 32, 3) * 255))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        rows.append({"binary": base64.b64encode(buf.getvalue()).decode(),
                     "caption": f"a photo of dog number {i}"})
    os.makedirs(tmp_path / "pt", exist_ok=True)
    with open(tmp_path / "pt" / "part0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "pt")],
        train_file_regions=None,
        train_dataset_size=12,
        images={"image_key": "binary", "is_image_rpath": False, "caption_key": "caption",
                "batch_size": 1},  # per-device; host stream batch = 8
        max_words=12, max_masks=3, mask_prob=0.25,
        ckpt_frequent_step=2,
    )
    args = Config({**args, "max_steps": 3})
    out = gd.main(args, cfg)
    assert int(out["state"][2]) == 3
    # checkpoint written
    assert os.path.exists(os.path.join(args["output_dir"], "training_state_latest.ckpt"))


def test_gd_driver_device_preprocess(tmp_path, args):
    """device_preprocess: host ships uint8; crop/flip/RandAugment/normalize
    run inside the jitted (sharded) train step."""
    import base64
    import io

    from efficientvlm_tpu.drivers import gd

    rows = []
    rng = np.random.RandomState(0)
    for i in range(12):
        from PIL import Image as PILImage

        img = PILImage.fromarray(np.uint8(rng.rand(40, 40, 3) * 255))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        rows.append({"binary": base64.b64encode(buf.getvalue()).decode(),
                     "caption": f"a photo of dog number {i}"})
    os.makedirs(tmp_path / "pt", exist_ok=True)
    with open(tmp_path / "pt" / "part0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "pt")],
        train_file_regions=None,
        train_dataset_size=12,
        images={"image_key": "binary", "is_image_rpath": False, "caption_key": "caption",
                "batch_size": 1},
        max_words=12, max_masks=3, mask_prob=0.25,
        ckpt_frequent_step=10,
        device_preprocess=True,
    )
    args = Config({**args, "max_steps": 2})
    out = gd.main(args, cfg)
    assert int(out["state"][2]) == 2


def test_grounding_driver(tmp_path, args):
    """Grounding: bbox fine-tune + IoU eval (the reference leaves this task
    driverless; here it is a full stage-2-shaped driver)."""
    from efficientvlm_tpu.drivers import grounding

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    train_ann = [{"image": f"{i}.jpg", "text": f"the dog number {i}",
                  "bbox": [5, 5, 20, 20], "ref_id": i} for i in range(16)]
    json.dump(train_ann, open(tmp_path / "gt.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "gt.json")],
        test_file=[str(tmp_path / "gt.json")],
        image_root=img_root,
        max_tokens=12,
        sparsity=0.0,
    )
    out = grounding.main(args, cfg)
    assert "state" in out

    # eval path with accuracy scoring
    ref_boxes = {str(i): {"bbox": [5, 5, 20, 20], "split": "val"} for i in range(16)}
    json.dump(ref_boxes, open(tmp_path / "refs.json", "w"))
    cfg["ref_boxes"] = str(tmp_path / "refs.json")
    args2 = Config({**args, "evaluate": True, "output_dir": str(tmp_path / "out2")})
    res = grounding.main(args2, cfg)
    assert len(res["results"]) == 16
    assert "val" in res and 0.0 <= res["val"] <= 100.0


def test_retrieval_driver_device_preprocess(tmp_path, args):
    """Stage-2 driver with the in-graph image pipeline: host ships uint8."""
    from efficientvlm_tpu.drivers import retrieval

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    train_ann = [{"image": f"{i}.jpg", "caption": f"a dog photo {i}", "image_id": f"im{i}"} for i in range(16)]
    eval_ann = [{"image": f"{i}.jpg", "caption": [f"a dog {i}"]} for i in range(4)]
    json.dump(train_ann, open(tmp_path / "train.json", "w"))
    json.dump(eval_ann, open(tmp_path / "val.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "train.json")],
        val_file=str(tmp_path / "val.json"),
        test_file=str(tmp_path / "val.json"),
        image_root=img_root,
        device_preprocess=True,
    )
    out = retrieval.main(args, cfg)
    assert "best_r_mean" in out


def test_nlvr_driver_device_preprocess(tmp_path, args):
    from efficientvlm_tpu.drivers import nlvr

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    ann = [{"images": [f"{i}.jpg", f"{(i+1) % 16}.jpg"], "sentence": f"two images {i}",
            "label": "True" if i % 2 else "False"} for i in range(16)]
    json.dump(ann, open(tmp_path / "nlvr.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "nlvr.json")],
        val_file=str(tmp_path / "nlvr.json"),
        test_file=str(tmp_path / "nlvr.json"),
        image_root=img_root,
        device_preprocess=True,
    )
    out = nlvr.main(args, cfg)
    assert 0 <= out["best_acc"] <= 100


def test_retrieval_driver_zero1(tmp_path, args):
    """`zero1: true` routes through common.build_train_step's pjit path:
    the 3 optimizers' moments live SHARDED over 'data' (parallel/zero.py)
    while training, eval, full-state checkpointing, and resume all behave
    like the shard_map DP path."""
    from efficientvlm_tpu.drivers import retrieval

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    train_ann = [{"image": f"{i}.jpg", "caption": f"a dog photo {i}", "image_id": f"im{i}"} for i in range(16)]
    eval_ann = [{"image": f"{i}.jpg", "caption": [f"a dog {i}", f"photo {i}"]} for i in range(4)]
    json.dump(train_ann, open(tmp_path / "train.json", "w"))
    json.dump(eval_ann, open(tmp_path / "val.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "train.json")],
        val_file=str(tmp_path / "val.json"),
        test_file=str(tmp_path / "val.json"),
        image_root=img_root,
        zero1=True,
    )
    out = retrieval.main(args, cfg)
    assert "best_r_mean" in out and 0 <= out["best_r_mean"] <= 100
    assert os.path.exists(os.path.join(args["output_dir"], "training_state_latest.ckpt"))


def test_retrieval_driver_split_kd_step(tmp_path, args):
    """`split_kd_step: true` routes the driver through the two-program KD
    step (separate teacher/student jits, each its own shard_map over
    'data') — the production configuration for compile-heavy graphs."""
    from efficientvlm_tpu.drivers import retrieval

    img_root = str(tmp_path / "imgs")
    write_images(img_root, 16)
    train_ann = [{"image": f"{i}.jpg", "caption": f"a dog photo {i}", "image_id": f"im{i}"} for i in range(16)]
    eval_ann = [{"image": f"{i}.jpg", "caption": [f"a dog {i}", f"photo {i}"]} for i in range(4)]
    json.dump(train_ann, open(tmp_path / "train.json", "w"))
    json.dump(eval_ann, open(tmp_path / "val.json", "w"))
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "train.json")],
        val_file=str(tmp_path / "val.json"),
        test_file=str(tmp_path / "val.json"),
        image_root=img_root,
        split_kd_step=True,
    )
    out = retrieval.main(args, cfg)
    assert "best_r_mean" in out and 0 <= out["best_r_mean"] <= 100


def test_plain_pretrain_driver(tmp_path, args):
    """pretrain_4m_small/base: the gd driver with NO teacher and no KD
    (reference run.py:201-208 -> Pretrain.py). Loss = ITC+ITM+MLM only."""
    import base64
    import io

    from PIL import Image as PILImage

    from efficientvlm_tpu.drivers import gd

    rows = []
    rng = np.random.RandomState(0)
    for i in range(12):
        img = PILImage.fromarray(np.uint8(rng.rand(32, 32, 3) * 255))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        rows.append({"binary": base64.b64encode(buf.getvalue()).decode(),
                     "caption": f"a photo of dog number {i}"})
    os.makedirs(tmp_path / "pt", exist_ok=True)
    with open(tmp_path / "pt" / "part0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "pt")],
        train_file_regions=None,
        train_dataset_size=12,
        images={"image_key": "binary", "is_image_rpath": False, "caption_key": "caption",
                "batch_size": 1},
        max_words=12, max_masks=3, mask_prob=0.25,
        ckpt_frequent_step=2,
    )
    args = Config({**args, "max_steps": 2, "task": "pretrain_4m_small"})
    out = gd.main(args, cfg)
    assert int(out["state"][2]) == 2
    assert os.path.exists(os.path.join(args["output_dir"], "training_state_latest.ckpt"))


def test_gd_driver_region_interleave(tmp_path, args):
    """GD with a region stream: bbox/GIoU losses through the grouped-batch
    region step (with_bbox=True), interleaved with general steps."""
    import base64
    import io

    from PIL import Image as PILImage

    from efficientvlm_tpu.drivers import gd

    rng = np.random.RandomState(0)

    def write_stream(path, with_elems):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "part0.jsonl"), "w") as f:
            for i in range(12):
                img = PILImage.fromarray(np.uint8(rng.rand(64, 64, 3) * 255))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                row = {"binary": base64.b64encode(buf.getvalue()).decode(),
                       "caption": f"a photo of dog number {i}"}
                if with_elems:
                    row["elems"] = [{"bb": [4, 4, 28, 28], "caption": "a dog"},
                                    {"bb": [24, 24, 36, 36], "caption": ["the cat"],
                                     "attributes": "small"}]
                f.write(json.dumps(row) + "\n")

    write_stream(str(tmp_path / "pt"), with_elems=False)
    write_stream(str(tmp_path / "ptr"), with_elems=True)
    cfg = tiny_config(
        tmp_path,
        train_file=[str(tmp_path / "pt")],
        train_file_regions=[str(tmp_path / "ptr")],
        train_dataset_size=12,
        images={"image_key": "binary", "is_image_rpath": False, "caption_key": "caption",
                "batch_size": 1},
        regions={"image_key": "binary", "is_image_rpath": False, "caption_key": "caption",
                 "iter_perc": 1.0, "batch_size": 1, "max_images": 1, "max_regions": 3,
                 "min_perc_in_image": 0.5},
        # the TEACHER forwards region batches too: it needs local attention
        # as well (reference teacher config_clipvitB has local_attn_depth 2)
        teacher_vision=VisionConfig.create(
            vision_width=32, num_attention_heads=4, intermediate_size=64,
            num_hidden_layers=4, image_res=32, patch_size=8, local_attn_depth=1,
        ),
        max_words=12, max_masks=3, mask_prob=0.25,
        ckpt_frequent_step=10,
    )
    args = Config({**args, "max_steps": 2, "seed": 3})
    out = gd.main(args, cfg)
    assert int(out["state"][2]) == 2
