"""Data pipeline tests: masking, sharding, tokenizer, transforms, datasets."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from efficientvlm_tpu.data.jsonl import ShardedJsonlDataset, split_shard
from efficientvlm_tpu.data.masking import TextMaskingGenerator
from efficientvlm_tpu.data.tokenizer import WordPieceTokenizer, build_tokenizer, make_test_vocab
from efficientvlm_tpu.data.transforms import CLIP_MEAN, CLIP_STD, ImageTransform, normalize
from efficientvlm_tpu.data.utils import pre_caption, pre_question
from efficientvlm_tpu.data import datasets as DS


def test_split_shard_disjoint_cover():
    files = [f"f{i}" for i in range(10)]
    shards = [split_shard(files, r, 3) for r in range(3)]
    assert sum(len(s) for s in shards) == 10
    assert sorted(sum(shards, [])) == sorted(files)


def test_sharded_jsonl_reader(tmp_path):
    for fi in range(4):
        with open(tmp_path / f"part{fi}.jsonl", "w") as f:
            for li in range(3):
                f.write(json.dumps({"file": fi, "line": li}) + "\n")
            if fi == 1:
                f.write("BROKEN LINE{{{\n")
    ds = ShardedJsonlDataset(str(tmp_path), rank=0, world_size=2, shuffle=False, repeat=False)
    rows = list(ds)
    assert len(rows) == 6  # 2 of 4 files, broken line skipped

    # two ranks cover everything exactly once
    ds1 = ShardedJsonlDataset(str(tmp_path), rank=1, world_size=2, shuffle=False, repeat=False)
    all_rows = rows + list(ds1)
    assert len(all_rows) == 12

    # resume: cursor state round-trips
    ds2 = ShardedJsonlDataset(str(tmp_path), rank=0, world_size=2, shuffle=False, repeat=False)
    it = iter(ds2)
    first3 = [next(it) for _ in range(3)]
    state = ds2.state_dict()
    ds3 = ShardedJsonlDataset(str(tmp_path), rank=0, world_size=2, shuffle=False, repeat=False)
    ds3.load_state_dict(state)
    rest = list(ds3)
    assert first3 + rest == rows


def test_wordpiece_tokenizer():
    tok = build_tokenizer("nonexistent/path")
    assert isinstance(tok, WordPieceTokenizer)
    ids = tok("a picture of a dog", max_length=12)["input_ids"]
    assert ids.shape[0] == 1
    toks = tok.convert_ids_to_tokens(ids[0])
    assert toks[0] == "[CLS]" and "[SEP]" in toks
    assert tok.decode(ids[0]) == "a picture of a dog"

    batch = tok(["a dog", "two people standing"], padding="max_length", max_length=10)
    assert batch["input_ids"].shape == (2, 10)
    assert batch["attention_mask"].sum(1).tolist() == [4, 5]


def test_masking_generator():
    tok = build_tokenizer("nonexistent/path")
    gen = TextMaskingGenerator(tok, mask_prob=0.25, mask_max=4, seed=0)
    tokens = ["[CLS]"] + tok.tokenize("a picture of a dog standing")
    masked, pos = gen(tokens)
    assert len(masked) == len(tokens)
    assert 1 <= len(pos) <= 4
    assert 0 not in pos  # CLS never masked
    # at least some positions became [MASK] over many draws
    n_mask = 0
    for _ in range(50):
        m, p = gen(list(tokens))
        n_mask += sum(1 for i in p if m[i] == "[MASK]")
    assert n_mask > 20


def test_pre_caption_question():
    assert pre_caption("A Man, riding-a horse!", 30) == "a man riding a horse"
    assert pre_question("What's THE colour?", 30) == "what s the colour"
    assert pre_caption("a " * 40, 5).count(" ") == 4
    with pytest.raises(ValueError):
        pre_caption("!!!", 10)


def test_transforms_and_normalize(tmp_path):
    img = Image.fromarray(np.uint8(np.random.RandomState(0).rand(64, 48, 3) * 255))
    out = ImageTransform.train(32, seed=0)(img)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    out_test = ImageTransform.test(32)(img)
    assert out_test.shape == (32, 32, 3)
    # normalize inverse check
    x = np.full((4, 4, 3), 128, np.uint8)
    n = normalize(x)
    np.testing.assert_allclose(n[0, 0], (128 / 255 - CLIP_MEAN) / CLIP_STD, rtol=1e-5)


def _write_img(path):
    Image.fromarray(np.uint8(np.random.rand(40, 40, 3) * 255)).save(path)


def test_retrieval_and_vqa_datasets(tmp_path):
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    for i in range(3):
        _write_img(tmp_path / "imgs" / f"{i}.jpg")
    ann = [
        {"image": f"{i}.jpg", "caption": f"a dog number {i}", "image_id": f"im{i}"}
        for i in range(3)
    ]
    json.dump(ann, open(tmp_path / "train.json", "w"))
    ds = DS.RetrievalTrainDataset([str(tmp_path / "train.json")], ImageTransform.train(32, seed=0), str(tmp_path / "imgs"))
    img, cap, idx = ds[0]
    assert img.shape == (32, 32, 3) and cap.startswith("a dog") and idx == 0

    loader = DS.SimpleLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0][0].shape == (2, 32, 32, 3)

    # eval dataset mapping
    ann_eval = [
        {"image": f"{i}.jpg", "caption": [f"cap a {i}", f"cap b {i}"]} for i in range(3)
    ]
    json.dump(ann_eval, open(tmp_path / "val.json", "w"))
    ev = DS.RetrievalEvalDataset(str(tmp_path / "val.json"), ImageTransform.test(32), str(tmp_path / "imgs"))
    assert len(ev.text) == 6 and ev.txt2img[3] == 1 and ev.img2txt[2] == [4, 5]

    # vqa collate
    vqa_ann = [
        {"image": f"{i}.jpg", "question": f"what is {i}?", "answer": ["dog", "dog", "cat"], "question_id": i}
        for i in range(2)
    ]
    json.dump(vqa_ann, open(tmp_path / "vqa.json", "w"))
    vds = DS.VQADataset([str(tmp_path / "vqa.json")], ImageTransform.train_wohflip(32, seed=0), str(tmp_path / "imgs"), seed=0)
    images, questions, answers, weights, k_index = DS.vqa_collate([vds[0], vds[1]])
    assert images.shape == (2, 32, 32, 3)
    # 2 unique answers per question, padded to a multiple of 8 with
    # zero-weight rows (static jit shapes)
    assert len(answers) == 8
    np.testing.assert_array_equal(k_index[:4], [0, 0, 1, 1])
    np.testing.assert_allclose(weights[:4], [2 / 3, 1 / 3, 2 / 3, 1 / 3])
    assert weights[4:].sum() == 0


def test_pretrain_stream(tmp_path):
    import base64, io

    tok = build_tokenizer("nonexistent/path")
    # build a tiny base64-image jsonl
    rows = []
    for i in range(6):
        img = Image.fromarray(np.uint8(np.random.rand(32, 32, 3) * 255))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        rows.append({"binary": base64.b64encode(buf.getvalue()).decode(),
                     "caption": f"a photo of dog {i}"})
    with open(tmp_path / "pt.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = {
        "images": {"image_key": "binary", "is_image_rpath": False, "caption_key": "caption", "batch_size": 3},
        "max_tokens": 12, "max_words": 12, "max_masks": 3, "mask_prob": 0.25,
        "image_res": 32,
    }
    ds = DS.PretrainImageTextDataset(cfg, str(tmp_path / "pt.jsonl"), tok, repeat=False, seed=0)
    batch = next(ds.batches())
    assert batch["image"].shape == (3, 32, 32, 3)
    assert batch["text_ids"].shape == (3, 12)
    assert batch["masked_pos"].shape == (3, 3)
    assert (batch["masked_ids"] >= -100).all()


def test_collect_result_hdfs_wdir(tmp_path):
    """--output_hdfs flow (reference dataset/utils.py collect_result with
    hdfs_wdir): ranks publish through the shared store, rank 0 pulls every
    rank's file back before merging. Simulated with two rank-local dirs and
    a local path as the 'hdfs' store (io.hcopy shells to cp for local)."""
    from efficientvlm_tpu.data.utils import collect_result

    store = tmp_path / "store"
    dir0, dir1 = tmp_path / "rank0", tmp_path / "rank1"
    for d in (store, dir0, dir1):
        d.mkdir()

    # rank 1 on its own host: writes locally + publishes to the store
    out1 = collect_result([{"id": 2, "v": "b"}], "res", str(dir1),
                          hdfs_wdir=str(store), rank=1, world_size=2)
    assert out1 is None  # non-zero ranks return None
    # rank 0 on a DIFFERENT host: its local dir lacks rank 1's file
    merged = collect_result([{"id": 1, "v": "a"}], "res", str(dir0),
                            hdfs_wdir=str(store), rank=0, world_size=2,
                            save_result=True)
    assert merged.endswith("res.json")
    data = json.load(open(merged))
    assert sorted(d["id"] for d in data) == [1, 2]
    assert (store / "res.json").exists()  # merged result published too


def test_grounding_dataset_modes(tmp_path):
    """Train mode yields a DENSE per-image idx (same image -> same idx, the
    ITC soft-label key — ref grounding_dataset, grounding_dataset.py:27-52);
    eval mode yields ref_id."""
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    for i in range(2):
        _write_img(tmp_path / "imgs" / f"{i}.jpg")
    ann = [
        {"image": "0.jpg", "text": "a red ball", "ref_id": 101},
        {"image": "0.jpg", "text": "the red ball", "ref_id": 102},
        {"image": "1.jpg", "text": "a blue cube", "ref_id": 103},
    ]
    json.dump(ann, open(tmp_path / "g.json", "w"))

    ds = DS.GroundingDataset([str(tmp_path / "g.json")],
                             ImageTransform.train(32, seed=0),
                             str(tmp_path / "imgs"), mode="train")
    idxs = [ds[i][2] for i in range(3)]
    assert idxs[0] == idxs[1] and idxs[0] != idxs[2]  # dense per-image
    assert sorted(set(idxs)) == [0, 1]

    ev = DS.GroundingDataset([str(tmp_path / "g.json")],
                             ImageTransform.test(32),
                             str(tmp_path / "imgs"), mode="eval")
    assert [ev[i][2] for i in range(3)] == [101, 102, 103]
