"""Generate the synthetic datasets used by configs/tests/*_synth.yaml
(CLI smoke runs on machines with no COCO/VQA data).

Usage: python scripts/make_synth_data.py [--root /tmp] [--n 16]
"""

import argparse
import json
import os

import numpy as np
from PIL import Image

WORDS = "dog cat tree car house bird boat sky park road table chair".split()


def write_images(dirpath, n, rng):
    os.makedirs(dirpath, exist_ok=True)
    for i in range(n):
        Image.fromarray(np.uint8(rng.rand(40, 40, 3) * 255)).save(
            os.path.join(dirpath, f"{i}.jpg"))


def caption(rng, i):
    return f"a {WORDS[int(rng.randint(len(WORDS)))]} photo number {i}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp")
    ap.add_argument("--n", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.RandomState(0)

    # ITR
    d = os.path.join(args.root, "synth_itr")
    write_images(os.path.join(d, "imgs"), args.n, rng)
    train = [{"image": f"{i}.jpg", "caption": caption(rng, i), "image_id": f"im{i}"}
             for i in range(args.n)]
    val = [{"image": f"{i}.jpg", "caption": [caption(rng, i), caption(rng, i + 100)]}
           for i in range(args.n // 2)]
    json.dump(train, open(os.path.join(d, "train.json"), "w"))
    json.dump(val, open(os.path.join(d, "val.json"), "w"))

    # VQA
    d = os.path.join(args.root, "synth_vqa")
    write_images(os.path.join(d, "imgs"), args.n, rng)
    train = [{"image": f"{i}.jpg", "question": f"what is in photo {i}?",
              "answer": ["dog", "dog"], "question_id": i} for i in range(args.n)]
    test = [{"image": f"{i}.jpg", "question": f"what is this {i}?", "question_id": i}
            for i in range(args.n // 2)]
    json.dump(train, open(os.path.join(d, "train.json"), "w"))
    json.dump(test, open(os.path.join(d, "test.json"), "w"))
    json.dump(["dog", "cat", "two", "red"], open(os.path.join(d, "answers.json"), "w"))

    # NLVR
    d = os.path.join(args.root, "synth_nlvr")
    write_images(os.path.join(d, "imgs"), args.n, rng)
    ann = [{"images": [f"{i}.jpg", f"{(i + 1) % args.n}.jpg"],
            "sentence": f"two images {i}", "label": "True" if i % 2 else "False"}
           for i in range(args.n)]
    json.dump(ann, open(os.path.join(d, "ann.json"), "w"))

    # Pretrain JSONL stream (base64-embedded images, one dir of shards)
    import base64
    import io

    d = os.path.join(args.root, "synth_pt")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part0.jsonl"), "w") as f:
        for i in range(args.n):
            img = Image.fromarray(np.uint8(rng.rand(40, 40, 3) * 255))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            f.write(json.dumps({"binary": base64.b64encode(buf.getvalue()).decode(),
                                "caption": caption(rng, i)}) + "\n")

    # Captioning
    d = os.path.join(args.root, "synth_capt")
    write_images(os.path.join(d, "imgs"), args.n, rng)
    train = [{"image": f"{i}.jpg", "caption": caption(rng, i), "image_id": f"im{i}"}
             for i in range(args.n)]
    val = [{"image": f"{i}.jpg"} for i in range(args.n // 2)]
    json.dump(train, open(os.path.join(d, "train.json"), "w"))
    json.dump(val, open(os.path.join(d, "val.json"), "w"))

    # Pretrain REGION stream (base64 images + per-element bboxes/captions,
    # the RegionTextJsonDataset format for GD region interleave)
    d = os.path.join(args.root, "synth_pt_regions")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part0.jsonl"), "w") as f:
        for i in range(args.n):
            img = Image.fromarray(np.uint8(rng.rand(64, 64, 3) * 255))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            f.write(json.dumps({
                "binary": base64.b64encode(buf.getvalue()).decode(),
                "caption": caption(rng, i),
                "elems": [
                    {"bb": [4, 4, 28, 28], "caption": f"a {WORDS[i % len(WORDS)]}"},
                    {"bb": [24, 24, 36, 36],
                     "caption": [f"the {WORDS[(i + 1) % len(WORDS)]}"],
                     "attributes": "small"},
                ],
            }) + "\n")

    # Grounding
    d = os.path.join(args.root, "synth_ground")
    write_images(os.path.join(d, "imgs"), args.n, rng)
    ann = [{"image": f"{i}.jpg", "text": f"the {WORDS[i % len(WORDS)]} number {i}",
            "bbox": [5, 5, 20, 20], "ref_id": i} for i in range(args.n)]
    json.dump(ann, open(os.path.join(d, "ann.json"), "w"))
    json.dump({str(i): {"bbox": [5, 5, 20, 20], "split": "val"} for i in range(args.n)},
              open(os.path.join(d, "refs.json"), "w"))

    print(f"synthetic data written under {args.root}/synth_*")


if __name__ == "__main__":
    main()
