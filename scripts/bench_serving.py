"""Online-serving throughput/latency bench: concurrent clients against the
HTTP endpoint (efficientvlm_tpu/serving) hosting the captioning beam-decode
program.

  PYTHONPATH=.:/root/.axon_site python scripts/bench_serving.py \\
      [--checkpoint pruned.ckpt --config configs/Captioning.yaml] \\
      [--clients 8 --requests 64 --max_batch_size 16 --max_wait_ms 10]

With no --checkpoint it builds a randomly-initialized model from the tiny
synth config (pipeline shape check; meaningful numbers need a real
checkpoint + chip). Prints one JSON line: requests/s, p50/p95 latency, and
the mean coalesced batch size (the number that shows dynamic batching is
doing its job — at 1.0 the endpoint is running batch-1 MXU work).
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    from efficientvlm_tpu.utils.tunnel import tunnel_responsive

    if not tunnel_responsive():
        print("### TPU tunnel unreachable/unresponsive; falling back to CPU")
        jax.config.update("jax_platforms", "cpu")

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
from PIL import Image

from efficientvlm_tpu.config import load_task_config
from efficientvlm_tpu.serving import (
    InferenceService, make_http_server, serve_forever_in_thread,
)


def _b64_image(seed, size):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(np.uint8(rng.rand(size, size, 3) * 255))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=90)
    return base64.b64encode(buf.getvalue()).decode()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--config", default="configs/tests/Captioning_synth.yaml")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--max_batch_size", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_task_config(args.config if os.path.isabs(args.config)
                              else os.path.join(repo_root, args.config),
                              repo_root=repo_root)
    if args.checkpoint:
        service = InferenceService(
            "caption", config, checkpoint=args.checkpoint,
            max_batch_size=args.max_batch_size, max_wait_ms=args.max_wait_ms)
    else:
        from efficientvlm_tpu.drivers.captioning import build_models

        model, _ = build_models(config)
        params = model.init(jax.random.PRNGKey(0))
        service = InferenceService(
            "caption", config, params=params,
            max_batch_size=args.max_batch_size, max_wait_ms=args.max_wait_ms)
    server = make_http_server(service, "127.0.0.1", 0)
    serve_forever_in_thread(server)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    res = int(config.get("image_res", 384))
    payloads = [json.dumps({"image_b64": _b64_image(i, res)}).encode()
                for i in range(args.clients)]

    # warm every bucket the run can hit (compiles are not the bench):
    # deterministic per-bucket compiles on the service, then two HTTP
    # round-trips to warm the request path itself
    service.warmup_buckets(min(args.clients, args.max_batch_size))
    for _ in range(2):
        urllib.request.urlopen(urllib.request.Request(
            base + "/caption", data=payloads[0],
            headers={"Content-Type": "application/json"}), timeout=3000).read()

    n_done, lock = [0], threading.Lock()
    errors = []

    def client(ci):
        while True:
            with lock:
                if n_done[0] >= args.requests:
                    return
                n_done[0] += 1
            try:
                urllib.request.urlopen(urllib.request.Request(
                    base + "/caption", data=payloads[ci],
                    headers={"Content-Type": "application/json"}),
                    timeout=3000).read()
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))
                return

    service.reset_stats()  # warmup compile waits are not the bench
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    stats = service.stats()
    server.shutdown()
    service.close()
    if errors:
        print(f"### {len(errors)} client errors; first: {errors[0]}", file=sys.stderr)
    def _r(x, nd=1):
        return round(x, nd) if x is not None else None

    print(json.dumps({
        "metric": "serving_caption_requests_per_sec",
        "value": round(args.requests / dt, 2),
        "unit": "req/s",
        "clients": args.clients,
        "requests": args.requests,
        "mean_batch_size": round(stats["mean_batch_size"], 2),
        "p50_ms": _r(stats["p50_ms"]),
        "p95_ms": _r(stats["p95_ms"]),
        "queue_wait_p95_ms": _r(stats["queue_wait_p95_ms"]),
        "dispatch_mean_ms": _r(stats["dispatch_mean_ms"]),
        "finish_mean_ms": _r(stats["finish_mean_ms"]),
        "preprocess_mean_ms": _r(stats["preprocess_mean_ms"]),
        "buckets": stats["buckets"],
        "errors": len(errors),
    }))


if __name__ == "__main__":
    main()
