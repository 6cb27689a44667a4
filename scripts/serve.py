"""Online model serving: HTTP endpoint with dynamic request batching.

  python scripts/serve.py --task caption --checkpoint pruned.ckpt \\
      --config configs/tests/Captioning_synth.yaml --port 8000

  curl -s localhost:8000/caption -d '{"image_b64": "'"$(base64 -w0 img.jpg)"'"}'
  curl -s localhost:8000/health ; curl -s localhost:8000/stats

Accepts every checkpoint shape the offline CLI does (dense / gated snapshot
/ pruned / int8 export / torch .th). Requests decode+preprocess on their
own HTTP thread; the device runs coalesced power-of-two batches on one
worker (efficientvlm_tpu/serving). SIGTERM shuts down cleanly.
"""

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu
else:
    from efficientvlm_tpu.utils.tunnel import tunnel_responsive

    if not tunnel_responsive():
        raise SystemExit(
            "TPU tunnel (127.0.0.1:8083) is unreachable or wedged (port may accept while RPCs hang); jax.devices() would "
            "hang. Re-run with JAX_PLATFORMS=cpu or restore the relay.")

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from efficientvlm_tpu.config import load_task_config
from efficientvlm_tpu.serving import InferenceService, make_http_server


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=["caption", "vqa"])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", required=True, help="task YAML (model geometry)")
    ap.add_argument("--answer_list", default="", help="vqa: JSON list of answers")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch_size", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_task_config(args.config if os.path.isabs(args.config)
                              else os.path.join(repo_root, args.config),
                              repo_root=repo_root)
    if args.answer_list:
        config["answer_list"] = args.answer_list

    print(f"### building {args.task} service from {args.checkpoint} "
          "(warmup compiles the batch-1 program)...")
    service = InferenceService(
        args.task, config, checkpoint=args.checkpoint,
        max_batch_size=args.max_batch_size, max_wait_ms=args.max_wait_ms)
    server = make_http_server(service, args.host, args.port)

    def _shutdown(signum, frame):
        print(f"### signal {signum}: shutting down")
        # BaseServer.shutdown() blocks until serve_forever's loop exits —
        # calling it from this handler (which runs ON the serve_forever
        # thread) would deadlock; hop to a helper thread instead.
        import threading

        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)
    print(f"### serving {args.task} on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch_size}, max_wait={args.max_wait_ms}ms)")
    try:
        server.serve_forever()
    finally:
        server.server_close()
        service.close()
        print("### stats:", service.stats())


if __name__ == "__main__":
    main()
