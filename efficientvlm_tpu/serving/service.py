"""Online inference service: model hosting + dynamic batching + HTTP.

`InferenceService` wraps a task's inference unit (captioning beam generate /
VQA answer ranking — the same jitted programs the drivers use for eval)
behind a `DynamicBatcher`: HTTP request threads decode + preprocess their
own image (PIL/libjpeg drop the GIL, so decode parallelizes), then block on
a Future while the single device thread runs coalesced, bucket-padded
batches. `make_http_server` exposes it over stdlib HTTP (POST /caption,
POST /vqa, GET /health, GET /stats) — scripts/serve.py is the CLI.

Checkpoint shapes accepted: dense snapshot, gated training snapshot
(deterministic masks applied), physically pruned export, int8 export —
same single-read semantics as scripts/infer.py / drivers/common
maybe_load_params (reference load_pruned_model, xvlm_utils.py:283-299).
"""

from __future__ import annotations

import base64
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence

import numpy as np

from .batching import DynamicBatcher, pad_items, pad_to_bucket


def _decode_b64_image(data: str, transform) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")
    return np.asarray(transform(img))


class InferenceService:
    """task: 'caption' or 'vqa'. Provide either `checkpoint` (path) or
    `params` (+ optional `zs`) directly. All device work happens on the
    batcher thread; `submit_*` return Futures."""

    def __init__(self, task: str, config, *, checkpoint: str = "",
                 params=None, zs=None, answer_list: Optional[Sequence[str]] = None,
                 max_batch_size: int = 16, max_wait_ms: float = 10.0,
                 warmup: bool = True):
        import jax
        import jax.numpy as jnp

        from ..data.tokenizer import build_tokenizer
        from ..data.transforms import ImageTransform

        if task not in ("caption", "vqa"):
            raise ValueError(f"unsupported task {task!r}")
        self.task = task
        self.config = config
        self.tokenizer = build_tokenizer(config.get("text_encoder", ""))
        self.transform = ImageTransform.test(int(config.get("image_res", 384)))
        self.max_batch_size = int(max_batch_size)
        impl = config.get("attn_impl", "fused")
        dtype = jnp.bfloat16 if config.get("compute_dtype", "bf16") == "bf16" else None

        if task == "caption":
            from ..drivers.captioning import build_l0, build_models, load_torch_params

            self.model, _ = build_models(config)
            params, zs = self._resolve_params(
                build_l0(config), checkpoint, params, zs, load_torch_params)
            prompt = config.get("prompt", "a picture of ")
            self._prompt = prompt
            self._prompt_ids = np.asarray(self.tokenizer([prompt])["input_ids"])[:, :-1]
            self.model.prompt_length = self._prompt_ids.shape[1]
            tok = self.tokenizer
            self._gen = jax.jit(lambda p, img, pids: self.model.generate(
                p, img, pids, max_length=int(config.get("max_length", 20)),
                min_length=int(config.get("min_length", 5)),
                num_beams=int(config.get("num_beams", 3)),
                eos_id=tok.sep_token_id, pad_id=tok.pad_token_id,
                zs=zs, dtype=dtype, impl=impl))
        else:
            from ..drivers.vqa import build_l0, build_models, load_torch_params

            self.model, _ = build_models(config)
            params, zs = self._resolve_params(
                build_l0(config), checkpoint, params, zs, load_torch_params)
            answers = list(answer_list) if answer_list is not None else json.load(
                open(config["answer_list"]))
            self.answers = answers
            ans_tok = self.tokenizer([a + "[SEP]" for a in answers],
                                     padding="longest", truncation=True, max_length=20)
            k = min(int(config.get("k_test", 128)), len(answers))
            self._fwd = jax.jit(lambda p, img, qi, qa: self.model.forward_eval(
                p, img, qi, qa, jnp.asarray(ans_tok["input_ids"]),
                jnp.asarray(ans_tok["attention_mask"]), k=k, zs=zs,
                dtype=dtype, impl=impl))

        self.params = params
        self._batcher = DynamicBatcher(
            self._run_batch, max_batch_size=max_batch_size,
            max_wait_ms=max_wait_ms, name=f"{task}-batcher")
        if warmup:
            self._warmup()

    # -- loading ----------------------------------------------------------
    def _resolve_params(self, l0, checkpoint, params, zs, torch_loader):
        if params is not None:
            return params, zs
        from ..train import checkpoint as ckpt_io

        if not checkpoint:
            raise ValueError("provide checkpoint= or params=")
        if not os.path.exists(checkpoint):
            raise FileNotFoundError(f"checkpoint not found: {checkpoint}")
        if checkpoint.endswith(".ckpt"):
            tree, gates = ckpt_io.extract_model_and_gates(ckpt_io.load_params(checkpoint))
            zs = (l0.forward_deterministic({"loga": gates["loga"]})
                  if gates is not None else None)
            return tree, zs
        loaded = torch_loader(self.model, checkpoint)
        if loaded is None:
            raise ValueError(f"could not import torch checkpoint: {checkpoint}")
        return loaded, None

    # -- request paths ----------------------------------------------------
    def preprocess(self, image_b64: str) -> np.ndarray:
        """Decode+transform on the CALLER thread (parallel across HTTP
        threads; PIL/libjpeg release the GIL)."""
        return _decode_b64_image(image_b64, self.transform)

    def submit_caption(self, image: np.ndarray):
        return self._batcher.submit({"image": image})

    def submit_vqa(self, image: np.ndarray, question: str):
        return self._batcher.submit({"image": image, "question": question})

    def stats(self) -> dict:
        return {"task": self.task, **self._batcher.stats()}

    def reset_stats(self) -> None:
        self._batcher.reset_stats()

    def close(self) -> None:
        self._batcher.close()

    # -- device side ------------------------------------------------------
    def _run_batch(self, items: List[dict]) -> List:
        import jax.numpy as jnp

        n = len(items)
        bucket = pad_to_bucket(n, self.max_batch_size)
        padded = pad_items(items, bucket)
        imgs = jnp.asarray(np.stack([it["image"] for it in padded]))
        if self.task == "caption":
            pids = jnp.asarray(np.repeat(self._prompt_ids, bucket, axis=0))
            toks = np.asarray(self._gen(self.params, imgs, pids))
            out = []
            for t in toks[:n]:
                cap = self.tokenizer.decode(t, skip_special_tokens=True)
                p = self._prompt.strip()
                out.append(cap[len(p):].strip() if cap.startswith(p) else cap)
            return out
        tok = self.tokenizer([it["question"] for it in padded],
                             padding="max_length", truncation=True,
                             max_length=int(self.config.get("max_tokens", 40)))
        topk_ids, _ = self._fwd(self.params, imgs,
                                jnp.asarray(tok["input_ids"]),
                                jnp.asarray(tok["attention_mask"]))
        return [self.answers[int(a)] for a in np.asarray(topk_ids)[:n, 0]]

    def _warmup(self) -> None:
        """Compile the bucket-1 program (and pay the lazy first-execution
        upload) before the first request — cold compiles take minutes
        through the remote-compile tunnel."""
        res = int(self.config.get("image_res", 384))
        dummy = {"image": np.zeros((res, res, 3), np.float32)}
        if self.task == "vqa":
            dummy["question"] = "warmup ?"
        self._run_batch([dummy])


# -- HTTP ------------------------------------------------------------------

def make_http_server(service: InferenceService, host: str = "127.0.0.1",
                     port: int = 8000, request_timeout_s: float = 600.0):
    """stdlib ThreadingHTTPServer over the service. Endpoints:
    POST /caption {"image_b64": ...} -> {"caption": ...}
    POST /vqa {"image_b64": ..., "question": ...} -> {"answer": ...}
    GET /health, GET /stats."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet: stats carries the signal
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok", "task": service.task})
            elif self.path == "/stats":
                self._json(200, service.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/caption" and service.task == "caption":
                    img = service.preprocess(req["image_b64"])
                    fut = service.submit_caption(img)
                    self._json(200, {"caption": fut.result(timeout=request_timeout_s)})
                elif self.path == "/vqa" and service.task == "vqa":
                    img = service.preprocess(req["image_b64"])
                    fut = service.submit_vqa(img, str(req["question"]))
                    self._json(200, {"answer": fut.result(timeout=request_timeout_s)})
                else:
                    self._json(404, {"error": f"{self.path} not served by "
                                              f"task={service.task}"})
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(500, {"error": repr(e)})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True,
                         name="http-serve")
    t.start()
    return t
