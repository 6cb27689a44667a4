"""Online inference service: model hosting + dynamic batching + HTTP.

`InferenceService` wraps a task's inference unit (captioning beam generate /
VQA answer ranking — the same jitted programs the drivers use for eval)
behind a pipelined `DynamicBatcher`: HTTP request threads decode + resize
their own image (PIL/libjpeg drop the GIL, so decode parallelizes) to
**uint8** — normalization runs in-graph so host->device transfer is 4x
smaller than f32, which matters enormously on a tunneled device — then
block on a Future while the dispatch thread uploads + launches coalesced,
bucket-padded batches and a finisher thread fetches results + detokenizes.
While one batch executes on the chip the next is already being collected
and uploaded. `make_http_server` exposes it over stdlib HTTP (POST
/caption, POST /vqa, GET /health, GET /stats — with per-stage timings) —
scripts/serve.py is the CLI.

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
import time
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
        from ..data.transforms import ImageTransform, normalize_in_graph

        if task not in ("caption", "vqa"):
            raise ValueError(f"unsupported task {task!r}")
        self.task = task
        self.config = config
        self.tokenizer = build_tokenizer(config.get("text_encoder", ""))
        # margin=1.0 => exact eval geometry (BICUBIC resize to res), but
        # uint8 output: PIL resize yields uint8 anyway, so device-side
        # normalize is bit-identical to ImageTransform.test — at 1/4 the
        # host->device bytes
        self.transform = ImageTransform.uint8(int(config.get("image_res", 384)),
                                              margin=1.0)
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
            self._gen = jax.jit(lambda p, img_u8, pids: self.model.generate(
                p, normalize_in_graph(img_u8), pids,
                max_length=int(config.get("max_length", 20)),
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
            self._fwd = jax.jit(lambda p, img_u8, qi, qa: self.model.forward_eval(
                p, normalize_in_graph(img_u8), qi, qa, jnp.asarray(ans_tok["input_ids"]),
                jnp.asarray(ans_tok["attention_mask"]), k=k, zs=zs,
                dtype=dtype, impl=impl))

        self.params = params
        self._pre_lock = threading.Lock()
        self._pre_ms_total = 0.0
        self._pre_count = 0
        self._batcher = DynamicBatcher(
            self._dispatch_batch, finish_batch=self._finish_batch,
            max_batch_size=max_batch_size,
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
        """Decode+resize to uint8 on the CALLER thread (parallel across HTTP
        threads; PIL/libjpeg release the GIL)."""
        t0 = time.monotonic()
        out = _decode_b64_image(image_b64, self.transform)
        dt = (time.monotonic() - t0) * 1e3
        with self._pre_lock:
            self._pre_ms_total += dt
            self._pre_count += 1
        return out

    def submit_caption(self, image: np.ndarray):
        return self._batcher.submit({"image": image})

    def submit_vqa(self, image: np.ndarray, question: str):
        return self._batcher.submit({"image": image, "question": question})

    def stats(self) -> dict:
        with self._pre_lock:
            pre = (self._pre_ms_total / self._pre_count) if self._pre_count else None
        return {"task": self.task, "preprocess_mean_ms": pre,
                **self._batcher.stats()}

    def reset_stats(self) -> None:
        with self._pre_lock:
            self._pre_ms_total = 0.0
            self._pre_count = 0
        self._batcher.reset_stats()

    def close(self) -> None:
        self._batcher.close()

    # -- device side ------------------------------------------------------
    def _dispatch_batch(self, items: List[dict]):
        """Dispatch-thread half: stack uint8 inputs, upload, launch the
        jitted program. JAX execution is async — the returned device arrays
        are in-flight handles the finisher blocks on."""
        import jax.numpy as jnp

        n = len(items)
        bucket = pad_to_bucket(n, self.max_batch_size)
        padded = pad_items(items, bucket)
        imgs = jnp.asarray(np.stack([it["image"] for it in padded]))
        if self.task == "caption":
            pids = jnp.asarray(np.repeat(self._prompt_ids, bucket, axis=0))
            return self._gen(self.params, imgs, pids)
        tok = self.tokenizer([it["question"] for it in padded],
                             padding="max_length", truncation=True,
                             max_length=int(self.config.get("max_tokens", 40)))
        topk_ids, _ = self._fwd(self.params, imgs,
                                jnp.asarray(tok["input_ids"]),
                                jnp.asarray(tok["attention_mask"]))
        return topk_ids

    def _finish_batch(self, handle, items: List[dict]) -> List:
        """Finisher-thread half: block on the device result, detokenize."""
        n = len(items)
        if self.task == "caption":
            toks = np.asarray(handle)
            out = []
            for t in toks[:n]:
                cap = self.tokenizer.decode(t, skip_special_tokens=True)
                p = self._prompt.strip()
                out.append(cap[len(p):].strip() if cap.startswith(p) else cap)
            return out
        return [self.answers[int(a)] for a in np.asarray(handle)[:n, 0]]

    def _warmup(self) -> None:
        """Compile the bucket-1 program (and pay the lazy first-execution
        upload) before the first request — cold compiles take minutes
        through the remote-compile tunnel."""
        self.warmup_buckets(1)

    def warmup_buckets(self, up_to: int) -> None:
        """Deterministically compile every power-of-two batch bucket <=
        pad_to_bucket(up_to): a live endpoint must never pay a cold compile
        on a request thread. (Firing concurrent HTTP warmup requests is
        racy — coalescing is timing-dependent, so a bucket can stay cold
        and ambush the p95 later.) Each bucket runs under the batcher's
        dispatch lock: warming a LIVE endpoint must not compile/dispatch
        concurrently with the dispatch thread — two processes compiling
        through the TPU tunnel at once stall each other (CLAUDE.md)."""
        res = int(self.config.get("image_res", 384))
        dummy = {"image": np.zeros((res, res, 3), np.uint8)}
        if self.task == "vqa":
            dummy["question"] = "warmup ?"
        top = pad_to_bucket(max(1, int(up_to)), self.max_batch_size)
        b = 1
        while b <= top:
            items = [dummy] * b
            with self._batcher.dispatch_lock:
                handle = self._dispatch_batch(items)
            # result fetch needs no lock (no compile; the tunnel serializes
            # execution) — holding it through the fetch would stall real
            # batches behind warmup for whole device-step times
            self._finish_batch(handle, items)
            b *= 2


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
