"""Online serving (efficientvlm_tpu/serving): dynamic batcher semantics and
a full HTTP round-trip over a tiny captioning model — request threads decode
their own images, the device thread runs coalesced bucket-padded batches.
No reference counterpart (the reference ships no serving path)."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.serving import (
    DynamicBatcher, InferenceService, make_http_server, pad_items,
    pad_to_bucket, serve_forever_in_thread,
)


def test_pad_to_bucket():
    assert [pad_to_bucket(n, 16) for n in (1, 2, 3, 5, 9, 16)] == [1, 2, 4, 8, 16, 16]
    assert pad_to_bucket(30, 16) == 16  # capped
    assert pad_items([1, 2, 3], 4) == [1, 2, 3, 3]
    assert pad_items([1, 2], 2) == [1, 2]


def test_batcher_coalesces_and_orders():
    seen = []

    def run(items):
        seen.append(len(items))
        time.sleep(0.02)  # make a window for coalescing
        return [x * 10 for x in items]

    b = DynamicBatcher(run, max_batch_size=8, max_wait_ms=30)
    try:
        futs = [b.submit(i) for i in range(12)]
        assert [f.result(timeout=10) for f in futs] == [i * 10 for i in range(12)]
        s = b.stats()
        assert s["requests"] == 12
        # the first request may run solo, but the backlog must coalesce
        assert max(seen) > 1 and s["batches"] < 12
        assert s["p50_ms"] is not None
    finally:
        b.close()


def test_batcher_close_fails_queued_futures():
    """close() must not strand queued requests: their Futures fail fast
    instead of blocking callers out their full result timeout."""
    release = threading.Event()

    def run(items):
        release.wait(5)  # hold the worker so the next submit stays queued
        return items

    b = DynamicBatcher(run, max_batch_size=1, max_wait_ms=1)
    first = b.submit("a")      # occupies the worker
    time.sleep(0.05)
    stuck = b.submit("b")      # sits in the queue
    # release the held batch AFTER close() has set the stop flag: the
    # worker then finishes "a", sees stop, and fails the queued "b"
    threading.Timer(0.2, release.set).start()
    b.close()
    assert first.result(timeout=10) == "a"
    with pytest.raises(RuntimeError, match="batcher closed"):
        stuck.result(timeout=10)


def test_batcher_pipelined_overlap_and_stage_stats():
    """Pipelined mode: dispatch of batch N+1 overlaps finish of batch N;
    per-stage timings and bucket histogram appear in stats()."""
    events = []
    lock = threading.Lock()

    def dispatch(items):
        with lock:
            events.append(("d", list(items)))
        return [x * 10 for x in items]  # "in-flight handle"

    def finish(handle, items):
        time.sleep(0.05)  # device busy: dispatch should run meanwhile
        with lock:
            events.append(("f", list(items)))
        return handle

    b = DynamicBatcher(dispatch, finish_batch=finish,
                       max_batch_size=4, max_wait_ms=5)
    try:
        futs = [b.submit(i) for i in range(8)]
        assert [f.result(timeout=10) for f in futs] == [i * 10 for i in range(8)]
        s = b.stats()
        assert s["requests"] == 8
        assert sum(k * v for k, v in s["buckets"].items()) == 8
        assert s["dispatch_mean_ms"] is not None and s["finish_mean_ms"] is not None
        assert s["queue_wait_p95_ms"] is not None
        # overlap: some dispatch must happen before the LAST finish —
        # i.e. the event stream is not strictly d,f,d,f serialized
        kinds = [k for k, _ in events]
        n_batches = s["batches"]
        assert kinds.count("d") == kinds.count("f") == n_batches
        if n_batches >= 2:
            # second dispatch precedes first finish (pipelining), unless
            # everything coalesced into too few batches to observe
            first_f = kinds.index("f")
            assert "d" in kinds[first_f + 1:] or kinds[:first_f].count("d") >= 2
    finally:
        b.close()


def test_batcher_busy_drain_coalesces_past_deadline():
    """While the pipeline slot is full the dispatch thread must keep
    draining PAST max_wait_ms (device busy = free coalescing time): requests
    arriving slower than max_wait_ms still coalesce into one batch. Pins the
    condition-wait rewrite (no 2ms polling) to the original semantics."""
    release = threading.Event()
    batches = []

    def dispatch(items):
        batches.append(list(items))
        return list(items)

    def finish(handle, items):
        release.wait(10)  # hold the finisher: pipeline slot stays full
        return handle

    b = DynamicBatcher(dispatch, finish_batch=finish,
                       max_batch_size=8, max_wait_ms=5)
    try:
        futs = [b.submit(0)]          # batch 1 -> finisher (blocked)
        time.sleep(0.1)
        futs.append(b.submit(1))      # batch 2 -> fills the pending slot
        time.sleep(0.1)
        # trickle spaced 10x past max_wait_ms: must still coalesce
        for i in range(2, 6):
            futs.append(b.submit(i))
            time.sleep(0.05)
        release.set()
        assert [f.result(timeout=10) for f in futs] == list(range(6))
        assert any(len(bt) >= 4 for bt in batches), batches
    finally:
        release.set()
        b.close()


def test_batcher_dispatch_lock_serializes_external_device_work():
    """warmup_buckets on a live endpoint takes batcher.dispatch_lock around
    its direct dispatch; the batcher must honor the same lock so the two
    never compile/dispatch concurrently through the TPU tunnel."""
    def run(items):
        return list(items)

    b = DynamicBatcher(run, max_batch_size=4, max_wait_ms=2)
    try:
        with b.dispatch_lock:  # simulate an in-progress warmup dispatch
            fut = b.submit("x")
            done, _ = _wait_futures([fut], timeout=0.3)
            assert not done, "dispatch ran while the lock was held"
        assert fut.result(timeout=10) == "x"
    finally:
        b.close()


def _wait_futures(futs, timeout):
    import concurrent.futures as cf

    return cf.wait(futs, timeout=timeout)


def test_batcher_pipelined_propagates_finish_exception():
    def dispatch(items):
        return items

    def finish(handle, items):
        raise ValueError("fetch boom")

    b = DynamicBatcher(dispatch, finish_batch=finish,
                       max_batch_size=2, max_wait_ms=2)
    try:
        fut = b.submit(1)
        with pytest.raises(ValueError, match="fetch boom"):
            fut.result(timeout=10)
        assert b.stats()["requests"] == 1
    finally:
        b.close()


def test_batcher_wedged_finish_watchdog():
    """A hung finish_batch (wedged tunnel fetch — advisor r4) must degrade
    LOUDLY: once one fetch exceeds finish_watchdog_s, submits raise instead
    of queueing until client timeout, and close() fails queued futures
    immediately instead of blocking behind the wedged slot."""
    import threading as th

    release = th.Event()

    def dispatch(items):
        return items

    def finish(handle, items):
        release.wait(30)  # simulate a hung device result fetch
        return items

    b = DynamicBatcher(dispatch, finish_batch=finish, max_batch_size=2,
                       max_wait_ms=1, finish_watchdog_s=0.2)
    try:
        first = b.submit(1)  # enters finish() and hangs there
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            time.sleep(0.05)
            try:
                fut = b.submit(2)  # queues until the watchdog trips
            except RuntimeError as e:
                assert "wedged" in str(e)
                break
        else:
            raise AssertionError("watchdog never tripped")
        t0 = time.monotonic()
        b.close()  # must not block the full join timeouts
        assert time.monotonic() - t0 < 5
        with pytest.raises(RuntimeError, match="batcher closed"):
            fut.result(timeout=1)
    finally:
        release.set()
        b.close()
    # the wedged-then-released first request either completed or was failed;
    # it must not be silently lost
    assert first.done() or first.exception(timeout=5) is not None


def test_batcher_propagates_exceptions():
    def run(items):
        raise ValueError("boom")

    b = DynamicBatcher(run, max_batch_size=4, max_wait_ms=5)
    try:
        fut = b.submit(1)
        with pytest.raises(ValueError, match="boom"):
            fut.result(timeout=10)
        assert b.stats()["requests"] == 1  # failed batches still counted
    finally:
        b.close()
    with pytest.raises(RuntimeError):
        b.submit(2)


def _tiny_caption_config():
    return Config.from_dict({
        "vision": VisionConfig.create(
            vision_width=32, num_attention_heads=4, intermediate_size=64,
            num_hidden_layers=2, image_res=32, patch_size=8,
        ),
        "text": TextConfig.create(
            vocab_size=200, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64, encoder_width=32,
            max_position_embeddings=48,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        "image_res": 32, "patch_size": 8, "embed_dim": 16, "temp": 0.07,
        "text_encoder": "", "compute_dtype": "f32", "attn_impl": "xla",
        "prompt": "a picture of ", "num_beams": 2, "max_length": 8,
        "min_length": 2, "max_tokens": 12,
    })


def _b64_image(seed=0, size=40):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(np.uint8(rng.rand(size, size, 3) * 255))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def caption_server():
    import jax

    cfg = _tiny_caption_config()
    from efficientvlm_tpu.drivers.captioning import build_models

    model, _ = build_models(cfg)
    params = model.init(jax.random.PRNGKey(0))
    service = InferenceService(
        "caption", cfg, params=params, max_batch_size=4, max_wait_ms=50)
    server = make_http_server(service, "127.0.0.1", 0)
    serve_forever_in_thread(server)
    host, port = server.server_address
    yield service, f"http://{host}:{port}"
    server.shutdown()
    service.close()


def test_vqa_service_answer_ranking():
    """The VQA service hosts forward_eval (k-way answer ranking): coalesced
    requests come back with answers from the answer list, in order."""
    import jax

    cfg = _tiny_caption_config()
    cfg["k_test"] = 2
    from efficientvlm_tpu.drivers.vqa import build_models

    model, _ = build_models(cfg)
    params = model.init(jax.random.PRNGKey(0))
    answers = ["yes", "no", "red", "two"]
    service = InferenceService(
        "vqa", cfg, params=params, answer_list=answers,
        max_batch_size=4, max_wait_ms=30)
    try:
        imgs = [service.preprocess(_b64_image(i)) for i in range(3)]
        futs = [service.submit_vqa(im, f"what color {i}?")
                for i, im in enumerate(imgs)]
        outs = [f.result(timeout=600) for f in futs]
        assert len(outs) == 3 and all(a in answers for a in outs)
        assert service.stats()["requests"] >= 3
    finally:
        service.close()


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_http_caption_roundtrip(caption_server):
    service, base = caption_server
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        assert r.status == 200 and json.loads(r.read())["task"] == "caption"

    # concurrent requests coalesce into one device batch
    results = {}

    def one(i):
        results[i] = _post(base + "/caption", {"image_b64": _b64_image(i)})

    threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert set(results) == {0, 1, 2, 3}
    for status, payload in results.values():
        assert status == 200
        assert isinstance(payload["caption"], str)

    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    # warmup isn't counted; the 4 posts are
    assert stats["requests"] >= 4 and stats["batches"] >= 1

    # malformed request -> 400, unknown route -> 404 (urllib raises)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/caption", {"nope": 1})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/vqa", {"image_b64": _b64_image(), "question": "?"})
    assert e.value.code == 404
