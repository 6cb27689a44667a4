"""Native JPEG decode path (csrc/fastjpeg.cpp).

Builds the C extension on first use (g++ + libjpeg, both in the image) into
a per-user cache dir and falls back to PIL transparently when the toolchain
or library is missing — callers never have to care.

Why native: host JPEG decode is the measured input bottleneck (~36 img/s at
480px full-decode per core, CLAUDE.md); libjpeg's DCT-domain scaling decodes
directly at the cheapest M/8 size >= target and the exact-size bilinear
happens in C++ without the GIL, so it also scales across loader threads
(ParallelMapLoader) where PIL serializes.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
import threading

import numpy as np

_lock = threading.Lock()
_mod = None
_tried = False


def _build_dir() -> str:
    d = os.path.join(os.path.expanduser("~"), ".cache", "efficientvlm_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _compile() -> str | None:
    src = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc", "fastjpeg.cpp")
    if not os.path.exists(src):
        return None
    out = os.path.join(_build_dir(), "_fastjpeg.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        src, "-ljpeg", "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return out


def _load():
    global _mod, _tried
    with _lock:
        if _mod is not None or _tried:
            return _mod
        _tried = True
        so = _compile()
        if so is None:
            return None
        import importlib.util

        spec = importlib.util.spec_from_file_location("_fastjpeg", so)
        try:
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception:
            return None
        _mod = mod
        return _mod


def available() -> bool:
    return _load() is not None


def decode_resize(data: bytes, out_h: int, out_w: int) -> np.ndarray:
    """JPEG bytes -> uint8 RGB [out_h, out_w, 3]. Native when possible,
    PIL draft-mode fallback otherwise (draft also uses DCT scaling)."""
    mod = _load()
    if mod is not None:
        buf = mod.decode_resize(data, out_h, out_w)
        return np.frombuffer(buf, np.uint8).reshape(out_h, out_w, 3)
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    img.draft("RGB", (out_w, out_h))
    img = img.convert("RGB").resize((out_w, out_h), Image.BILINEAR)
    return np.asarray(img)


def decode_resize_file(path: str, out_h: int, out_w: int) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_resize(f.read(), out_h, out_w)
