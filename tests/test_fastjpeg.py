"""Native JPEG decode path (csrc/fastjpeg.cpp via data/fastjpeg.py)."""

import io

import numpy as np
import pytest
from PIL import Image

from efficientvlm_tpu.data import fastjpeg
from efficientvlm_tpu.data.transforms import ImageTransform


def _smooth_jpeg(side=640, quality=92):
    y, x = np.mgrid[0:side, 0:side]
    arr = np.stack([x / side * 255, y / side * 255, (x + y) / (2 * side) * 255], -1)
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_native_decoder_builds_and_decodes():
    assert fastjpeg.available(), "g++/libjpeg are in the image; build must work"
    data = _smooth_jpeg()
    out = fastjpeg.decode_resize(data, 480, 480)
    assert out.shape == (480, 480, 3) and out.dtype == np.uint8
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                     .resize((480, 480), Image.BILINEAR))
    # DCT-scaled decode + bilinear vs full decode + bilinear: identical to
    # within resampling noise on smooth content
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0


def test_native_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        fastjpeg.decode_resize(b"\xff\xd8 not a real jpeg", 32, 32)


def test_pil_fallback_matches_shape(monkeypatch):
    monkeypatch.setattr(fastjpeg, "_mod", None)
    monkeypatch.setattr(fastjpeg, "_tried", True)
    out = fastjpeg.decode_resize(_smooth_jpeg(), 224, 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8


def test_load_transformed_test_mode(tmp_path):
    from efficientvlm_tpu.data.datasets import load_transformed

    data = _smooth_jpeg(side=500)
    p = tmp_path / "img.jpg"
    p.write_bytes(data)

    # eval protocol default: EXACT PIL BICUBIC (no native approximation)
    exact = ImageTransform.test(224)
    assert exact.native_decode_size is None
    ref = exact(Image.open(io.BytesIO(data)))
    got = load_transformed(exact, "img.jpg", is_path=True, image_root=str(tmp_path))
    np.testing.assert_array_equal(got, ref)

    # native_eval_decode opt-in: DCT-scaled decode + bilinear, small diff
    tform = ImageTransform.test(224, native_decode=True)
    assert tform.native_decode_size == 224
    fast = load_transformed(tform, "img.jpg", is_path=True, image_root=str(tmp_path))
    slow = tform(Image.open(io.BytesIO(data)))
    assert fast.shape == slow.shape and fast.dtype == slow.dtype == np.float32
    # bilinear-from-DCT-scale vs bicubic-from-full: small normalized diff
    assert np.abs(fast - slow).mean() < 0.1


def test_load_transformed_uint8_mode(tmp_path):
    from efficientvlm_tpu.data.datasets import load_transformed

    p = tmp_path / "img.jpg"
    p.write_bytes(_smooth_jpeg(side=300))
    tform = ImageTransform.uint8(224)
    out = load_transformed(tform, "img.jpg", is_path=True, image_root=str(tmp_path))
    assert out.dtype == np.uint8
    assert out.shape == (tform.image_res, tform.image_res, 3)


def test_load_transformed_train_mode_uses_pil(tmp_path):
    """Crop-based transforms must NOT take the square native decode."""
    from efficientvlm_tpu.data.datasets import load_transformed

    p = tmp_path / "img.jpg"
    p.write_bytes(_smooth_jpeg(side=300))
    tform = ImageTransform.train(64, seed=0)
    assert tform.native_decode_size is None
    out = load_transformed(tform, "img.jpg", is_path=True, image_root=str(tmp_path))
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
