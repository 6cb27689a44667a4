"""In-graph image preprocessing tests (full reference RandAugment table,
dataset/randaugment.py func_dict/arg_dict)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.data.device_pipeline import (
    cutout,
    make_randaug_ops,
    preprocess_eval,
    preprocess_train,
    randaugment,
)
from efficientvlm_tpu.data.transforms import CLIP_MEAN, CLIP_STD

OPS = {f.__name__: f for f in make_randaug_ops(0.7)}
ONE = jnp.asarray(1.0)


def test_preprocess_shapes_and_stats():
    rng = jax.random.PRNGKey(0)
    pixels = jax.random.randint(jax.random.PRNGKey(1), (4, 48, 40, 3), 0, 256, jnp.int32).astype(jnp.uint8)
    out = jax.jit(lambda r, p: preprocess_train(r, p, 32))(rng, pixels)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # normalized range plausible
    assert float(jnp.abs(out).max()) < 4.0

    ev = jax.jit(lambda p: preprocess_eval(p, 32))(pixels)
    assert ev.shape == (4, 32, 32, 3)

    # eval path matches host normalization on a constant image
    const = jnp.full((1, 32, 32, 3), 128, jnp.uint8)
    ev2 = preprocess_eval(const, 32)
    expected = (128 / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(np.asarray(ev2[0, 0, 0]), expected, rtol=1e-4)


def test_color_ops_behave():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3) * 255, jnp.float32)
    dark = OPS["brightness"](img, ONE)  # enh = 0.1+1.8*0.7 = 1.36 > 1 brightens
    assert float(dark.mean()) > float(img.mean())
    low = make_randaug_ops(0.0)  # enh = 0.1 strongly darkens
    assert float(low[7](img, ONE).mean()) < float(img.mean())
    ac = OPS["autocontrast"](img, ONE)
    assert float(ac.max()) > 254.0 and float(ac.min()) < 1.0

    out = randaugment(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape
    assert 0.0 <= float(out.min()) and float(out.max()) <= 255.0


def test_geometric_ops():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3) * 255, jnp.float32)
    # translate_x by +7px (level 0.7 * 10): the left strip becomes fill 128
    tx = OPS["translate_x"](img, ONE)
    # out(x,y) = img(x + 7, y): the RIGHT strip reads out of bounds -> fill
    np.testing.assert_allclose(np.asarray(tx[:, -7:]), 128.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tx[:, :9]), np.asarray(img[:, 7:]), atol=1e-3)

    ty = OPS["translate_y"](img, ONE)
    np.testing.assert_allclose(np.asarray(ty[-7:, :]), 128.0, atol=1e-4)

    rot = OPS["rotate"](img, ONE)
    assert rot.shape == img.shape and bool(jnp.isfinite(rot).all())
    assert not np.allclose(np.asarray(rot), np.asarray(img))
    # zero-magnitude rotate is identity
    rot0 = make_randaug_ops(0.0)[3](img, ONE)
    np.testing.assert_allclose(np.asarray(rot0), np.asarray(img), atol=1e-2)

    sx = OPS["shear_x"](img, ONE)
    assert not np.allclose(np.asarray(sx), np.asarray(img))
    # first row unchanged under x-shear (y=0)
    np.testing.assert_allclose(np.asarray(sx[0]), np.asarray(img[0]), atol=1e-3)


def test_equalize_matches_pil_algorithm():
    rng = np.random.RandomState(3)
    img_u8 = (rng.rand(12, 12, 3) * 200 + 20).astype(np.uint8)

    def pil_equalize_channel(ch):
        hist = np.bincount(ch.reshape(-1), minlength=256)
        nz = hist[hist != 0]
        step = (hist.sum() - nz[-1]) // 255
        if step == 0:
            return ch
        n = np.empty(256, np.int64)
        n[0] = step // 2
        n[1:] = hist[:-1]
        table = np.clip(np.cumsum(n) // step, 0, 255)
        return table[ch]

    want = np.stack([pil_equalize_channel(img_u8[..., i]) for i in range(3)], -1)
    got = OPS["equalize"](jnp.asarray(img_u8, jnp.float32), ONE)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_posterize_and_cutout():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3) * 255, jnp.float32)
    post = OPS["posterize"](img, ONE)  # bits = int(4*0.7) = 2 -> values on 64-grid
    vals = np.unique(np.asarray(post))
    assert all(v % 64 == 0 for v in vals)

    cut = cutout(jax.random.PRNGKey(0), img, 8)
    assert (np.asarray(cut) == 128.0).any()


def test_different_keys_different_crops():
    pixels = jax.random.randint(jax.random.PRNGKey(1), (1, 64, 64, 3), 0, 256, jnp.int32).astype(jnp.uint8)
    a = preprocess_train(jax.random.PRNGKey(2), pixels, 32)
    b = preprocess_train(jax.random.PRNGKey(3), pixels, 32)
    assert not np.allclose(np.asarray(a), np.asarray(b))
