"""In-graph image preprocessing tests."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.data.device_pipeline import (
    op_autocontrast,
    op_brightness,
    preprocess_eval,
    preprocess_train,
    randaugment,
)
from efficientvlm_tpu.data.transforms import CLIP_MEAN, CLIP_STD


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


def test_randaug_ops_behave():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3) * 255, jnp.float32)
    np.testing.assert_allclose(np.asarray(op_brightness(img, jnp.asarray(1.0))), np.asarray(img), atol=1e-4)
    dark = op_brightness(img, jnp.asarray(0.5))
    assert float(dark.mean()) < float(img.mean())
    ac = op_autocontrast(img, jnp.asarray(0.0))
    assert float(ac.max()) > 254.0 and float(ac.min()) < 1.0

    out = randaugment(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape
    assert 0.0 <= float(out.min()) and float(out.max()) <= 255.0


def test_different_keys_different_crops():
    pixels = jax.random.randint(jax.random.PRNGKey(1), (1, 64, 64, 3), 0, 256, jnp.int32).astype(jnp.uint8)
    a = preprocess_train(jax.random.PRNGKey(2), pixels, 32)
    b = preprocess_train(jax.random.PRNGKey(3), pixels, 32)
    assert not np.allclose(np.asarray(a), np.asarray(b))
