"""Orbax full-state backend (train/orbax_io.py, `checkpoint_backend:
orbax`): per-process sharded OCDBT saves — no rank-0 gather — restoring
bit-exact into the template's pytree structure AND shardings (ZeRO-1
moments go to disk sharded and come back sharded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.drivers import common
from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
from efficientvlm_tpu.pruning.l0_module import XVLML0Module
from efficientvlm_tpu.train.optim import (
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
)
from efficientvlm_tpu.train.steps import init_train_state


@pytest.fixture(scope="module")
def state():
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=32, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=100, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64, encoder_width=32,
        max_position_embeddings=32,
    )
    model = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 16}))
    params = model.init(jax.random.PRNGKey(0))
    l0 = XVLML0Module(
        vision_layers=2, text_layers=tcfg["fusion_layer"],
        cross_layers=tcfg["num_hidden_layers"] - tcfg["fusion_layer"],
        hidden_size=32, intermediate_size=64, num_heads=4,
        target_sparsity=0.25, lagrangian_warmup=10,
    )
    opts = (
        create_optimizer(params, lr=1e-4, weight_decay=0.01, grad_clip=1.0),
        create_l0_optimizer(reg_lr=0.01),
        create_lagrangian_optimizer(reg_lr=0.01),
    )
    return init_train_state(params, l0.init(jax.random.PRNGKey(1)), opts)


def _assert_states_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_through_common(tmp_path, state, monkeypatch):
    monkeypatch.setattr(common, "_CKPT_BACKEND", "orbax")
    extra = {"epoch": np.int64(3), "batches_done": 7, "note": "mid-run"}
    common.save_full_state(str(tmp_path), state, extra)
    restored = common.restore_full_state(str(tmp_path), state)
    assert restored is not None
    new_state, new_extra = restored
    _assert_states_equal(state, new_state)
    # json round-trip: numpy ints come back as plain ints
    assert new_extra["epoch"] == 3 and isinstance(new_extra["epoch"], int)
    assert new_extra["batches_done"] == 7 and new_extra["note"] == "mid-run"


def test_orbax_background_save(tmp_path, state, monkeypatch):
    monkeypatch.setattr(common, "_CKPT_BACKEND", "orbax")
    common.save_full_state(str(tmp_path), state, {"step": 5}, background=True)
    common.wait_for_saves()
    new_state, extra = common.restore_full_state(str(tmp_path), state)
    _assert_states_equal(state, new_state)
    assert extra["step"] == 5


def test_orbax_zero1_sharded_moments(tmp_path, state, monkeypatch):
    """The point of the backend: ZeRO-1 sharded optimizer moments save
    WITHOUT a gather and restore with their shardings reapplied."""
    from efficientvlm_tpu.parallel.zero import state_shardings
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    shardings = state_shardings(mesh, state)
    sharded = jax.device_put(state, shardings)
    monkeypatch.setattr(common, "_CKPT_BACKEND", "orbax")
    common.save_full_state(str(tmp_path), sharded, {"step": 9})
    new_state, extra = common.restore_full_state(str(tmp_path), sharded)
    _assert_states_equal(sharded, new_state)
    assert extra["step"] == 9
    # a sharded moment leaf must come back SHARDED like the template,
    # not replicated
    for tmpl_leaf, new_leaf in zip(jax.tree.leaves(sharded), jax.tree.leaves(new_state)):
        if isinstance(tmpl_leaf, jax.Array) and isinstance(new_leaf, jax.Array):
            assert tmpl_leaf.sharding.is_equivalent_to(
                new_leaf.sharding, tmpl_leaf.ndim), (
                tmpl_leaf.sharding, new_leaf.sharding)


def test_msgpack_backend_still_default(tmp_path, state):
    assert common._CKPT_BACKEND == "msgpack"
    common.save_full_state(str(tmp_path), state, {"epoch": 1})
    import os

    assert os.path.exists(str(tmp_path / "training_state_latest.ckpt"))
    new_state, extra = common.restore_full_state(str(tmp_path), state)
    _assert_states_equal(state, new_state)
    assert int(extra["epoch"]) == 1
