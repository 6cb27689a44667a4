"""Checkpoint import/export parity tests (synthetic torch state dicts)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientvlm_tpu.config import TextConfig, VisionConfig
from efficientvlm_tpu.models.xvlm import XVLM
from efficientvlm_tpu.train import checkpoint as C


@pytest.fixture(scope="module")
def small_model():
    vcfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=6, image_res=32, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=50, hidden_size=32, num_hidden_layers=6, num_attention_heads=4,
        intermediate_size=64, encoder_width=32, max_position_embeddings=40,
    )
    model = XVLM(vcfg, tcfg, {"embed_dim": 16})
    params = model.init(jax.random.PRNGKey(0), with_bbox_head=True)
    return model, params


def test_torch_roundtrip(small_model, tmp_path):
    """params -> torch-keyed state dict -> torch.save/load -> params again
    must be exact."""
    import torch

    model, params = small_model
    sd = C.xvlm_state_dict_from_params(params, fusion_layer=3)
    path = str(tmp_path / "model.th")
    torch.save({"model": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}}, path)

    sd2 = C.load_torch_state_dict(path)
    restored = C.xvlm_params_from_state_dict(
        sd2, vision_layers=6, text_layers=6, fusion_layer=3,
        with_bbox_head=True, with_mlm_head=True,
    )
    leaves1, tdef1 = jax.tree_util.tree_flatten(params)
    leaves2, tdef2 = jax.tree_util.tree_flatten(restored)
    assert tdef1 == tdef2, (tdef1, tdef2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_layer_subsampling():
    """12->6 mapper keeps odd layers {1,3,5,7,9,11} (models/xvlm.py:128-130)."""
    sd = {f"encoder.layers.{i}.x": np.full((1,), float(i)) for i in range(12)}
    out = C.subsample_layers(sd, "encoder.layers", C.LAYER_MAPPER_12_TO_6)
    assert sorted(out.keys()) == [f"encoder.layers.{i}.x" for i in range(6)]
    for new, old in ((0, 1), (1, 3), (2, 5), (3, 7), (4, 9), (5, 11)):
        assert out[f"encoder.layers.{new}.x"][0] == float(old)


def test_hf_clip_prefix_remap():
    sd = {
        "vision_model.embeddings.patch_embedding.weight": np.zeros((8, 3, 4, 4)),
        "vision_model.embeddings.position_embedding.weight": np.zeros((17, 8)),
        "vision_model.embeddings.class_embedding": np.zeros((8,)),
        "vision_model.embeddings.position_ids": np.arange(17),
        "vision_model.pre_layrnorm.weight": np.ones((8,)),
        "text_model.something": np.zeros(1),
    }
    out = C.convert_hf_clip_vision(sd)
    assert "patch_embed.weight" in out
    assert "pos_embed.weight" in out
    assert "class_embedding" in out
    assert "position_ids" not in out
    assert not any(k.startswith("text_model") for k in out)


def test_pos_embed_interp_on_load(small_model):
    model, params = small_model
    sd = C.xvlm_state_dict_from_params(params, fusion_layer=3)
    # target resolution 48x48/8 -> 36 patches (ckpt has 16)
    restored = C.xvlm_params_from_state_dict(
        sd, vision_layers=6, text_layers=6, fusion_layer=3, num_patches=36,
    )
    assert restored["vision"]["pos_embed"]["embedding"].shape == (37, 32)


def test_native_checkpointer(small_model, tmp_path):
    model, params = small_model
    ckpt = C.Checkpointer(str(tmp_path / "out"))
    p = ckpt.save_checkpoint(5, {"model": params}, training_states={"step": 5})
    restored = C.load_pytree(p)
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(restored["model"])
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_latest()["step"] == 5


def test_checkpointer_keep_last_rotation(small_model, tmp_path):
    """keep_last=N deletes all but the newest N numbered step snapshots
    (beyond the reference, which keeps every snapshot forever); 'final' and
    epoch-tag snapshots are untouched."""
    import os

    model, params = small_model
    out = str(tmp_path / "out")
    ckpt = C.Checkpointer(out, keep_last=2)
    for s in (10, 20, 30, 40):
        ckpt.save_checkpoint(s, {"model": params})
    ckpt.save_checkpoint("final", {"model": params})
    ckpt.save_checkpoint(1, {"model": params}, step_mode=False)  # epoch tag
    names = sorted(os.listdir(out))
    assert "model_state_step_30.ckpt" in names and "model_state_step_40.ckpt" in names
    assert "model_state_step_10.ckpt" not in names and "model_state_step_20.ckpt" not in names
    assert "model_state_step_final.ckpt" in names  # string steps never rotate
    assert "model_state_epoch_1.ckpt" in names  # other tag untouched


def test_checkpointer_hdfs_path(small_model, tmp_path, monkeypatch):
    """Checkpointer must work for hdfs:// dirs: no local os.makedirs crash,
    writes stream through the hdfs CLI shims (ref utils/checkpointer.py:26-49
    is HDFS-first). The hdfs binary is faked with a local-backed script."""
    import os
    import stat

    from efficientvlm_tpu.utils import io as uio

    backing = tmp_path / "hdfs_store"
    backing.mkdir()
    fake = tmp_path / "hdfs"
    fake.write_text(f"""#!/usr/bin/env python3
import os, shutil, sys
root = {str(backing)!r}
def local(p):
    return os.path.join(root, p.replace("hdfs://", "").lstrip("/"))
cmd = sys.argv[2]
if cmd == "-mkdir":
    os.makedirs(local(sys.argv[-1]), exist_ok=True)
elif cmd == "-test":
    sys.exit(0 if os.path.exists(local(sys.argv[-1])) else 1)
elif cmd == "-put":
    dst = local(sys.argv[-1])
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "wb") as f:
        shutil.copyfileobj(sys.stdin.buffer, f)
elif cmd == "-text":
    with open(local(sys.argv[-1]), "rb") as f:
        shutil.copyfileobj(f, sys.stdout.buffer)
""")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr(uio, "HDFS_BIN", str(fake))

    _, params = small_model
    ckpt = C.Checkpointer("hdfs://ns/ckpts/run1")
    assert (backing / "ns/ckpts/run1").is_dir()
    ckpt.save_checkpoint(3, {"model": params}, training_states={"step": 3})
    assert ckpt.load_latest()["step"] == 3
    restored = C.load_pytree("hdfs://ns/ckpts/run1/model_state_step_3.ckpt")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_background_full_state_save(small_model, tmp_path):
    """Async save_full_state: the write lands after wait_for_saves and a
    following sync save joins the pending one (no stale clobber)."""
    from efficientvlm_tpu.drivers import common

    _, params = small_model
    out = str(tmp_path)
    common.save_full_state(out, {"model": params, "v": jnp.float32(1.0)},
                           {"step": 1}, background=True)
    common.wait_for_saves()
    path = os.path.join(out, "training_state_latest.ckpt")
    payload = C.load_pytree(path)
    assert payload["extra"]["step"] == 1

    # background then an immediately-following sync save: the sync result wins
    common.save_full_state(out, {"model": params, "v": jnp.float32(2.0)},
                           {"step": 2}, background=True)
    common.save_full_state(out, {"model": params, "v": jnp.float32(3.0)}, {"step": 3})
    payload = C.load_pytree(path)
    assert payload["extra"]["step"] == 3
    assert float(payload["state"]["v"]) == 3.0
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(payload["state"]["model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_snapshot_does_not_clobber_resumable_state(small_model, tmp_path):
    """Regression: best-epoch model snapshots (save_training_state) used to
    overwrite training_state_latest with the small {model,l0,epoch} payload,
    so --resume after a best epoch crashed / lost optimizer moments."""
    from efficientvlm_tpu.drivers import common

    _, params = small_model
    out = str(tmp_path)
    full = {"model": params, "opt": {"mu": jnp.ones(3)}, "step": jnp.int32(7)}
    common.save_full_state(out, full, {"epoch": 0})
    common.save_training_state(out, "best", {"model": params, "epoch": 0})

    restored = common.restore_full_state(out, full)
    assert restored is not None
    state, extra = restored
    assert extra["epoch"] == 0
    assert int(state["step"]) == 7  # optimizer-bearing full state survived
    assert os.path.exists(os.path.join(out, "model_state_step_best.ckpt"))
