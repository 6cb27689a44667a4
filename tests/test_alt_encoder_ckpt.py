"""Swin / DeiT checkpoint import round-trips (reference
models/xvlm.py:133-178 + swin_transformer.py:596-653): synthetic torch state
dicts in the Microsoft-Swin / timm-DeiT key layout -> our param trees ->
forward pass, plus the relative-position-bias geometric interpolation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from efficientvlm_tpu.config import Config, VisionConfig
from efficientvlm_tpu.models.deit import deit_apply, init_deit
from efficientvlm_tpu.models.swin import init_swin, swin_apply, swin_config
from efficientvlm_tpu.train.checkpoint import (
    deit_params_from_state_dict,
    interpolate_relative_pos_embed,
    swin_params_from_state_dict,
)


def _t(*shape):
    return torch.randn(*shape) * 0.02


def make_swin_sd(embed_dim=16, depths=(2, 2), num_heads=(2, 4), window=4, patch=4):
    sd = {
        "patch_embed.proj.weight": _t(embed_dim, 3, patch, patch),
        "patch_embed.proj.bias": _t(embed_dim),
        "patch_embed.norm.weight": torch.ones(embed_dim),
        "patch_embed.norm.bias": torch.zeros(embed_dim),
    }
    dim = embed_dim
    for s, (depth, nh) in enumerate(zip(depths, num_heads)):
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            sd[f"{p}.norm1.weight"] = torch.ones(dim)
            sd[f"{p}.norm1.bias"] = torch.zeros(dim)
            sd[f"{p}.attn.qkv.weight"] = _t(3 * dim, dim)
            sd[f"{p}.attn.qkv.bias"] = _t(3 * dim)
            sd[f"{p}.attn.proj.weight"] = _t(dim, dim)
            sd[f"{p}.attn.proj.bias"] = _t(dim)
            sd[f"{p}.attn.relative_position_bias_table"] = _t((2 * window - 1) ** 2, nh)
            sd[f"{p}.attn.relative_position_index"] = torch.zeros(
                window * window, window * window, dtype=torch.long)
            sd[f"{p}.norm2.weight"] = torch.ones(dim)
            sd[f"{p}.norm2.bias"] = torch.zeros(dim)
            sd[f"{p}.mlp.fc1.weight"] = _t(4 * dim, dim)
            sd[f"{p}.mlp.fc1.bias"] = _t(4 * dim)
            sd[f"{p}.mlp.fc2.weight"] = _t(dim, 4 * dim)
            sd[f"{p}.mlp.fc2.bias"] = _t(dim)
        if s < len(depths) - 1:
            sd[f"layers.{s}.downsample.reduction.weight"] = _t(2 * dim, 4 * dim)
            sd[f"layers.{s}.downsample.norm.weight"] = torch.ones(4 * dim)
            sd[f"layers.{s}.downsample.norm.bias"] = torch.zeros(4 * dim)
            dim *= 2
    sd["norm.weight"] = torch.ones(dim)
    sd["norm.bias"] = torch.zeros(dim)
    sd["head.weight"] = _t(10, dim)  # classifier, must be ignored
    return sd


def test_swin_import_roundtrip(tmp_path):
    cfg = swin_config(image_res=32, patch_size=4, embed_dim=16,
                      depths=(2, 2), num_heads=(2, 4), window_size=4)
    sd_torch = make_swin_sd()
    path = str(tmp_path / "swin.pth")
    torch.save({"model": sd_torch}, path)

    from efficientvlm_tpu.train.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(path)
    params = swin_params_from_state_dict(sd, depths=cfg["depths"], window_size=cfg["window_size"])

    # structure matches a fresh init
    ref = init_swin(jax.random.PRNGKey(0), cfg)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    # weights actually round-trip (qkv kernel is the torch weight^T)
    w = np.asarray(sd_torch["layers.0.blocks.0.attn.qkv.weight"])
    np.testing.assert_allclose(np.asarray(params["stages"][0]["blocks"][0]["qkv"]["kernel"]), w.T, rtol=1e-6)

    out = jax.jit(lambda p, x: swin_apply(p, x, cfg))(params, jnp.zeros((2, 32, 32, 3)))
    assert out["last_hidden"].shape == (2, 1 + 4 * 4, cfg["vision_width"])
    assert bool(jnp.isfinite(out["last_hidden"]).all())


def test_swin_rel_bias_interpolation():
    """window 4 ckpt loaded into a window-6 model: table resized 7x7->11x11."""
    src = torch.randn(49, 3)  # (2*4-1)^2
    out = interpolate_relative_pos_embed(src.numpy(), (2 * 6 - 1) ** 2)
    assert out.shape == (121, 3)
    assert bool(jnp.isfinite(out).all())
    # same-size: identity
    same = interpolate_relative_pos_embed(src.numpy(), 49)
    np.testing.assert_allclose(np.asarray(same), src.numpy(), rtol=1e-6)


def make_deit_sd(dim=32, layers=2, patch=8, n_pos=17):
    sd = {
        "cls_token": _t(1, 1, dim),
        "pos_embed": _t(1, n_pos, dim),
        "patch_embed.proj.weight": _t(dim, 3, patch, patch),
        "patch_embed.proj.bias": _t(dim),
        "norm.weight": torch.ones(dim),
        "norm.bias": torch.zeros(dim),
        "head.weight": _t(10, dim),
    }
    for i in range(layers):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.ones(dim)
        sd[f"{p}.norm1.bias"] = torch.zeros(dim)
        sd[f"{p}.attn.qkv.weight"] = _t(3 * dim, dim)
        sd[f"{p}.attn.qkv.bias"] = _t(3 * dim)
        sd[f"{p}.attn.proj.weight"] = _t(dim, dim)
        sd[f"{p}.attn.proj.bias"] = _t(dim)
        sd[f"{p}.norm2.weight"] = torch.ones(dim)
        sd[f"{p}.norm2.bias"] = torch.zeros(dim)
        sd[f"{p}.mlp.fc1.weight"] = _t(2 * dim, dim)
        sd[f"{p}.mlp.fc1.bias"] = _t(2 * dim)
        sd[f"{p}.mlp.fc2.weight"] = _t(dim, 2 * dim)
        sd[f"{p}.mlp.fc2.bias"] = _t(dim)
    return sd


def test_deit_import_roundtrip(tmp_path):
    cfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=32, patch_size=8,
    )
    sd_torch = make_deit_sd()
    path = str(tmp_path / "deit.pth")
    torch.save({"model": sd_torch}, path)

    from efficientvlm_tpu.train.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(path)
    params = deit_params_from_state_dict(sd, 2, num_patches=cfg.num_patches)

    ref = init_deit(jax.random.PRNGKey(0), cfg)
    assert jax.tree.map(lambda x: x.shape, ref) == jax.tree.map(lambda x: x.shape, params)

    # fused qkv split: q rows are the first dim rows of the fused weight
    qkv = np.asarray(sd_torch["blocks.0.attn.qkv.weight"])
    np.testing.assert_allclose(np.asarray(params["layers"][0]["attn"]["q"]["kernel"]), qkv[:32].T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layers"][0]["attn"]["v"]["kernel"]), qkv[64:].T, rtol=1e-6)

    out = jax.jit(lambda p, x: deit_apply(p, x, cfg))(params, jnp.zeros((2, 32, 32, 3)))
    assert out["last_hidden"].shape == (2, 17, 32)
    assert bool(jnp.isfinite(out["last_hidden"]).all())


def test_deit_pos_embed_interpolation(tmp_path):
    """pos_embed from a 16-patch (4x4) ckpt interpolated to 64 patches (8x8)."""
    cfg = VisionConfig.create(
        vision_width=32, num_attention_heads=4, intermediate_size=64,
        num_hidden_layers=2, image_res=64, patch_size=8,  # 8x8 = 64 patches
    )
    sd_torch = make_deit_sd(n_pos=17)  # 16 patches + cls
    path = str(tmp_path / "deit2.pth")
    torch.save({"model": sd_torch}, path)
    from efficientvlm_tpu.train.checkpoint import load_torch_state_dict

    params = deit_params_from_state_dict(load_torch_state_dict(path), 2, num_patches=64)
    assert params["pos_embed"]["embedding"].shape == (65, 32)


def test_alt_vision_params_dispatch(tmp_path):
    from efficientvlm_tpu.train.checkpoint import alt_vision_params_from_file

    cfg = swin_config(image_res=32, patch_size=4, embed_dim=16,
                      depths=(2, 2), num_heads=(2, 4), window_size=4)
    path = str(tmp_path / "swin.pth")
    torch.save({"model": make_swin_sd()}, path)
    params = alt_vision_params_from_file(path, Config({"use_swin": True}), cfg)
    assert "stages" in params
