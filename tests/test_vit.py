"""ViT forward + checkpoint-conversion parity against an independent
torch implementation of the DINOv2 block structure (tiny config).

This validates (a) the vit.py forward math and (b) the weights.py
state-dict name mapping, without needing real DINOv2 checkpoints
(no network egress in CI).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn

from bsc_nav_tpu.models.vit import (
    ViTConfig, forward_features, init_params, preprocess)
from bsc_nav_tpu.models.weights import (
    convert_dinov2, flatten_params, save_params_npz, load_dinov2_npz,
    unflatten_params)


CFG = ViTConfig(img_size=32, patch_size=8, dim=64, depth=2, heads=4,
                num_registers=1, layerscale=True)


class TorchAttn(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)

    def forward(self, x):
        B, S, D = x.shape
        qkv = self.qkv(x).reshape(B, S, 3, self.h, D // self.h)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(D // self.h),
                            dim=-1)
        out = (att @ v).transpose(1, 2).reshape(B, S, D)
        return self.proj(out)


class TorchLS(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.gamma = nn.Parameter(torch.randn(d) * 0.1)

    def forward(self, x):
        return x * self.gamma


class TorchMlp(nn.Module):
    def __init__(self, d, hidden):
        super().__init__()
        self.fc1 = nn.Linear(d, hidden)
        self.fc2 = nn.Linear(hidden, d)

    def forward(self, x):
        # tanh approximation matches the JAX side's production default
        # (ViTConfig.gelu_exact=False); drift vs erf is < 1e-5 rel
        return self.fc2(nn.functional.gelu(self.fc1(x),
                                           approximate="tanh"))


class TorchBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = TorchAttn(d, h)
        self.ls1 = TorchLS(d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = TorchMlp(d, int(d * 4))
        self.ls2 = TorchLS(d)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class TorchPatchEmbed(nn.Module):
    def __init__(self, d, p):
        super().__init__()
        self.proj = nn.Conv2d(3, d, kernel_size=p, stride=p)


class TorchDinoMini(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.dim
        self.patch_embed = TorchPatchEmbed(d, cfg.patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, 1 + cfg.num_patches, d) * 0.02)
        self.register_tokens = nn.Parameter(
            torch.randn(1, cfg.num_registers, d) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(d, cfg.heads) for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(d, eps=1e-6)
        self.cfg = cfg

    def forward_features(self, x):  # x: [B, 3, H, W]
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        x = torch.cat(
            [x[:, :1], self.register_tokens.expand(B, -1, -1), x[:, 1:]],
            dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        r = self.cfg.num_registers
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_patchtokens": x[:, 1 + r:],
        }


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = TorchDinoMini(CFG).eval()
    params = convert_dinov2(tmodel.state_dict(), CFG)
    return tmodel, params


def test_forward_parity(pair):
    tmodel, params = pair
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel.forward_features(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))

    j_out = forward_features(params, jnp.asarray(img), CFG)

    np.testing.assert_allclose(
        np.asarray(j_out["x_norm_patchtokens"]),
        t_out["x_norm_patchtokens"].numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_out["x_norm_clstoken"]),
        t_out["x_norm_clstoken"].numpy(), rtol=2e-4, atol=2e-4)


def test_patch_grid_shape(pair):
    _, params = pair
    img = jnp.zeros((1, 32, 32, 3))
    out = forward_features(params, img, CFG)
    assert out["x_norm_patchtokens"].shape == (1, 16, CFG.dim)
    assert out["x_norm_regtokens"].shape == (1, 1, CFG.dim)


def test_pos_embed_interpolation(pair):
    """Different input resolution must still run (DINOv2
    interpolate_pos_encoding path)."""
    _, params = pair
    img = jnp.zeros((1, 48, 48, 3))
    out = forward_features(params, img, CFG)
    assert out["x_norm_patchtokens"].shape == (1, 36, CFG.dim)


def test_params_npz_roundtrip(pair, tmp_path):
    _, params = pair
    path = str(tmp_path / "vit.npz")
    save_params_npz(params, path)
    params2 = load_dinov2_npz(path, CFG)
    f1, f2 = flatten_params(params), flatten_params(params2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=1e-6)


def test_preprocess_matches_torchvision_normalize():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(1, 16, 16, 3), dtype=np.uint8)
    ours = np.asarray(preprocess(jnp.asarray(img)))
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    expected = (img.astype(np.float32) / 255 - mean) / std
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_random_init_runs():
    cfg = ViTConfig(img_size=28, patch_size=14, dim=32, depth=2, heads=2,
                    num_registers=4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    out = forward_features(params, jnp.zeros((2, 28, 28, 3)), cfg)
    assert out["x_norm_patchtokens"].shape == (2, 4, 32)


def test_gelu_exact_flag_close_to_default():
    """gelu_exact=True (erf) and the fast tanh default agree to ~1e-4:
    safe to serve checkpoints trained with exact GELU on the fast path."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    cfg = ViTConfig(img_size=28, patch_size=14, dim=32, depth=2, heads=2,
                    num_registers=1)
    params = init_params(cfg, jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 28, 28, 3))
    f_fast = forward_features(params, x, cfg)["x_norm_patchtokens"]
    cfg_e = dataclasses.replace(cfg, gelu_exact=True)
    f_exact = forward_features(params, x, cfg_e)["x_norm_patchtokens"]
    np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_exact),
                               atol=1e-3)
