"""CLIP tower parity vs an independent torch implementation using the
open_clip state-dict layout, plus tokenizer unit tests."""

import gzip
import math

import numpy as np
import pytest
import jax.numpy as jnp
import jax

torch = pytest.importorskip("torch")
import torch.nn as nn

from bsc_nav_tpu.models.clip import (
    CLIP_VITB32_TEST, convert_openclip, encode_image, encode_text,
    init_params, preprocess)
from bsc_nav_tpu.models import tokenizer as tok

CFG = CLIP_VITB32_TEST


class TorchBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d, eps=1e-5)
        self.attn = nn.MultiheadAttention(d, h, batch_first=True)
        self.ln_2 = nn.LayerNorm(d, eps=1e-5)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, 4 * d))
        self.mlp.add_module("gelu", nn.GELU(approximate="tanh"))
        self.mlp.add_module("c_proj", nn.Linear(4 * d, d))

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        a, _ = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchCLIPMini(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        vw, tw = cfg.vision_width, cfg.text_width
        self.cfg = cfg
        # visual
        self.conv1 = nn.Conv2d(3, vw, cfg.patch_size, cfg.patch_size,
                               bias=False)
        self.class_embedding = nn.Parameter(torch.randn(vw) * 0.02)
        self.v_pos = nn.Parameter(torch.randn(cfg.grid ** 2 + 1, vw) * 0.02)
        self.ln_pre = nn.LayerNorm(vw, eps=1e-5)
        self.vblocks = nn.ModuleList(
            [TorchBlock(vw, cfg.vision_heads) for _ in range(cfg.vision_layers)])
        self.ln_post = nn.LayerNorm(vw, eps=1e-5)
        self.v_proj = nn.Parameter(torch.randn(vw, cfg.embed_dim) / math.sqrt(vw))
        # text
        self.token_embedding = nn.Embedding(cfg.vocab_size, tw)
        self.t_pos = nn.Parameter(torch.randn(cfg.context_length, tw) * 0.01)
        self.tblocks = nn.ModuleList(
            [TorchBlock(tw, cfg.text_heads) for _ in range(cfg.text_layers)])
        self.ln_final = nn.LayerNorm(tw, eps=1e-5)
        self.t_proj = nn.Parameter(torch.randn(tw, cfg.embed_dim) / math.sqrt(tw))
        self.logit_scale = nn.Parameter(torch.tensor(np.log(1 / 0.07)))

    def encode_image(self, x):
        x = self.conv1(x).flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], 1) + self.v_pos[None]
        x = self.ln_pre(x)
        for b in self.vblocks:
            x = b(x)
        x = self.ln_post(x[:, 0])
        f = x @ self.v_proj
        return f / f.norm(dim=-1, keepdim=True)

    def encode_text(self, ids):
        x = self.token_embedding(ids) + self.t_pos[None]
        L = ids.shape[1]
        mask = torch.full((L, L), float("-inf")).triu(1)
        for b in self.tblocks:
            x = b(x, attn_mask=mask)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        f = pooled @ self.t_proj
        return f / f.norm(dim=-1, keepdim=True)

    def openclip_state_dict(self):
        sd = {}
        sd["visual.conv1.weight"] = self.conv1.weight
        sd["visual.class_embedding"] = self.class_embedding
        sd["visual.positional_embedding"] = self.v_pos
        sd["visual.ln_pre.weight"] = self.ln_pre.weight
        sd["visual.ln_pre.bias"] = self.ln_pre.bias
        sd["visual.ln_post.weight"] = self.ln_post.weight
        sd["visual.ln_post.bias"] = self.ln_post.bias
        sd["visual.proj"] = self.v_proj
        sd["token_embedding.weight"] = self.token_embedding.weight
        sd["positional_embedding"] = self.t_pos
        sd["ln_final.weight"] = self.ln_final.weight
        sd["ln_final.bias"] = self.ln_final.bias
        sd["text_projection"] = self.t_proj
        sd["logit_scale"] = self.logit_scale

        def tower(prefix, blocks):
            for i, b in enumerate(blocks):
                p = f"{prefix}.resblocks.{i}"
                sd[f"{p}.ln_1.weight"] = b.ln_1.weight
                sd[f"{p}.ln_1.bias"] = b.ln_1.bias
                sd[f"{p}.attn.in_proj_weight"] = b.attn.in_proj_weight
                sd[f"{p}.attn.in_proj_bias"] = b.attn.in_proj_bias
                sd[f"{p}.attn.out_proj.weight"] = b.attn.out_proj.weight
                sd[f"{p}.attn.out_proj.bias"] = b.attn.out_proj.bias
                sd[f"{p}.ln_2.weight"] = b.ln_2.weight
                sd[f"{p}.ln_2.bias"] = b.ln_2.bias
                sd[f"{p}.mlp.c_fc.weight"] = b.mlp.c_fc.weight
                sd[f"{p}.mlp.c_fc.bias"] = b.mlp.c_fc.bias
                sd[f"{p}.mlp.c_proj.weight"] = b.mlp.c_proj.weight
                sd[f"{p}.mlp.c_proj.bias"] = b.mlp.c_proj.bias

        tower("visual.transformer", self.vblocks)
        tower("transformer", self.tblocks)
        return sd


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(1)
    tmodel = TorchCLIPMini(CFG).eval()
    params = convert_openclip(tmodel.openclip_state_dict(), CFG)
    return tmodel, params


def test_image_tower_parity(pair):
    tmodel, params = pair
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        t_feat = tmodel.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    j_feat = np.asarray(encode_image(params, jnp.asarray(img), CFG))
    np.testing.assert_allclose(j_feat, t_feat, rtol=2e-4, atol=2e-4)


def test_text_tower_parity(pair):
    tmodel, params = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(1, CFG.vocab_size - 1,
                       size=(3, CFG.context_length)).astype(np.int64)
    ids[:, 0] = 5
    ids[0, 7] = CFG.vocab_size - 1   # EOT-style max token mid-sequence
    with torch.no_grad():
        t_feat = tmodel.encode_text(torch.from_numpy(ids)).numpy()
    j_feat = np.asarray(encode_text(params, jnp.asarray(ids, jnp.int32), CFG))
    np.testing.assert_allclose(j_feat, t_feat, rtol=3e-4, atol=3e-4)


def test_random_init_and_preprocess():
    params = init_params(CFG, jax.random.PRNGKey(0))
    img = np.random.default_rng(0).integers(
        0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    x = preprocess(jnp.asarray(img), CFG)
    assert x.shape == (2, CFG.image_size, CFG.image_size, 3)
    f = encode_image(params, x, CFG)
    assert f.shape == (2, CFG.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(f), axis=-1), 1.0, rtol=1e-5)


# --- tokenizer -------------------------------------------------------------

def test_hash_tokenizer_contract():
    t = tok.HashTokenizer(vocab_size=512, context_length=16)
    ids = tok.tokenize(["a chair", "a chair", "a sofa"], t)
    assert ids.shape == (3, 16)
    np.testing.assert_array_equal(ids[0], ids[1])
    assert not (ids[0] == ids[2]).all()
    assert ids[0, 0] == t.sot
    assert t.eot in ids[0]
    assert (ids < 512).all() and (ids >= 0).all()


def test_bpe_tokenizer_machinery(tmp_path):
    """Exercise the BPE merge algorithm with a tiny synthetic merges file."""
    merges = ["#version: 0.2",
              "h e", "he l", "hel l", "hell o</w>", "w o", "wo r",
              "wor l", "worl d</w>"]
    path = str(tmp_path / "bpe.txt.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    t = tok.BPETokenizer(path, context_length=16)
    ids_hello = t.encode("hello")
    assert len(ids_hello) == 1          # fully merged single token
    assert t.encode("hello") == ids_hello  # cache determinism
    ids_world = t.encode("world")
    assert len(ids_world) == 1
    assert ids_hello != ids_world
    # unknown word falls back to byte-ish pieces
    assert len(t.encode("zq")) >= 1
    arr = tok.tokenize("hello world", t)
    assert arr.shape == (1, 16)
    assert arr[0, 0] == t.sot and arr[0, 3] == t.eot
