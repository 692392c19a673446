"""Vision Transformer (DINOv2-family) as pure JAX functions.

Serves the reference's frozen patch encoder (reference memory_2.py:43
loads `dinov2_vitl14_reg` via torch.hub; tokens consumed at
memory_2.py:732-742 as `x_norm_patchtokens`).  Re-implemented from the
architecture spec, TPU-first:

  - patch embedding as an unfold+matmul (MXU-friendly, no conv layout
    shuffles),
  - attention through the Pallas flash kernel (ops/flash_attention),
  - bf16-friendly: params can be cast; LayerNorm/softmax accumulate f32.

Params are plain nested dicts (converted from torch checkpoints by
models/weights.py when available, or randomly initialized).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsc_nav_tpu.ops.flash_attention import (
    attention, attention_from_qkv, attention_from_qkv_tp)

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 14
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    num_registers: int = 4
    layerscale: bool = True
    qkv_bias: bool = True
    ffn: str = "mlp"              # "mlp" | "swiglu"
    ln_eps: float = 1e-6
    # tanh-approx GELU: ~36% faster MLP stack on TPU (erf is VPU-bound);
    # feature drift vs exact is < 1e-5 rel (token cosine >= 0.9999999),
    # far below bf16 resolution.  Set True for bit-level torch parity.
    gelu_exact: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


DINOV2_VITS14_REG = ViTConfig(dim=384, depth=12, heads=6)
DINOV2_VITB14_REG = ViTConfig(dim=768, depth=12, heads=12)
DINOV2_VITL14_REG = ViTConfig(dim=1024, depth=24, heads=16)
DINOV2_VITG14_REG = ViTConfig(dim=1536, depth=40, heads=24, ffn="swiglu")

CONFIGS = {
    "dinov2_vits14_reg": DINOV2_VITS14_REG,
    "dinov2_vitb14_reg": DINOV2_VITB14_REG,
    "dinov2_vitl14_reg": DINOV2_VITL14_REG,
    "dinov2_vitg14_reg": DINOV2_VITG14_REG,
}


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init_params(cfg: ViTConfig, key: jnp.ndarray,
                dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 8 + cfg.depth)
    d, p = cfg.dim, cfg.patch_size
    hidden = int(cfg.dim * cfg.mlp_ratio)

    def lin(k, fan_in, fan_out, bias=True):
        w = jax.random.normal(k, (fan_in, fan_out), dtype) / math.sqrt(fan_in)
        out = {"w": w}
        if bias:
            out["b"] = jnp.zeros((fan_out,), dtype)
        return out

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(ks[8 + i], 4)
        blk = {
            "ln1": ln(),
            "qkv": lin(bk[0], d, 3 * d, bias=cfg.qkv_bias),
            "proj": lin(bk[1], d, d),
            "ln2": ln(),
        }
        if cfg.ffn == "swiglu":
            blk["fc1"] = lin(bk[2], d, 2 * hidden)
            blk["fc2"] = lin(bk[3], hidden, d)
        else:
            blk["fc1"] = lin(bk[2], d, hidden)
            blk["fc2"] = lin(bk[3], hidden, d)
        if cfg.layerscale:
            blk["ls1"] = jnp.full((d,), 1e-5, dtype)
            blk["ls2"] = jnp.full((d,), 1e-5, dtype)
        blocks.append(blk)

    params = {
        "patch_embed": lin(ks[0], p * p * 3, d),
        "cls_token": jax.random.normal(ks[1], (1, 1, d), dtype) * 0.02,
        "pos_embed": jax.random.normal(
            ks[2], (1, 1 + cfg.num_patches, d), dtype) * 0.02,
        "norm": ln(),
        "blocks": blocks,
    }
    if cfg.num_registers:
        params["reg_token"] = (
            jax.random.normal(ks[3], (1, cfg.num_registers, d), dtype) * 0.02
        )
    return params


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def layer_norm(x, p, eps):
    # Measured negative result (r3): a Pallas LN kernel
    # (ops/layernorm.py) loses 2.3 ms in-context on the full ViT-L
    # encoder (37.6 -> 39.6-40.1 ms/b32 across bm 128/256/512/2048)
    # even though the isolated trace attributed 20.5 ms to LN reduce
    # fusions -- XLA overlaps those cross-lane reductions with MXU
    # work, so replacing them buys nothing and breaks fusion.  Keep
    # the jnp formulation.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _linear(x, p):
    if "w_q" in p:      # int8 W8A8 leaf (quantize_params / ops/quant.py)
        from bsc_nav_tpu.ops.quant import linear_q8
        return linear_q8(x, p)
    y = jnp.einsum("...d,df->...f", x, p["w"],
                   preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_params(params):
    """int8-quantize the per-block token matmuls (W8A8, ops/quant.py):
    qkv / proj / fc1 / fc2.  Serving-only option for the frozen encoder
    (same role as mmdit.quantize_params); patch_embed, layer norms,
    layer scales and tokens stay bf16.  NOT composable with
    shard_vit_params TP layouts (TP serving keeps bf16)."""
    from bsc_nav_tpu.ops.quant import quantize_weight
    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = []
    for blk in params["blocks"]:
        nb = dict(blk)
        for k in ("qkv", "proj", "fc1", "fc2"):
            if k in nb:
                nb[k] = quantize_weight(nb[k])
        blocks.append(nb)
    out["blocks"] = blocks
    return out


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, T, patch*patch*3] with (ph, pw, c) inner order."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)                  # [B, gh, gw, p, p, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def interpolate_pos_embed(pos: jnp.ndarray, grid_hw) -> jnp.ndarray:
    """Bicubic resize of the patch position grid for non-default image
    sizes (DINOv2 interpolate_pos_encoding behavior).  grid_hw: target
    (gh, gw) -- resized per axis, so non-square inputs interpolate
    correctly instead of assuming a square token count."""
    gh, gw = grid_hw
    n0 = pos.shape[1] - 1
    if n0 == gh * gw and gh == gw:
        return pos
    g0 = int(round(math.sqrt(n0)))
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    grid = patch_pos.reshape(1, g0, g0, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, -1)], axis=1)


def _block(x, blk, cfg: ViTConfig, tp_mesh=None):
    B, S, D = x.shape
    h, hd = cfg.heads, cfg.head_dim

    y = layer_norm(x, blk["ln1"], cfg.ln_eps)
    # fused qkv -> attention without head transposes where the Pallas
    # kernel applies (TPU, S <= 640, head_dim 64); else split/transpose.
    # Under tensor parallelism (tp_mesh) the qkv weight columns are in
    # the head-blocked TP layout (parallel/mesh.shard_vit_params) and
    # attention runs per-shard via shard_map -- zero collectives here
    # (the row-parallel proj below carries the psum).
    qkv_act = _linear(y, blk["qkv"])
    if tp_mesh is not None and tp_mesh.shape.get("mp", 1) > 1:
        att = attention_from_qkv_tp(qkv_act, heads=h, mesh=tp_mesh)
    else:
        att = attention_from_qkv(qkv_act, heads=h)          # [B, S, D]
    att = _linear(att, blk["proj"])
    if "ls1" in blk:
        att = att * blk["ls1"].astype(att.dtype)
    x = x + att

    y = layer_norm(x, blk["ln2"], cfg.ln_eps)
    if cfg.ffn == "swiglu":
        u = _linear(y, blk["fc1"])
        a, b = jnp.split(u, 2, axis=-1)
        y = _linear(jax.nn.silu(a) * b, blk["fc2"])
    else:
        y = _linear(jax.nn.gelu(_linear(y, blk["fc1"]),
                                approximate=not cfg.gelu_exact),
                    blk["fc2"])
    if "ls2" in blk:
        y = y * blk["ls2"].astype(y.dtype)
    return x + y


def forward_features(params: Dict[str, Any], images: jnp.ndarray,
                     cfg: ViTConfig, tp_mesh=None) -> Dict[str, jnp.ndarray]:
    """images: [B, H, W, 3] already normalized float.  Returns the
    reference's forward_features dict fields (x_norm_patchtokens,
    x_norm_clstoken, x_norm_regtokens).

    tp_mesh: pass the device mesh when params were sharded with
    `shard_vit_params(..., tp_qkv_layout=True)` -- attention then runs
    tensor-parallel per shard instead of through GSPMD gathers."""
    B, H, W, _ = images.shape
    grid_hw = (H // cfg.patch_size, W // cfg.patch_size)

    x = _linear(patchify(images, cfg.patch_size), params["patch_embed"])
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params["pos_embed"],
                                  grid_hw).astype(x.dtype)

    n_reg = cfg.num_registers
    if n_reg:
        reg = jnp.broadcast_to(
            params["reg_token"], (B, n_reg, cfg.dim)).astype(x.dtype)
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    for blk in params["blocks"]:
        x = _block(x, blk, cfg, tp_mesh=tp_mesh)

    x = layer_norm(x, params["norm"], cfg.ln_eps)
    return {
        "x_norm_clstoken": x[:, 0],
        "x_norm_regtokens": x[:, 1:1 + n_reg],
        "x_norm_patchtokens": x[:, 1 + n_reg:],
    }


# numpy (not jnp) on purpose: module-scope device arrays would
# initialize the backend at import time, grabbing the tunneled TPU
# from any process that merely imports the package
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def preprocess(images_uint8: jnp.ndarray, out_hw: Optional[tuple] = None,
               mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """uint8 [B, H, W, 3] -> normalized float32, optionally resized
    (reference transform_, memory_2.py:71-74)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    if out_hw is not None and out_hw != images_uint8.shape[1:3]:
        B = x.shape[0]
        x = jax.image.resize(x, (B, out_hw[0], out_hw[1], 3), "bilinear")
    return (x - mean) / std
