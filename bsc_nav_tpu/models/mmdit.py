"""MMDiT: multimodal diffusion transformer for text->image "imagination".

Fills the reference's SD3.5-medium role (reference memory_2.py:542-560
loads an NF4-quantized SD3 transformer via diffusers; `imaginary`
:258-276 samples 3 images / 28 steps / cfg 7.0 per text query).  This is
a from-scratch JAX implementation of the SD3-family architecture:

  - joint (dual-stream) transformer blocks: separate context/latent
    streams with adaLN-Zero modulation, attention computed over the
    CONCATENATED token sequence (the 4k+-token joint attention SURVEY
    §2.4 calls out for blockwise kernels), per-head RMS QK-norm
    (the 3.5 revision), shared timestep/pooled conditioning;
  - rectified-flow Euler sampler with the SD3 timestep shift;
  - bf16-friendly: modulation/softmax in f32.

On TPU the joint attention runs through the Pallas flash kernel.  Weight
conversion from public SD3 checkpoints maps onto this layout
(models/weights.py conventions); no weights ship here.  The VAE decoder
lives in models/vae.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from bsc_nav_tpu.models.vit import layer_norm
from bsc_nav_tpu.ops.flash_attention import (
    attention, joint_qkv_attention, joint_qkv_attention_tp,
    self_qkv_dispatch, use_joint_qkv_attention)
# dispatching linear: serves both bf16 ({"w", ...}) and int8-quantized
# ({"w_q", "w_s", ...}) leaves, so quantize_params below can swap the
# token matmuls to W8A8 (the reference's NF4 `Quantizing` role,
# memory_2.py:542-560) without touching the forward code
from bsc_nav_tpu.ops.quant import linear as _linear


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    input_size: int = 64           # latent spatial size (512px / 8)
    patch_size: int = 2
    in_channels: int = 16          # SD3 VAE latent channels
    dim: int = 1536
    depth: int = 24
    heads: int = 24
    context_dim: int = 4096        # T5-XXL width (joint text stream)
    pooled_dim: int = 2048         # CLIP-L + CLIP-G pooled concat
    qk_norm: bool = True           # SD3.5 revision
    ln_eps: float = 1e-6
    # MMDiT-X (SD3.5-medium): blocks with an EXTRA self-attention on the
    # latent stream (diffusers dual_attention_layers; 9-chunk
    # AdaLayerNormZeroX modulation).  SD3.5-large/SD3-medium: empty.
    dual_attention_layers: tuple = ()

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2


# stabilityai/stable-diffusion-3.5-medium transformer config: 24 layers
# x 24 heads x 64 head_dim, dual attention in blocks 0-12 (MMDiT-X)
SD35_MEDIUM = MMDiTConfig(dual_attention_layers=tuple(range(13)))
MMDIT_TEST = MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                         dim=64, depth=2, heads=4, context_dim=32,
                         pooled_dim=16)
MMDIT_TEST_DUAL = dataclasses.replace(MMDIT_TEST,
                                      dual_attention_layers=(0,))


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init_params(cfg: MMDiTConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 10 + cfg.depth)
    d = cfg.dim

    def lin(k, fi, fo, zero=False):
        w = (jnp.zeros((fi, fo), dtype) if zero
             else jax.random.normal(k, (fi, fo), dtype) / math.sqrt(fi))
        return {"w": w, "b": jnp.zeros((fo,), dtype)}

    def stream(key, dual=False):
        bk = jax.random.split(key, 8)
        s = {
            "qkv": lin(bk[0], d, 3 * d),
            "proj": lin(bk[1], d, d),
            # adaLN-Zero; dual blocks (MMDiT-X) modulate with 9 chunks
            # (AdaLayerNormZeroX: ...gate_mlp, shift_msa2, scale_msa2,
            # gate_msa2)
            "mod": lin(bk[2], d, (9 if dual else 6) * d, zero=True),
            "fc1": lin(bk[3], d, 4 * d),
            "fc2": lin(bk[4], 4 * d, d),
        }
        if cfg.qk_norm:
            s["q_norm"] = jnp.ones((cfg.head_dim,), dtype)
            s["k_norm"] = jnp.ones((cfg.head_dim,), dtype)
        if dual:
            s["qkv2"] = lin(bk[5], d, 3 * d)
            s["proj2"] = lin(bk[6], d, d)
            if cfg.qk_norm:
                s["q_norm2"] = jnp.ones((cfg.head_dim,), dtype)
                s["k_norm2"] = jnp.ones((cfg.head_dim,), dtype)
        return s

    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(ks[10 + i], 2)
        blocks.append({
            "x": stream(bk[0], dual=i in cfg.dual_attention_layers),
            "ctx": stream(bk[1])})

    p = cfg.patch_size
    return {
        "patch_embed": lin(ks[0], p * p * cfg.in_channels, d),
        "pos_embed": jax.random.normal(
            ks[1], (1, cfg.num_patches, d), dtype) * 0.01,
        "t_embed1": lin(ks[2], 256, d),
        "t_embed2": lin(ks[3], d, d),
        "pooled_embed1": lin(ks[4], cfg.pooled_dim, d),
        "pooled_embed2": lin(ks[5], d, d),
        "ctx_embed": lin(ks[6], cfg.context_dim, d),
        "final_mod": lin(ks[7], d, 2 * d, zero=True),
        "final_out": lin(ks[8], d, p * p * cfg.in_channels, zero=True),
        "blocks": blocks,
    }


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def timestep_embedding(t: jnp.ndarray, dim: int = 256,
                       max_period: float = 10000.0) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None] * 1000.0
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def _rms_head_norm(x, gamma):
    # x: [B, H, S, hd]
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-6)
            * gamma.astype(jnp.float32)).astype(x.dtype)


_LN_NONE = {"scale": None, "bias": None}


def _pre_norm(x, eps):
    """Non-affine LayerNorm (the adaLN formulation)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _stream_qkv(x, s, cfg: MMDiTConfig):
    B, S, D = x.shape
    qkv = _linear(x, s["qkv"]).reshape(B, S, 3, cfg.heads, cfg.head_dim)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    if cfg.qk_norm:
        q = _rms_head_norm(q, s["q_norm"])
        k = _rms_head_norm(k, s["k_norm"])
    return q, k, v


def _joint_block(x, ctx, c, blk, cfg: MMDiTConfig, tp_mesh=None,
                 mods=None):
    """One dual-stream block: both streams contribute tokens to one
    attention, then mix back into their own residuals.

    tp_mesh: pass the device mesh when params were sharded with
    parallel/mesh.shard_mmdit_params -- attention then runs
    tensor-parallel per shard on local heads (the permuted qkv column
    layout makes the plain reshape path invalid, so the TP branch is
    mandatory for sharded params).

    mods: precomputed {"x": [chunks], "ctx": [chunks]} adaLN
    modulation (see fuse_mods); when None it is computed here from the
    per-block "mod" linears."""
    if mods is None:
        mods = {}
        for name in ("x", "ctx"):
            m = _linear(jax.nn.silu(c), blk[name]["mod"])
            mods[name] = jnp.split(m, m.shape[-1] // cfg.dim, axis=-1)
    # context_pre_only (the last SD3 block): the ctx stream only feeds
    # attention k/v through a 2-chunk shift/scale norm (diffusers
    # AdaLayerNormContinuous) -- no gate, no ctx FFN, ctx not updated
    ctx_pre_only = len(mods["ctx"]) == 2

    xpn = _pre_norm(x, cfg.ln_eps)
    xn = _modulate(xpn, mods["x"][0], mods["x"][1])
    cn = _modulate(_pre_norm(ctx, cfg.ln_eps), mods["ctx"][0], mods["ctx"][1])

    Sx, Sc = x.shape[1], ctx.shape[1]
    if tp_mesh is not None and tp_mesh.shape.get("mp", 1) > 1:
        qkv_xa = _linear(xn, blk["x"]["qkv"])
        qkv_ca = _linear(cn, blk["ctx"]["qkv"])
        att = joint_qkv_attention_tp(
            qkv_xa, qkv_ca, cfg.heads,
            blk["x"].get("q_norm"), blk["x"].get("k_norm"),
            blk["ctx"].get("q_norm"), blk["ctx"].get("k_norm"),
            mesh=tp_mesh)
        att_x, att_c = att[:, :Sx], att[:, Sx:]
    elif use_joint_qkv_attention(Sx + Sc, cfg.heads, cfg.head_dim,
                                 cfg.qk_norm):
        # fused path: attention reads head column-blocks straight from
        # the [B, S, 3D] qkv matmul outputs (x rows first) and applies
        # the per-stream RMS qk-norm in kernel -- no head transposes,
        # no 4-D concats (ops/flash_attention.joint_qkv_attention)
        qkv_xa = _linear(xn, blk["x"]["qkv"])
        qkv_ca = _linear(cn, blk["ctx"]["qkv"])
        att = joint_qkv_attention(
            qkv_xa, qkv_ca, cfg.heads, blk["x"]["q_norm"],
            blk["x"]["k_norm"], blk["ctx"]["q_norm"],
            blk["ctx"]["k_norm"], eps=1e-6)
        att_x, att_c = att[:, :Sx], att[:, Sx:]
    else:
        qx, kx, vx = _stream_qkv(xn, blk["x"], cfg)
        qc, kc, vc = _stream_qkv(cn, blk["ctx"], cfg)
        q = jnp.concatenate([qc, qx], axis=2)
        k = jnp.concatenate([kc, kx], axis=2)
        v = jnp.concatenate([vc, vx], axis=2)
        att = attention(q, k, v)                      # [B, H, Sc+Sx, hd]
        att = att.transpose(0, 2, 1, 3).reshape(
            x.shape[0], -1, cfg.dim)
        att_c, att_x = att[:, :Sc], att[:, Sc:]

    x = x + mods["x"][2][:, None] * _linear(att_x, blk["x"]["proj"])

    if "qkv2" in blk["x"]:
        # MMDiT-X dual attention (SD3.5-medium blocks 0-12): a second
        # self-attention over the LATENT stream only, modulated by the
        # extra 3 AdaLayerNormZeroX chunks, added after the joint
        # attention residual (diffusers JointTransformerBlock with
        # use_dual_attention=True)
        xn2 = _modulate(xpn, mods["x"][6], mods["x"][7])
        if tp_mesh is None:
            # fused path: the joint-qkv kernel with an empty ctx stream
            # reads head-pair column blocks straight from the [B,S,3D]
            # qkv2 matmul output, RMS qk-norm in kernel -- no head
            # transposes (ops/flash_attention.self_qkv_dispatch)
            qkv2_act = _linear(xn2, blk["x"]["qkv2"])
            att2 = self_qkv_dispatch(
                qkv2_act, cfg.heads,
                blk["x"].get("q_norm2"), blk["x"].get("k_norm2"))
        else:
            # TP: qkv2/proj2 stay replicated (parallel/mesh leaves the
            # dual-attn params unsharded); plain per-shard path
            s2 = {"qkv": blk["x"]["qkv2"]}
            if cfg.qk_norm:
                s2["q_norm"] = blk["x"]["q_norm2"]
                s2["k_norm"] = blk["x"]["k_norm2"]
            q2, k2, v2 = _stream_qkv(xn2, s2, cfg)
            att2 = attention(q2, k2, v2)
            att2 = att2.transpose(0, 2, 1, 3).reshape(
                x.shape[0], Sx, cfg.dim)
        x = x + mods["x"][8][:, None] * _linear(att2, blk["x"]["proj2"])

    xm = _modulate(_pre_norm(x, cfg.ln_eps), mods["x"][3], mods["x"][4])
    x = x + mods["x"][5][:, None] * _linear(
        jax.nn.gelu(_linear(xm, blk["x"]["fc1"]), approximate=True),
        blk["x"]["fc2"])
    if ctx_pre_only:
        return x, ctx
    ctx = ctx + mods["ctx"][2][:, None] * _linear(att_c, blk["ctx"]["proj"])
    cm = _modulate(_pre_norm(ctx, cfg.ln_eps), mods["ctx"][3], mods["ctx"][4])
    ctx = ctx + mods["ctx"][5][:, None] * _linear(
        jax.nn.gelu(_linear(cm, blk["ctx"]["fc1"]), approximate=True),
        blk["ctx"]["fc2"])
    return x, ctx


def patchify_latent(lat: jnp.ndarray, p: int) -> jnp.ndarray:
    B, H, W, C = lat.shape
    x = lat.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def unpatchify_latent(tokens: jnp.ndarray, p: int, h: int, w: int,
                      c: int) -> jnp.ndarray:
    B = tokens.shape[0]
    x = tokens.reshape(B, h // p, w // p, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h, w, c)


def fuse_mods(params, cfg: MMDiTConfig):
    """Stack every adaLN modulation linear (per-block x/ctx "mod" +
    "final_mod") into ONE [D, total] matrix so forward computes all
    modulations in one streaming matmul per step.

    MEASURED NEGATIVE RESULT (kept in tree): the mod weights are ~30%
    of SD3.5-medium (~0.76B params, 1.5 GB bf16) and time at 5.8-6.9 ms
    isolated as 48 separate [B,D]x[D,~10kD] matmuls
    (tools/mmdit_profile.py), but the in-context A/B on the real TPU is
    a dead tie: full forward B=6 118.44 ms per-block vs 118.45 ms
    fused.  XLA already streams/overlaps the per-block mod reads off
    the critical path -- another instance of the "trace-time
    attribution lies about overlapped work" lesson (CLAUDE.md).
    Numerically each output column sees the same D-length reduction,
    so fused == per-block up to matmul tiling (parity-tested in
    tests/test_mmdit.py); the imagination pipeline stays on the
    per-block path.

    Returns (params', layout): params' has blocks without "mod", no
    "final_mod", and a top-level "mods" linear; layout is the static
    tuple of (x_chunks, ctx_chunks) per block for forward's slicing
    (derived from the actual param shapes because the last converted
    block's ctx stream is 2-chunk AdaLayerNormContinuous while
    init_params always emits 6).  Pass layout to forward(mod_layout=).
    Transiently allocates one extra copy of the mod weights; fuse
    before loading other large state.  Not composable with
    shard_mmdit_params (TP keeps the per-block path)."""
    d = cfg.dim
    ws, bs, layout = [], [], []
    new_blocks = []
    for blk in params["blocks"]:
        nb = {}
        chunks = []
        for name in ("x", "ctx"):
            mod = blk[name]["mod"]
            nb[name] = {k: v for k, v in blk[name].items() if k != "mod"}
            ws.append(mod["w"])
            bs.append(mod["b"])
            chunks.append(mod["w"].shape[-1] // d)
        layout.append(tuple(chunks))
        new_blocks.append(nb)
    ws.append(params["final_mod"]["w"])
    bs.append(params["final_mod"]["b"])
    out = {k: v for k, v in params.items()
           if k not in ("blocks", "final_mod")}
    out["blocks"] = new_blocks
    out["mods"] = {"w": jnp.concatenate(ws, axis=-1),
                   "b": jnp.concatenate(bs, axis=-1)}
    return out, tuple(layout)


#: block weights carrying the token-matmul FLOPs (everything whose row
#: count scales with sequence length); modulation/embedding/final
#: matmuls run on [B, D] rows or once per step -- quantizing them buys
#: nothing and they stay bf16
QUANT_KEYS = ("qkv", "proj", "fc1", "fc2", "qkv2", "proj2")


def quantize_params(params, keys=QUANT_KEYS):
    """int8-quantize the per-block token matmuls (W8A8, ops/quant.py).

    The TPU-native stand-in for the reference's NF4-quantized SD3.5
    serving (memory_2.py:542-560): int8 runs the MXU at 2x bf16 peak on
    v5e, so the compute-bound sampler gets faster, not just smaller
    (NF4/bitsandbytes is weight-only and still pays full-rate matmuls).
    forward() needs no flag -- the dispatching linear serves quantized
    and bf16 leaves from one tree.  Composable with fuse_mods (disjoint
    keys); NOT composable with shard_mmdit_params (TP keeps bf16).
    """
    from bsc_nav_tpu.ops.quant import quantize_weight
    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = []
    for blk in params["blocks"]:
        nb = {}
        for name in ("x", "ctx"):
            s = dict(blk[name])
            for k in keys:
                if k in s:
                    s[k] = quantize_weight(s[k])
            nb[name] = s
        blocks.append(nb)
    out["blocks"] = blocks
    return out


def forward(params, latents: jnp.ndarray, t: jnp.ndarray,
            context: jnp.ndarray, pooled: jnp.ndarray,
            cfg: MMDiTConfig, tp_mesh=None, mod_layout=None) -> jnp.ndarray:
    """Velocity prediction.  latents [B, H, W, C]; t [B] in [0, 1];
    context [B, S, context_dim]; pooled [B, pooled_dim].
    tp_mesh: see _joint_block (params sharded via shard_mmdit_params).
    mod_layout: static layout from fuse_mods when params carry the
    fused "mods" linear (one modulation matmul for the whole step)."""
    B, H, W, C = latents.shape
    p = cfg.patch_size

    x = _linear(patchify_latent(latents, p), params["patch_embed"])
    x = x + params["pos_embed"].astype(x.dtype)
    ctx = _linear(context, params["ctx_embed"])

    temb = _linear(jax.nn.silu(_linear(
        timestep_embedding(t), params["t_embed1"])), params["t_embed2"])
    pemb = _linear(jax.nn.silu(_linear(
        pooled, params["pooled_embed1"])), params["pooled_embed2"])
    c = temb + pemb

    d = cfg.dim
    if mod_layout is not None:
        allm = _linear(jax.nn.silu(c), params["mods"])   # [B, total*d]
        off = 0
        for blk, (nx, nc) in zip(params["blocks"], mod_layout):
            mods = {
                "x": [allm[:, (off + i) * d:(off + i + 1) * d]
                      for i in range(nx)],
                "ctx": [allm[:, (off + nx + i) * d:(off + nx + i + 1) * d]
                        for i in range(nc)],
            }
            off += nx + nc
            x, ctx = _joint_block(x, ctx, c, blk, cfg, tp_mesh=tp_mesh,
                                  mods=mods)
        shift = allm[:, off * d:(off + 1) * d]
        scale = allm[:, (off + 1) * d:(off + 2) * d]
    else:
        for blk in params["blocks"]:
            x, ctx = _joint_block(x, ctx, c, blk, cfg, tp_mesh=tp_mesh)
        shift, scale = jnp.split(
            _linear(jax.nn.silu(c), params["final_mod"]), 2, axis=-1)
    x = _modulate(_pre_norm(x, cfg.ln_eps), shift, scale)
    out = _linear(x, params["final_out"])
    return unpatchify_latent(out, p, H, W, C)


# --------------------------------------------------------------------------
# rectified-flow Euler sampler (SD3 formulation)
# --------------------------------------------------------------------------

def shifted_sigmas(num_steps: int, shift: float = 3.0) -> jnp.ndarray:
    """SD3 timestep schedule: sigma in (0, 1], resolution-shifted."""
    t = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
    return shift * t / (1 + (shift - 1) * t)


def sample(params, key, context, pooled, cfg: MMDiTConfig,
           num_steps: int = 28, guidance_scale: float = 7.0,
           context_uncond=None, pooled_uncond=None,
           shift: float = 3.0, mod_layout=None) -> jnp.ndarray:
    """Euler rectified-flow sampling with classifier-free guidance
    (matching the reference's 28 steps / scale 7.0, memory_2.py:267-269).
    mod_layout: static fuse_mods layout when params are mod-fused.
    Returns latents [B, H, W, C]."""
    B = context.shape[0]
    H = W = cfg.input_size
    x = jax.random.normal(key, (B, H, W, cfg.in_channels),
                          context.dtype)
    sigmas = shifted_sigmas(num_steps, shift)
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])
    x = x * sigmas[0]

    use_cfg = context_uncond is not None
    if use_cfg:
        # one 2B-batch forward per step instead of two B-batch forwards:
        # bigger matmuls, better MXU utilization, half the per-call
        # overhead (standard CFG batching)
        ctx2 = jnp.concatenate([context, context_uncond], axis=0)
        pool2 = jnp.concatenate([pooled, pooled_uncond], axis=0)

        def step(i, x):
            t = jnp.full((2 * B,), sigmas[i])
            v2 = forward(params, jnp.concatenate([x, x], axis=0), t,
                         ctx2, pool2, cfg, mod_layout=mod_layout)
            v, vu = v2[:B], v2[B:]
            v = vu + guidance_scale * (v - vu)
            return x + (sigmas[i + 1] - sigmas[i]) * v
    else:
        def step(i, x):
            t = jnp.full((B,), sigmas[i])
            v = forward(params, x, t, context, pooled, cfg,
                        mod_layout=mod_layout)
            return x + (sigmas[i + 1] - sigmas[i]) * v

    return jax.lax.fori_loop(0, num_steps, step, x)


# --------------------------------------------------------------------------
# diffusers SD3Transformer2DModel checkpoint conversion -- forward-parity
# validated against an independent torch implementation in the diffusers
# layout (tests/torch_mmdit_oracle.py), incl. the context_pre_only last
# block, AdaLayerNormContinuous chunk order, and pos_embed center crop
# --------------------------------------------------------------------------

def convert_sd3(state_dict, cfg: MMDiTConfig, dtype=jnp.float32):
    """diffusers SD3Transformer2DModel state dict -> mmdit params.

    Key layout (diffusers): pos_embed.{proj,pos_embed},
    time_text_embed.{timestep_embedder,text_embedder}.linear_{1,2},
    context_embedder, transformer_blocks.{i}.{norm1.linear,
    norm1_context.linear, attn.{to_q,to_k,to_v,to_out.0, add_q_proj,
    add_k_proj, add_v_proj, to_add_out, norm_q, norm_k, norm_added_q,
    norm_added_k}, ff.net.{0.proj,2}, ff_context.net.{0.proj,2}},
    norm_out.linear, proj_out.
    """
    import numpy as np

    def _t(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") \
            else np.asarray(x)

    sd = {k: _t(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T, dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"], dtype)}

    def lin_swap2(prefix):
        """diffusers AdaLayerNormContinuous emits (scale, shift); our
        _modulate takes (shift, scale) -- swap the output halves."""
        w = sd[f"{prefix}.weight"]
        b = sd[f"{prefix}.bias"]
        half = w.shape[0] // 2
        w = np.concatenate([w[half:], w[:half]], axis=0)
        b = np.concatenate([b[half:], b[:half]])
        return {"w": jnp.asarray(w.T, dtype), "b": jnp.asarray(b, dtype)}

    def qkv_packed(q, k, v):
        w = np.concatenate([sd[f"{q}.weight"], sd[f"{k}.weight"],
                            sd[f"{v}.weight"]], axis=0)
        b = np.concatenate([sd[f"{q}.bias"], sd[f"{k}.bias"],
                            sd[f"{v}.bias"]], axis=0)
        return {"w": jnp.asarray(w.T, dtype), "b": jnp.asarray(b, dtype)}

    blocks = []
    i = 0
    while f"transformer_blocks.{i}.attn.to_q.weight" in sd:
        b = f"transformer_blocks.{i}"
        x_stream = {
            "qkv": qkv_packed(f"{b}.attn.to_q", f"{b}.attn.to_k",
                              f"{b}.attn.to_v"),
            "proj": lin(f"{b}.attn.to_out.0"),
            "mod": lin(f"{b}.norm1.linear"),
            "fc1": lin(f"{b}.ff.net.0.proj"),
            "fc2": lin(f"{b}.ff.net.2"),
        }
        if f"{b}.attn2.to_q.weight" in sd:
            # MMDiT-X dual attention (SD3.5-medium): norm1 is the
            # 9-chunk AdaLayerNormZeroX (mapped by `mod` above); attn2
            # is a plain latent-stream self-attention
            x_stream["qkv2"] = qkv_packed(
                f"{b}.attn2.to_q", f"{b}.attn2.to_k", f"{b}.attn2.to_v")
            x_stream["proj2"] = lin(f"{b}.attn2.to_out.0")
            if cfg.qk_norm:
                x_stream["q_norm2"] = jnp.asarray(
                    sd[f"{b}.attn2.norm_q.weight"], dtype)
                x_stream["k_norm2"] = jnp.asarray(
                    sd[f"{b}.attn2.norm_k.weight"], dtype)
        # context_pre_only last block: norm1_context is a 2-chunk
        # AdaLayerNormContinuous (scale, shift) -- swap to our order;
        # the 6-chunk AdaLayerNormZero already matches (shift first)
        ctx_mod = (lin_swap2(f"{b}.norm1_context.linear")
                   if sd[f"{b}.norm1_context.linear.weight"].shape[0]
                   == 2 * cfg.dim
                   else lin(f"{b}.norm1_context.linear"))
        ctx_stream = {
            "qkv": qkv_packed(f"{b}.attn.add_q_proj", f"{b}.attn.add_k_proj",
                              f"{b}.attn.add_v_proj"),
            "proj": (lin(f"{b}.attn.to_add_out")
                     if f"{b}.attn.to_add_out.weight" in sd
                     else {"w": jnp.zeros((cfg.dim, cfg.dim), dtype),
                           "b": jnp.zeros((cfg.dim,), dtype)}),
            "mod": ctx_mod,
            "fc1": (lin(f"{b}.ff_context.net.0.proj")
                    if f"{b}.ff_context.net.0.proj.weight" in sd
                    else {"w": jnp.zeros((cfg.dim, 4 * cfg.dim), dtype),
                          "b": jnp.zeros((4 * cfg.dim,), dtype)}),
            "fc2": (lin(f"{b}.ff_context.net.2")
                    if f"{b}.ff_context.net.2.weight" in sd
                    else {"w": jnp.zeros((4 * cfg.dim, cfg.dim), dtype),
                          "b": jnp.zeros((cfg.dim,), dtype)}),
        }
        if cfg.qk_norm:
            x_stream["q_norm"] = jnp.asarray(
                sd[f"{b}.attn.norm_q.weight"], dtype)
            x_stream["k_norm"] = jnp.asarray(
                sd[f"{b}.attn.norm_k.weight"], dtype)
            ctx_stream["q_norm"] = jnp.asarray(
                sd[f"{b}.attn.norm_added_q.weight"], dtype)
            ctx_stream["k_norm"] = jnp.asarray(
                sd[f"{b}.attn.norm_added_k.weight"], dtype)
        blocks.append({"x": x_stream, "ctx": ctx_stream})
        i += 1

    p = cfg.patch_size
    conv = sd["pos_embed.proj.weight"]          # [dim, C, p, p]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.dim)
    # real checkpoints store pos_embed at pos_embed_max_size^2; center
    # crop to this config's grid (diffusers PatchEmbed.cropped_pos_embed)
    pe = sd["pos_embed.pos_embed"]
    g = cfg.input_size // cfg.patch_size
    m = int(round(math.sqrt(pe.shape[1])))
    if m * m == pe.shape[1] and m != g:
        top = (m - g) // 2
        pe = pe.reshape(1, m, m, -1)[:, top:top + g,
                                     top:top + g].reshape(1, g * g, -1)
    return {
        "patch_embed": {"w": jnp.asarray(patch_w, dtype),
                        "b": jnp.asarray(sd["pos_embed.proj.bias"], dtype)},
        "pos_embed": jnp.asarray(pe, dtype),
        "t_embed1": lin("time_text_embed.timestep_embedder.linear_1"),
        "t_embed2": lin("time_text_embed.timestep_embedder.linear_2"),
        "pooled_embed1": lin("time_text_embed.text_embedder.linear_1"),
        "pooled_embed2": lin("time_text_embed.text_embedder.linear_2"),
        "ctx_embed": lin("context_embedder"),
        "final_mod": lin_swap2("norm_out.linear"),
        "final_out": lin("proj_out"),
        "blocks": blocks,
    }
