"""Qwen2.5-VL-class local vision-language model in pure JAX.

Fills the reference's OPTIONAL local success-judge slot (reference
objnav_benchmark.py:165-171, :313-314 serves Qwen2.5-VL-3B over an
OpenAI-compatible endpoint): agents/local_vlm.LocalVLMClient wraps this
model behind the same ChatClient protocol, enabling fully offline
benchmark runs with no remote LLM.

Architecture (Qwen2.5-VL):
  vision : ViT over flattened (temporal_patch x patch x patch) tokens,
           2D rotary embeddings, WINDOW attention with a few full-
           attention layers, RMSNorm, SwiGLU MLP (with bias), and a
           spatial 2x2 patch merger into the LLM width.
  text   : Qwen2 decoder -- RMSNorm, GQA attention with biasful q/k/v,
           multimodal 3D rotary embeddings (M-RoPE: channel sections
           rotate by temporal/height/width positions), SwiGLU MLP.

TPU-first choices: window partition indices and cu_seqlens are STATIC
(computed host-side from the fixed image grid), window attention is one
batched [num_windows, win, D] attention (no varlen kernels needed),
and greedy decoding runs as ONE compiled program (prefill + a
lax.while_loop over a static-size KV cache) -- no per-token dispatch.

Weights convert from the HuggingFace Qwen2_5_VLForConditionalGeneration
state dict (convert_hf); forward parity vs transformers is tested in
tests/test_qwen_vl.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden: int = 1280
    heads: int = 16
    patch: int = 14
    temporal_patch: int = 2
    merge: int = 2
    out_hidden: int = 2048
    intermediate: int = 3420
    window: int = 112
    fullatt: Tuple[int, ...] = (7, 15, 23, 31)
    in_ch: int = 3

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


@dataclasses.dataclass(frozen=True)
class QwenVLTextConfig:
    hidden: int = 2048
    layers: int = 36
    heads: int = 16
    kv_heads: int = 2
    intermediate: int = 11008
    vocab: int = 151936
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    mrope_section: Tuple[int, ...] = (16, 24, 24)

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


@dataclasses.dataclass(frozen=True)
class QwenVLConfig:
    text: QwenVLTextConfig = dataclasses.field(
        default_factory=QwenVLTextConfig)
    vision: QwenVLVisionConfig = dataclasses.field(
        default_factory=QwenVLVisionConfig)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    tie_word_embeddings: bool = True


QWEN25_VL_3B = QwenVLConfig()

QWEN_VL_TEST = QwenVLConfig(
    text=QwenVLTextConfig(hidden=24, layers=2, heads=4, kv_heads=2,
                          intermediate=48, vocab=128,
                          mrope_section=(1, 1, 1)),
    vision=QwenVLVisionConfig(depth=2, hidden=32, heads=2, patch=2,
                              temporal_patch=2, merge=2, out_hidden=24,
                              intermediate=40, window=8, fullatt=(1,)),
    image_token_id=120, vision_start_token_id=122,
    tie_word_embeddings=False)


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (w.astype(jnp.float32) * y).astype(x.dtype)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _linear(x, w, b=None):
    if isinstance(w, dict):   # int8 W8A8 leaf {"w_q","w_s"} (quantize_params)
        from bsc_nav_tpu.ops.quant import linear_q8
        return linear_q8(x, w if b is None else {**w, "b": b})
    y = jnp.einsum("...d,df->...f", x, w,
                   preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_params(params: Dict[str, Any],
                    scope: str = "text") -> Dict[str, Any]:
    """int8 W8A8 (ops/quant.py) on the matmul weights of the local VLM
    judge — fills the reference's quantized-serving slot for its local
    models (reference memory_2.py:542-560 NF4 rationale; see ops/quant.py
    for the TPU-native W8A8 scheme).

    Greedy decode is the latency-critical role (agents/local_vlm.py):
    at B=1 every generated token streams every decoder weight through
    HBM once, so the matvecs are weight-bandwidth-bound and int8 halves
    the per-token traffic; lm_head ([hidden, ~152k vocab]) is the single
    biggest row.  scope: "text" (default, the decode path) | "vision" |
    "all".  Embedding tables (gathers), rms-norm scales and biases stay
    full precision; the quantized leaves are {"w_q","w_s"} dicts that
    `_linear` dispatches on.
    """
    from bsc_nav_tpu.ops.quant import quantize_weight

    def q(w):
        return quantize_weight({"w": w})

    def q_mlp(m):
        nm = dict(m)
        for k in ("gate_w", "up_w", "down_w"):
            nm[k] = q(nm[k])
        return nm

    out = dict(params)
    if scope in ("text", "all"):
        layers = []
        for blk in params["layers"]:
            nb = dict(blk)
            for k in ("q_w", "k_w", "v_w", "o_w"):
                nb[k] = q(nb[k])
            nb["mlp"] = q_mlp(nb["mlp"])
            layers.append(nb)
        out["layers"] = layers
        out["lm_head"] = q(params["lm_head"])
    if scope in ("vision", "all"):
        vis = dict(params["vision"])
        blocks = []
        for blk in vis["blocks"]:
            nb = dict(blk)
            nb["qkv_w"] = q(nb["qkv_w"])
            nb["proj_w"] = q(nb["proj_w"])
            nb["mlp"] = q_mlp(nb["mlp"])
            blocks.append(nb)
        vis["blocks"] = blocks
        merger = dict(vis["merger"])
        merger["fc1_w"] = q(merger["fc1_w"])
        merger["fc2_w"] = q(merger["fc2_w"])
        vis["merger"] = merger
        out["vision"] = vis
    return out


def _swiglu(x, p):
    g = _linear(x, p["gate_w"], p.get("gate_b"))
    u = _linear(x, p["up_w"], p.get("up_b"))
    return _linear(jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u,
                   p["down_w"], p.get("down_b"))


def _masked_attention(q, k, v, mask, scale):
    """q,k,v: [B, H, S, hd]; mask [.., Sq, Sk] bool (True = attend)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------------------
# vision tower
# --------------------------------------------------------------------------

def vision_window_layout(vcfg: QwenVLVisionConfig,
                         grid_thw: Sequence[Tuple[int, int, int]]):
    """STATIC window bookkeeping (numpy, host side): returns
    (window_index [S/mu], seg_window [S], seg_full [S], pos_hw [S, 2])
    mirroring transformers' get_window_index / rot_pos_emb for the
    fixed image grid."""
    mu = vcfg.merge * vcfg.merge
    win = vcfg.window // vcfg.merge // vcfg.patch
    window_index: List[np.ndarray] = []
    cu_window: List[int] = [0]
    seg_full: List[np.ndarray] = []
    pos_list: List[np.ndarray] = []
    base = 0
    for img_i, (t, h, w) in enumerate(grid_thw):
        lh, lw = h // vcfg.merge, w // vcfg.merge
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h, pad_w = (-lh) % win, (-lw) % win
        nh, nw = (lh + pad_h) // win, (lw + pad_w) // win
        idxp = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        idxp[:, :lh, :lw] = idx
        idxp = idxp.reshape(t, nh, win, nw, win).transpose(0, 1, 3, 2, 4)
        idxp = idxp.reshape(t, nh * nw, win, win)
        seqlens = (idxp != -100).sum(axis=(2, 3)).reshape(-1)
        flat = idxp.reshape(-1)
        window_index.append(flat[flat != -100] + base)
        for s in np.cumsum(seqlens) * mu + cu_window[-1]:
            if s != cu_window[-1] or not cu_window:
                cu_window.append(int(s))
        base += t * lh * lw
        # full attention is per (image, temporal frame): cu_seqlens in
        # HF is repeat_interleave(h*w, t).cumsum()
        seg_full.append(np.repeat(
            img_i * 1000 + np.arange(t, dtype=np.int32), h * w))
        # 2D rotary positions (merged-unit raster order, pre-window)
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hp = hp.reshape(lh, vcfg.merge, lw, vcfg.merge
                        ).transpose(0, 2, 1, 3).reshape(-1)
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wp = wp.reshape(lh, vcfg.merge, lw, vcfg.merge
                        ).transpose(0, 2, 1, 3).reshape(-1)
        pos_list.append(np.tile(np.stack([hp, wp], -1), (t, 1)))
    window_index = np.concatenate(window_index)
    S = base * mu
    seg_window = np.zeros(S, np.int32)
    for i in range(len(cu_window) - 1):
        seg_window[cu_window[i]:cu_window[i + 1]] = i
    return (window_index, seg_window,
            np.concatenate(seg_full), np.concatenate(pos_list))


def vision_forward(params, patches: jnp.ndarray,
                   grid_thw: Sequence[Tuple[int, int, int]],
                   vcfg: QwenVLVisionConfig) -> jnp.ndarray:
    """patches: [S, in_ch*tp*p*p] flattened conv patches (HF pixel_values
    layout); grid_thw STATIC.  Returns merged tokens [S/mu, out_hidden]."""
    mu = vcfg.merge * vcfg.merge
    window_index, seg_window, seg_full, pos_hw = vision_window_layout(
        vcfg, grid_thw)
    S = patches.shape[0]

    x = _linear(patches, params["patch_w"])              # [S, hidden]

    # rotary (2D): head_dim/2 split between h and w positions
    hd = vcfg.head_dim
    inv = 1.0 / (10000.0 ** (np.arange(0, hd // 2, 2) / (hd // 2)))
    freqs = np.concatenate([pos_hw[:, :1] * inv[None],
                            pos_hw[:, 1:] * inv[None]], axis=-1)

    # window shuffle (static gather) of tokens and rotary positions
    perm = (window_index[:, None] * mu + np.arange(mu)[None]).reshape(-1)
    x = x[jnp.asarray(perm)]
    freqs = freqs[perm]
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)[None, None]   # [1,1,S,hd]
    sin = jnp.asarray(np.sin(emb), jnp.float32)[None, None]
    seg_full_w = jnp.asarray(seg_full[perm])
    seg_win = jnp.asarray(seg_window)
    mask_window = (seg_win[None, None, :, None]
                   == seg_win[None, None, None, :])
    mask_full = (seg_full_w[None, None, :, None]
                 == seg_full_w[None, None, None, :])

    scale = 1.0 / math.sqrt(hd)
    H = vcfg.heads
    for i, blk in enumerate(params["blocks"]):
        y = rms_norm(x, blk["norm1"], 1e-6)
        qkv = _linear(y, blk["qkv_w"], blk["qkv_b"])
        q, k, v = (qkv.reshape(S, 3, H, hd)[:, j] for j in range(3))
        # rotary in f32 (HF applies in float)
        def rot(t):
            tf = t.transpose(1, 0, 2)[None].astype(jnp.float32)  # [1,H,S,hd]
            return (tf * cos + _rotate_half(tf) * sin)
        qr, kr = rot(q), rot(k)
        vv = v.transpose(1, 0, 2)[None].astype(jnp.float32)
        mask = mask_full if i in vcfg.fullatt else mask_window
        att = _masked_attention(qr, kr, vv, mask, scale)
        att = att[0].transpose(1, 0, 2).reshape(S, -1).astype(x.dtype)
        x = x + _linear(att, blk["proj_w"], blk["proj_b"])
        y = rms_norm(x, blk["norm2"], 1e-6)
        x = x + _swiglu(y, blk["mlp"])

    # spatial merger
    m = params["merger"]
    y = rms_norm(x, m["ln_q"], 1e-6).reshape(S // mu, mu * vcfg.hidden)
    y = _linear(jax.nn.gelu(_linear(y, m["fc1_w"], m["fc1_b"]).astype(
        jnp.float32), approximate=False).astype(x.dtype),
        m["fc2_w"], m["fc2_b"])
    # undo the window shuffle
    reverse = np.argsort(window_index)
    return y[jnp.asarray(reverse)]


# --------------------------------------------------------------------------
# text decoder
# --------------------------------------------------------------------------

def mrope_cos_sin(pos_ids: jnp.ndarray, tcfg: QwenVLTextConfig):
    """pos_ids [3, B, S] -> (cos, sin) [B, S, hd] with the channel
    sections rotated by (temporal, height, width) positions."""
    hd = tcfg.head_dim
    inv = 1.0 / (tcfg.rope_theta ** (np.arange(0, hd, 2) / hd))
    freqs = pos_ids[..., None].astype(jnp.float32) * inv   # [3,B,S,hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)          # [3,B,S,hd]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    sections = list(tcfg.mrope_section) * 2
    starts = np.cumsum([0] + sections[:-1])
    cos = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(cos[i % 3], int(s), sec, axis=-1)
         for i, (s, sec) in enumerate(zip(starts, sections))], axis=-1)
    sin = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(sin[i % 3], int(s), sec, axis=-1)
         for i, (s, sec) in enumerate(zip(starts, sections))], axis=-1)
    return cos, sin


def _text_layer_qkv(blk, x, cos, sin, tcfg: QwenVLTextConfig):
    B, S, _ = x.shape
    hd, H, KV = tcfg.head_dim, tcfg.heads, tcfg.kv_heads
    q = _linear(x, blk["q_w"], blk["q_b"]).reshape(B, S, H, hd)
    k = _linear(x, blk["k_w"], blk["k_b"]).reshape(B, S, KV, hd)
    v = _linear(x, blk["v_w"], blk["v_b"]).reshape(B, S, KV, hd)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    c = cos[:, None]                                    # [B,1,S,hd]
    s = sin[:, None]
    q = q * c + _rotate_half(q) * s
    k = k * c + _rotate_half(k) * s
    return q.astype(x.dtype), k.astype(x.dtype), v


def text_forward(params, embeds: jnp.ndarray, pos_ids: jnp.ndarray,
                 tcfg: QwenVLTextConfig,
                 valid_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full-sequence forward (prefill/parity path).
    embeds [B, S, D]; pos_ids [3, B, S].  Returns logits [B, S, vocab]."""
    B, S, D = embeds.shape
    cos, sin = mrope_cos_sin(pos_ids, tcfg)
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
    if valid_len is not None:
        causal = causal & (jnp.arange(S)[None, None, None, :]
                           < valid_len[:, None, None, None])
    x = embeds
    g = tcfg.heads // tcfg.kv_heads
    scale = 1.0 / math.sqrt(tcfg.head_dim)
    for blk in params["layers"]:
        y = rms_norm(x, blk["ln1"], tcfg.rms_eps)
        q, k, v = _text_layer_qkv(blk, y, cos, sin, tcfg)
        k = jnp.repeat(k, g, axis=1)
        v = jnp.repeat(v, g, axis=1)
        att = _masked_attention(q, k, v, causal, scale)
        att = att.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + _linear(att, blk["o_w"])
        y = rms_norm(x, blk["ln2"], tcfg.rms_eps)
        x = x + _swiglu(y, blk["mlp"])
    x = rms_norm(x, params["norm"], tcfg.rms_eps)
    return _linear(x, params["lm_head"])


def embed_tokens(params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][ids]


def merge_vision_embeds(params, ids: jnp.ndarray, vision_tokens,
                        image_token_id: int) -> jnp.ndarray:
    """Scatter merged vision tokens into the image-pad positions of the
    token-embedding sequence (HF get_placeholder_mask semantics).
    ids [B, S]; vision_tokens [N, D] with N == (ids == image_token).sum()
    laid out in sequence order."""
    emb = embed_tokens(params, ids)
    B, S, D = emb.shape
    flat = emb.reshape(B * S, D)
    is_img = (ids.reshape(-1) == image_token_id)
    # position of each image slot among image slots
    slot = jnp.cumsum(is_img) - 1
    gathered = vision_tokens.astype(flat.dtype)[
        jnp.clip(slot, 0, vision_tokens.shape[0] - 1)]
    flat = jnp.where(is_img[:, None], gathered, flat)
    return flat.reshape(B, S, D)


# --------------------------------------------------------------------------
# one-dispatch greedy generation (prefill + KV-cache while_loop)
# --------------------------------------------------------------------------

def make_greedy_generator(tcfg: QwenVLTextConfig, max_len: int,
                          max_new: int, eos_id: int):
    """Returns jitted (params, embeds [1, max_len, D], prompt_len,
    pos_ids [3, 1, max_len]) -> (tokens [max_new] int32, n_generated).

    The ENTIRE generation is one XLA program: a masked prefill fills the
    KV cache, then a while_loop decodes greedily until EOS/max_new with
    per-step dynamic cache updates (per the platform rule: never
    dispatch per token through the ~1 ms tunnel)."""
    total = max_len + max_new
    g = tcfg.heads // tcfg.kv_heads
    scale = 1.0 / math.sqrt(tcfg.head_dim)

    def _prefill(params, embeds, prompt_len, pos_ids):
        B, S, D = embeds.shape
        cos, sin = mrope_cos_sin(pos_ids, tcfg)
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        causal = causal & (jnp.arange(S)[None, None, None, :]
                           < prompt_len)
        x = embeds
        caches = []
        for blk in params["layers"]:
            y = rms_norm(x, blk["ln1"], tcfg.rms_eps)
            q, k, v = _text_layer_qkv(blk, y, cos, sin, tcfg)
            kc = jnp.zeros((1, tcfg.kv_heads, total, tcfg.head_dim),
                           k.dtype).at[:, :, :S].set(k)
            vc = jnp.zeros((1, tcfg.kv_heads, total, tcfg.head_dim),
                           v.dtype).at[:, :, :S].set(v.astype(k.dtype))
            caches.append((kc, vc))
            att = _masked_attention(
                q, jnp.repeat(k, g, axis=1), jnp.repeat(v, g, axis=1),
                causal, scale)
            att = att.transpose(0, 2, 1, 3).reshape(B, S, D)
            x = x + _linear(att, blk["o_w"])
            y = rms_norm(x, blk["ln2"], tcfg.rms_eps)
            x = x + _swiglu(y, blk["mlp"])
        x = rms_norm(x, params["norm"], tcfg.rms_eps)
        last = jax.lax.dynamic_index_in_dim(
            x[0], prompt_len - 1, axis=0, keepdims=False)
        logits = _linear(last, params["lm_head"])
        return caches, logits

    def _decode_step(params, caches, token, pos, cache_pos):
        """One token through all layers; pos: scalar text position
        (all three mrope sections equal for text)."""
        x = params["embed"][token][None, None]           # [1, 1, D]
        pos3 = jnp.broadcast_to(pos, (3, 1, 1))
        cos, sin = mrope_cos_sin(pos3, tcfg)
        new_caches = []
        D = x.shape[-1]
        for blk, (kc, vc) in zip(params["layers"], caches):
            y = rms_norm(x, blk["ln1"], tcfg.rms_eps)
            q, k, v = _text_layer_qkv(blk, y, cos, sin, tcfg)
            kc = jax.lax.dynamic_update_slice_in_dim(
                kc, k.astype(kc.dtype), cache_pos, axis=2)
            vc = jax.lax.dynamic_update_slice_in_dim(
                vc, v.astype(vc.dtype), cache_pos, axis=2)
            new_caches.append((kc, vc))
            mask = (jnp.arange(total) <= cache_pos)[None, None, None, :]
            att = _masked_attention(
                q, jnp.repeat(kc, g, axis=1), jnp.repeat(vc, g, axis=1),
                mask, scale)
            att = att.reshape(1, 1, D)
            x = x + _linear(att, blk["o_w"])
            y = rms_norm(x, blk["ln2"], tcfg.rms_eps)
            x = x + _swiglu(y, blk["mlp"])
        x = rms_norm(x, params["norm"], tcfg.rms_eps)
        return new_caches, _linear(x[0, 0], params["lm_head"])

    @jax.jit
    def generate(params, embeds, prompt_len, pos_ids, start_pos):
        caches, logits = _prefill(params, embeds, prompt_len, pos_ids)
        first = jnp.argmax(logits).astype(jnp.int32)
        tokens0 = jnp.full((max_new,), eos_id, jnp.int32)
        tokens0 = tokens0.at[0].set(first)

        def cond(state):
            i, tok, *_ = state
            return (i + 1 < max_new) & (tok != eos_id)

        def body(state):
            # token generated at step i sits at text position
            # start_pos + i and cache slot prompt_len + i
            i, tok, tokens, caches = state
            caches, logits = _decode_step(
                params, caches, tok, start_pos + i, prompt_len + i)
            nxt = jnp.argmax(logits).astype(jnp.int32)
            tokens = tokens.at[i + 1].set(nxt)
            return i + 1, nxt, tokens, caches

        i, _, tokens, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), first, tokens0,
                         caches))
        return tokens, i + 1

    return generate


# --------------------------------------------------------------------------
# HF checkpoint conversion
# --------------------------------------------------------------------------

def convert_hf(state_dict, cfg: QwenVLConfig,
               dtype=jnp.float32) -> Dict[str, Any]:
    """Qwen2_5_VLForConditionalGeneration state dict -> params."""

    def t(k):
        x = state_dict[k]
        x = x.detach().cpu().numpy() if hasattr(x, "detach") \
            else np.asarray(x)
        return jnp.asarray(x, dtype)

    def lin(prefix, bias=True):
        out = {"w": t(f"{prefix}.weight").T}
        if bias and f"{prefix}.bias" in state_dict:
            out["b"] = t(f"{prefix}.bias")
        return out

    def mlp(prefix):
        out = {"gate_w": t(f"{prefix}.gate_proj.weight").T,
               "up_w": t(f"{prefix}.up_proj.weight").T,
               "down_w": t(f"{prefix}.down_proj.weight").T}
        for name, key in [("gate_b", "gate_proj"), ("up_b", "up_proj"),
                          ("down_b", "down_proj")]:
            if f"{prefix}.{key}.bias" in state_dict:
                out[name] = t(f"{prefix}.{key}.bias")
        return out

    v = cfg.vision
    vis: Dict[str, Any] = {
        # Conv3d [D, C, tp, p, p] -> flat [C*tp*p*p, D] matching the HF
        # pixel_values layout (C-major, then t, then spatial)
        "patch_w": t("model.visual.patch_embed.proj.weight").reshape(
            v.hidden, -1).T,
        "blocks": [],
        "merger": {
            "ln_q": t("model.visual.merger.ln_q.weight"),
            "fc1_w": t("model.visual.merger.mlp.0.weight").T,
            "fc1_b": t("model.visual.merger.mlp.0.bias"),
            "fc2_w": t("model.visual.merger.mlp.2.weight").T,
            "fc2_b": t("model.visual.merger.mlp.2.bias"),
        },
    }
    for i in range(v.depth):
        p = f"model.visual.blocks.{i}"
        vis["blocks"].append({
            "norm1": t(f"{p}.norm1.weight"),
            "norm2": t(f"{p}.norm2.weight"),
            "qkv_w": t(f"{p}.attn.qkv.weight").T,
            "qkv_b": t(f"{p}.attn.qkv.bias"),
            "proj_w": t(f"{p}.attn.proj.weight").T,
            "proj_b": t(f"{p}.attn.proj.bias"),
            "mlp": mlp(f"{p}.mlp"),
        })

    tc = cfg.text
    txt: Dict[str, Any] = {
        "embed": t("model.language_model.embed_tokens.weight"),
        "norm": t("model.language_model.norm.weight"),
        "layers": [],
    }
    for i in range(tc.layers):
        p = f"model.language_model.layers.{i}"
        txt["layers"].append({
            "ln1": t(f"{p}.input_layernorm.weight"),
            "ln2": t(f"{p}.post_attention_layernorm.weight"),
            "q_w": t(f"{p}.self_attn.q_proj.weight").T,
            "q_b": t(f"{p}.self_attn.q_proj.bias"),
            "k_w": t(f"{p}.self_attn.k_proj.weight").T,
            "k_b": t(f"{p}.self_attn.k_proj.bias"),
            "v_w": t(f"{p}.self_attn.v_proj.weight").T,
            "v_b": t(f"{p}.self_attn.v_proj.bias"),
            "o_w": t(f"{p}.self_attn.o_proj.weight").T,
            "mlp": mlp(f"{p}.mlp"),
        })
    txt["lm_head"] = (txt["embed"].T if cfg.tie_word_embeddings
                      or "lm_head.weight" not in state_dict
                      else t("lm_head.weight").T)
    return {"vision": vis, **txt}


def init_params(cfg: QwenVLConfig, key,
                dtype=jnp.float32) -> Dict[str, Any]:
    """Random init at the configured shapes (tests / smoke)."""
    del key  # deterministic numpy init is sufficient for smoke shapes
    rng = np.random.default_rng(0)
    v, tc = cfg.vision, cfg.text

    def r(*shape, s=0.02):
        return jnp.asarray(rng.normal(0, s, size=shape), dtype)

    vis = {
        "patch_w": r(v.in_ch * v.temporal_patch * v.patch * v.patch,
                     v.hidden),
        "blocks": [{
            "norm1": jnp.ones((v.hidden,), dtype),
            "norm2": jnp.ones((v.hidden,), dtype),
            "qkv_w": r(v.hidden, 3 * v.hidden),
            "qkv_b": jnp.zeros((3 * v.hidden,), dtype),
            "proj_w": r(v.hidden, v.hidden),
            "proj_b": jnp.zeros((v.hidden,), dtype),
            "mlp": {"gate_w": r(v.hidden, v.intermediate),
                    "gate_b": jnp.zeros((v.intermediate,), dtype),
                    "up_w": r(v.hidden, v.intermediate),
                    "up_b": jnp.zeros((v.intermediate,), dtype),
                    "down_w": r(v.intermediate, v.hidden),
                    "down_b": jnp.zeros((v.hidden,), dtype)},
        } for _ in range(v.depth)],
        "merger": {
            "ln_q": jnp.ones((v.hidden,), dtype),
            "fc1_w": r(v.hidden * v.merge ** 2, v.hidden * v.merge ** 2),
            "fc1_b": jnp.zeros((v.hidden * v.merge ** 2,), dtype),
            "fc2_w": r(v.hidden * v.merge ** 2, v.out_hidden),
            "fc2_b": jnp.zeros((v.out_hidden,), dtype),
        },
    }
    params = {
        "vision": vis,
        "embed": r(tc.vocab, tc.hidden),
        "norm": jnp.ones((tc.hidden,), dtype),
        "layers": [{
            "ln1": jnp.ones((tc.hidden,), dtype),
            "ln2": jnp.ones((tc.hidden,), dtype),
            "q_w": r(tc.hidden, tc.hidden),
            "q_b": jnp.zeros((tc.hidden,), dtype),
            "k_w": r(tc.hidden, tc.kv_heads * tc.head_dim),
            "k_b": jnp.zeros((tc.kv_heads * tc.head_dim,), dtype),
            "v_w": r(tc.hidden, tc.kv_heads * tc.head_dim),
            "v_b": jnp.zeros((tc.kv_heads * tc.head_dim,), dtype),
            "o_w": r(tc.hidden, tc.hidden),
            "mlp": {"gate_w": r(tc.hidden, tc.intermediate),
                    "up_w": r(tc.hidden, tc.intermediate),
                    "down_w": r(tc.intermediate, tc.hidden)},
        } for _ in range(tc.layers)],
    }
    params["lm_head"] = r(tc.hidden, tc.vocab)
    return params
