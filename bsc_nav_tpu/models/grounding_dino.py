"""Grounding DINO open-vocabulary detector in pure JAX.

Fills the reference's GroundingDINO role: the standalone detection demo
(reference gdino.py:44-68) and the alternative long-term-memory detector
path (reference memory_2.py:46-47, :947-991, commented but kept as a
first-class option there; the driver metadata also names "GroundingDINO
region features").  This port makes the detector slot fully pluggable:
YOLO-World (models/yolo_world.py) or Grounding DINO behind the same
Detection interface.

Architecture (IDEA-Research grounding-dino-tiny):
  Swin-T backbone (window attention, shifted windows, patch merging)
  -> 1x1 conv + GroupNorm input projections to d_model=256 (4 levels)
  BERT-base text encoder over phrase-grouped self-attention masks
  -> feature-enhancer encoder x6 (bi-directional vision<->text fusion,
     text self-attention, multi-scale deformable vision attention)
  -> language-guided query selection (two-stage, 900 queries)
  -> decoder x6 (query self-attn, text cross-attn, deformable
     cross-attn, iterative box refinement)
  -> contrastive class head (queries x text tokens) + 3-layer box MLP.

TPU-first design notes:
  - deformable attention is expressed as batched bilinear gathers with
    STATIC per-level shapes (no grid_sample kernel, no dynamic shapes);
    XLA lowers the gathers, everything else is MXU matmuls,
  - windows are always partitioned at the configured window size with
    zero padding (the HF `always_partition` backbone behavior), so all
    shapes are static per image size,
  - everything between "pixel_values + token ids in" and "logits +
    boxes out" is one jittable program.

Forward parity against the transformers reference implementation is
proven in tests/test_grounding_dino.py (random-init tiny configs, same
discipline as tests/test_t5.py / test_qwen_vl.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-5
    out_stages: Tuple[int, ...] = (1, 2, 3)   # 0-indexed (HF stage2/3/4)

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2 ** i)


@dataclasses.dataclass(frozen=True)
class BertTextConfig:
    vocab_size: int = 30522
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    max_pos: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    d_model: int = 256
    encoder_layers: int = 6
    decoder_layers: int = 6
    heads: int = 8
    ffn_dim: int = 2048
    num_levels: int = 4
    enc_points: int = 4
    dec_points: int = 4
    num_queries: int = 900
    max_text_len: int = 256
    pos_temperature: int = 20
    ln_eps: float = 1e-5
    swin: SwinConfig = dataclasses.field(default_factory=SwinConfig)
    text: BertTextConfig = dataclasses.field(default_factory=BertTextConfig)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.heads

    @property
    def fusion_dim(self) -> int:
        return self.ffn_dim // 2

    @property
    def fusion_heads(self) -> int:
        return self.heads // 2


GROUNDING_DINO_TINY = GroundingDinoConfig()

# BERT [CLS], [SEP], '.', '?' — phrase delimiters in the prompt
SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)


# --------------------------------------------------------------------------
# shared primitives
# --------------------------------------------------------------------------

def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _lin(x, p):
    y = jnp.einsum("...d,df->...f", x, p["w"],
                   preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _mha(x_q, x_k, x_v, p, heads, additive_mask=None):
    """Standard multi-head attention with separate q/k/v linears
    (HF GroundingDinoMultiheadAttention / BertSelfAttention layout)."""
    B, Sq, D = x_q.shape
    Sk = x_k.shape[1]
    hd = p["q"]["w"].shape[1] // heads
    q = _lin(x_q, p["q"]).reshape(B, Sq, heads, hd)
    k = _lin(x_k, p["k"]).reshape(B, Sk, heads, hd)
    v = _lin(x_v, p["v"]).reshape(B, Sk, heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    if additive_mask is not None:
        scores = scores + additive_mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x_q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x_q.dtype)
    return _lin(out.reshape(B, Sq, heads * hd), p["out"])


def _mlp_head(x, layers):
    """DETR MLPPredictionHead: relu between layers, none at the end."""
    for i, p in enumerate(layers):
        x = _lin(x, p)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


# --------------------------------------------------------------------------
# Swin backbone
# --------------------------------------------------------------------------

def _swin_rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                   # [w*w, w*w]


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(x, w, H, W, C):
    B = x.shape[0] // ((H // w) * (W // w))
    x = x.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _swin_shift_mask(Hp, Wp, window, shift) -> np.ndarray:
    """Additive attention mask for shifted windows (-100 across shift
    region boundaries, HF SwinLayer.get_attn_mask)."""
    img = np.zeros((1, Hp, Wp, 1), np.float32)
    slices = (slice(0, -window), slice(-window, -shift),
              slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[:, hs, ws, :] = cnt
            cnt += 1
    w = window
    mw = img.reshape(1, Hp // w, w, Wp // w, w, 1).transpose(
        0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    attn = mw[:, None, :] - mw[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


def _swin_block(x, H, W, blk, cfg: SwinConfig, heads, shift):
    """One Swin layer on tokens x [B, H*W, C]; windows always
    partitioned at cfg.window_size with zero padding (backbone
    `always_partition` semantics)."""
    B, _, C = x.shape
    w = cfg.window_size
    shortcut = x
    y = _ln(x, blk["ln1"], cfg.ln_eps).reshape(B, H, W, C)

    pad_b = (w - H % w) % w
    pad_r = (w - W % w) % w
    if pad_b or pad_r:
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r

    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))

    wins = _window_partition(y, w)                       # [nW*B, w*w, C]
    hd = C // heads
    q = _lin(wins, blk["q"]).reshape(-1, w * w, heads, hd)
    k = _lin(wins, blk["k"]).reshape(-1, w * w, heads, hd)
    v = _lin(wins, blk["v"]).reshape(-1, w * w, heads, hd)
    scores = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    rpb = blk["rpb"][blk["rpb_index"].reshape(-1)]
    rpb = rpb.reshape(w * w, w * w, heads).transpose(2, 0, 1)
    scores = scores + rpb[None].astype(jnp.float32)
    if shift > 0:
        smask = _swin_shift_mask(Hp, Wp, w, shift)       # [nW, w*w, w*w]
        nW = smask.shape[0]
        scores = scores.reshape(B, nW, heads, w * w, w * w)
        scores = scores + jnp.asarray(smask)[None, :, None]
        scores = scores.reshape(-1, heads, w * w, w * w)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum("nhqk,nkhd->nqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    att = _lin(att.reshape(-1, w * w, C), blk["attn_out"])

    y = _window_reverse(att, w, Hp, Wp, C)
    if shift > 0:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        y = y[:, :H, :W]
    x = shortcut + y.reshape(B, H * W, C)

    y = _ln(x, blk["ln2"], cfg.ln_eps)
    y = _lin(_gelu(_lin(y, blk["fc1"])), blk["fc2"])
    return x + y


def _patch_merge(x, H, W, p, eps):
    B, _, C = x.shape
    x = x.reshape(B, H, W, C)
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                         x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    x = x.reshape(B, -1, 4 * C)
    x = _ln(x, p["norm"], eps)
    return _lin(x, p["reduction"])


def swin_backbone(params, pixel_values, cfg: SwinConfig
                  ) -> List[Tuple[jnp.ndarray, Tuple[int, int]]]:
    """pixel_values [B, H, W, 3] normalized -> list of (feature map
    [B, h, w, C_stage], (h, w)) for each out stage, LayerNormed
    (HF SwinBackbone hidden_states_norms)."""
    B, H, W, _ = pixel_values.shape
    ps = cfg.patch_size
    pad_b = (ps - H % ps) % ps
    pad_r = (ps - W % ps) % ps
    if pad_b or pad_r:
        pixel_values = jnp.pad(
            pixel_values, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    x = jax.lax.conv_general_dilated(
        pixel_values, params["patch_proj"]["w"].astype(pixel_values.dtype),
        (ps, ps), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    x = (x + params["patch_proj"]["b"]).astype(pixel_values.dtype)
    h, w = x.shape[1], x.shape[2]
    x = x.reshape(B, h * w, cfg.embed_dim)
    x = _ln(x, params["embed_norm"], cfg.ln_eps)

    outs = []
    for si, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[si]
        for bi, blk in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            x = _swin_block(x, h, w, blk, cfg, heads, shift)
        if si in cfg.out_stages:
            oi = cfg.out_stages.index(si)
            f = _ln(x, params["out_norms"][oi], 1e-5)
            outs.append((f.reshape(B, h, w, -1), (h, w)))
        if "downsample" in stage:
            x = _patch_merge(x, h, w, stage["downsample"], cfg.ln_eps)
            h, w = (h + 1) // 2, (w + 1) // 2
    return outs


# --------------------------------------------------------------------------
# BERT text encoder
# --------------------------------------------------------------------------

def bert_encode(params, input_ids, token_type_ids, position_ids,
                attn_3d_mask, cfg: BertTextConfig) -> jnp.ndarray:
    """attn_3d_mask [B, S, S] bool, True = attend (the phrase-grouped
    mask from generate_text_masks)."""
    x = (params["word_emb"][input_ids]
         + params["pos_emb"][position_ids]
         + params["type_emb"][token_type_ids])
    x = _ln(x, params["emb_norm"], cfg.ln_eps)
    add_mask = (1.0 - attn_3d_mask.astype(jnp.float32)[:, None]) * -1e30
    for layer in params["layers"]:
        att = _mha(x, x, x, layer, cfg.heads, additive_mask=add_mask)
        x = _ln(x + att, layer["attn_norm"], cfg.ln_eps)
        y = _lin(_gelu(_lin(x, layer["fc1"])), layer["fc2"])
        x = _ln(x + y, layer["out_norm"], cfg.ln_eps)
    return x


# --------------------------------------------------------------------------
# position embeddings
# --------------------------------------------------------------------------

def _sine_pos_2d(h, w, d_model, temperature) -> jnp.ndarray:
    """Image sine position embedding over a full-valid map
    (HF GroundingDinoSinePositionEmbedding with an all-ones mask)."""
    half = d_model // 2
    scale = 2 * math.pi
    y = (jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
         / (h + 1e-6) * scale)                           # [h, 1]
    x = (jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
         / (w + 1e-6) * scale)                           # [1, w]
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)
    py = y[:, :, None] / dim_t                           # [h, 1, half]
    px = x[:, :, None] / dim_t                           # [1, w, half]

    def interleave(p):
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         axis=-1).reshape(*p.shape[:-1], -1)

    py = jnp.broadcast_to(interleave(py), (h, w, half))
    px = jnp.broadcast_to(interleave(px), (h, w, half))
    return jnp.concatenate([py, px], axis=-1)            # [h, w, d_model]


def _sine_pos_1d(pos, num_feats, temperature=10000, exchange_xy=True
                 ) -> jnp.ndarray:
    """get_sine_pos_embed: pos [..., n] -> [..., n*num_feats]."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_feats)

    def one(x):                                          # [...,] scalar coord
        sx = x[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])],
                         axis=-1).reshape(*sx.shape[:-1], -1)

    embs = [one(pos[..., i]) for i in range(pos.shape[-1])]
    if exchange_xy and len(embs) >= 2:
        embs[0], embs[1] = embs[1], embs[0]
    return jnp.concatenate(embs, axis=-1)


# --------------------------------------------------------------------------
# multi-scale deformable attention (bilinear-gather formulation)
# --------------------------------------------------------------------------

def _deform_attention(query, value_flat, ref_points, shapes, p, heads,
                      points):
    """query [B, Q, D]; value_flat [B, N, D] (already value-projected
    upstream? no -- projected here); ref_points [B, Q, L, 2 or 4]
    normalized; shapes: static list of (h, w) per level.

    Matches HF MultiScaleDeformableAttention exactly: grid_sample
    bilinear, align_corners=False, zero padding.
    """
    B, Q, D = query.shape
    L = len(shapes)
    hd = D // heads

    value = _lin(value_flat, p["value_proj"]).reshape(B, -1, heads, hd)
    off = _lin(query, p["sampling_offsets"]).astype(jnp.float32)
    off = off.reshape(B, Q, heads, L, points, 2)
    aw = _lin(query, p["attention_weights"]).astype(jnp.float32)
    aw = jax.nn.softmax(aw.reshape(B, Q, heads, L * points), axis=-1)
    aw = aw.reshape(B, Q, heads, L, points)

    if ref_points.shape[-1] == 2:
        normalizer = jnp.asarray([[w, h] for (h, w) in shapes],
                                 jnp.float32)            # [L, 2] (x, y)
        loc = (ref_points[:, :, None, :, None, :]
               + off / normalizer[None, None, None, :, None, :])
    else:
        loc = (ref_points[:, :, None, :, None, :2]
               + off / points * ref_points[:, :, None, :, None, 2:] * 0.5)
    # loc: [B, Q, heads, L, points, 2] in [0, 1] (x, y)

    # Quad-row bilinear gather: for each level, precompute every cell's
    # 2x2 neighborhood as ONE concatenated [4*hd] row on a zero-padded
    # grid, so a full-lane-width gather fetches all four bilinear
    # corners (vs 4 gathers of quarter-lane hd rows -- measured 4x
    # faster at grounding-dino encoder scale).  Zero padding realizes
    # grid_sample's padding_mode="zeros"; samples beyond the 1-px
    # border are masked via the base-cell validity.  All L levels'
    # quad buffers concatenate on the row axis so the whole layer is
    # ONE flat 2-D gather + ONE einsum (was one gather/einsum per
    # level; (batch, head) fold into the row index -- flat 2-D gathers
    # measured 1.6x faster than take_along_axis on this runtime).
    quads, idxs, cws = [], [], []
    start, row_start = 0, 0
    for li, (h, w) in enumerate(shapes):
        vlev = value[:, start:start + h * w]              # [B, hw, nh, hd]
        start += h * w
        vg = vlev.reshape(B, h, w, heads, hd)
        vp = jnp.pad(vg, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :-1, :-1], vp[:, :-1, 1:],
             vp[:, 1:, :-1], vp[:, 1:, 1:]], axis=-1)
        # rows stay (cell, HEAD-inner): the query side is naturally
        # [B, Q, heads, ...], so a head-inner table needs NO transposes
        # on the index or output side (each traced at ~2 ms/layer)
        quads.append(quad.reshape(B, (h + 1) * (w + 1), heads, 4 * hd))

        # torch grid_sample align_corners=False pixel mapping
        x = loc[:, :, :, li, :, 0] * w - 0.5              # [B, Q, nh, P]
        y = loc[:, :, :, li, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0).astype(jnp.float32)
        wy = (y - y0).astype(jnp.float32)
        valid = ((x0 >= -1) & (x0 <= w - 1)
                 & (y0 >= -1) & (y0 <= h - 1)).astype(jnp.float32)
        a = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
        b = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
        idxs.append(a * (w + 1) + b + row_start)          # [B, Q, nh, P]
        row_start += (h + 1) * (w + 1)

        # corner weights in quad order [(0,0), (0,1), (1,0), (1,1)],
        # folded with this level's attention weights + base validity
        cw = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                        wy * (1 - wx), wy * wx], axis=-1)  # [B,Q,nh,P,4]
        cws.append(cw * (valid * aw[:, :, :, li])[..., None])

    T = row_start
    # head-MAJOR flat table: per-head rows contiguous.  (A head-inner
    # layout that avoids the idx/output transposes was measured 50 ms
    # SLOWER end to end -- the strided gather pattern loses more than
    # the transposes cost.)
    quad_all = jnp.concatenate(quads, axis=1).transpose(0, 2, 1, 3)
    flat = quad_all.reshape(B * heads * T, 4 * hd)        # [BhT, 4hd]
    idx = jnp.stack(idxs, axis=3)                         # [B,Q,nh,L,P]
    off = (jnp.arange(B * heads, dtype=jnp.int32) * T
           ).reshape(B, heads, 1)
    flat_idx = (idx.transpose(0, 2, 1, 3, 4).reshape(B, heads, -1)
                + off).reshape(-1)
    # keep the gathered rows in their NATIVE [R, 4*hd] lane layout: an
    # einsum over a [..., P, 4, hd] view forced XLA to relayout the
    # whole 870 MB gather output (traced at 6.9 ms/layer) and run the
    # contraction as slow VPU fusions.  Instead broadcast each corner
    # weight across its hd-lane block and reduce in 2-D -- every op
    # stays on 4*hd-lane rows; the (4, hd) split happens after the L*P
    # reduction, on a 16x smaller array.  mode="clip": indices are
    # already in range; the default fill mode emitted a select over the
    # whole gather output (~1.3 ms/layer).
    rows = jnp.take(flat, flat_idx, axis=0, mode="clip"
                    ).reshape(B, heads, Q, L * points, 4 * hd)
    cw = jnp.stack(cws, axis=3)                           # [B,Q,nh,L,P,4]
    cw = cw.transpose(0, 2, 1, 3, 4, 5).reshape(
        B, heads, Q, L * points, 4)
    # expand corner weights to lane blocks in 5-D: a flat [R, 4]
    # intermediate tiles 4 lanes out of 128 (32x padding, +40 ms)
    w_lanes = jnp.repeat(cw.astype(rows.dtype), hd, axis=-1)
    acc = jnp.sum((rows * w_lanes).astype(jnp.float32),
                  axis=3)                                 # [B,nh,Q,4*hd]
    out = jnp.sum(acc.reshape(B, heads, Q, 4, hd), axis=3)
    out = out.transpose(0, 2, 1, 3).reshape(B, Q, D).astype(query.dtype)
    return _lin(out, p["output_proj"])


# --------------------------------------------------------------------------
# encoder (feature enhancer)
# --------------------------------------------------------------------------

def _bi_attention(v_feat, t_feat, p, cfg: GroundingDinoConfig,
                  text_pad_mask):
    """GroundingDinoBiMultiHeadAttention: vision<->text cross attention.
    text_pad_mask [B, S] bool, True = padding."""
    B, Sv, _ = v_feat.shape
    St = t_feat.shape[1]
    nh, hd = cfg.fusion_heads, cfg.fusion_dim // cfg.fusion_heads

    vq = (_lin(v_feat, p["vision_proj"]).astype(jnp.float32)
          * hd ** -0.5).reshape(B, Sv, nh, hd)
    tk = _lin(t_feat, p["text_proj"]).astype(
        jnp.float32).reshape(B, St, nh, hd)
    vv = _lin(v_feat, p["values_vision_proj"]).reshape(B, Sv, nh, hd)
    tv = _lin(t_feat, p["values_text_proj"]).reshape(B, St, nh, hd)

    scores = jnp.einsum("bvhd,bthd->bhvt", vq, tk,
                        preferred_element_type=jnp.float32)
    scores = scores - jnp.max(scores)
    scores = jnp.clip(scores, -50000, 50000)

    t_scores = scores.transpose(0, 1, 3, 2)               # [B, h, St, Sv]
    t_scores = t_scores - jnp.max(t_scores, axis=-1, keepdims=True)
    t_scores = jnp.clip(t_scores, -50000, 50000)
    text_attn = jax.nn.softmax(t_scores, axis=-1)         # text->vision

    if text_pad_mask is not None:
        scores = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf,
                           scores)
    vision_attn = jax.nn.softmax(scores, axis=-1)         # vision->text

    dv = jnp.einsum("bhvt,bthd->bvhd", vision_attn, tv.astype(jnp.float32))
    dt = jnp.einsum("bhtv,bvhd->bthd", text_attn, vv.astype(jnp.float32))
    dv = _lin(dv.astype(v_feat.dtype).reshape(B, Sv, -1),
              p["out_vision_proj"])
    dt = _lin(dt.astype(t_feat.dtype).reshape(B, St, -1),
              p["out_text_proj"])
    return dv, dt


def _encoder_layer(v_feat, t_feat, layer, cfg: GroundingDinoConfig, *,
                   v_pos, ref_points, shapes, text_pos, text_attn_3d,
                   text_pad_mask):
    # 1) fusion (pre-LN + layer-scale residual)
    f = layer["fusion"]
    vn = _ln(v_feat, f["ln_v"], cfg.ln_eps)
    tn = _ln(t_feat, f["ln_t"], cfg.ln_eps)
    dv, dt = _bi_attention(vn, tn, f, cfg, text_pad_mask)
    v_feat = vn + f["vision_param"] * dv
    t_feat = tn + f["text_param"] * dt

    # 2) text self-attention enhancer (post-LN)
    te = layer["text_enh"]
    add_mask = (1.0 - text_attn_3d.astype(jnp.float32)[:, None]) * -1e30
    qk = t_feat + text_pos
    att = _mha(qk, qk, t_feat, te, cfg.fusion_heads,
               additive_mask=add_mask)
    t_feat = _ln(t_feat + att, te["ln_before"], cfg.ln_eps)
    y = _lin(jax.nn.relu(_lin(t_feat, te["fc1"])), te["fc2"])
    t_feat = _ln(t_feat + y, te["ln_after"], cfg.ln_eps)

    # 3) deformable vision self-attention (post-LN)
    d = layer["deform"]
    att = _deform_attention(v_feat + v_pos, v_feat, ref_points, shapes,
                            d, cfg.heads, cfg.enc_points)
    v_feat = _ln(v_feat + att, d["ln1"], cfg.ln_eps)
    y = _lin(jax.nn.relu(_lin(v_feat, d["fc1"])), d["fc2"])
    v_feat = _ln(v_feat + y, d["ln2"], cfg.ln_eps)
    return v_feat, t_feat


# --------------------------------------------------------------------------
# full forward
# --------------------------------------------------------------------------

def generate_text_masks(input_ids: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: phrase-grouped self-attention mask + position ids
    (HF generate_masks_with_special_tokens_and_transfer_map).  Tokens
    between consecutive special tokens attend within their group;
    position ids restart per group."""
    input_ids = np.asarray(input_ids)
    B, S = input_ids.shape
    special = np.isin(input_ids, np.asarray(SPECIAL_TOKEN_IDS))
    attn = np.repeat(np.eye(S, dtype=bool)[None], B, axis=0)
    pos = np.zeros((B, S), np.int64)
    for b in range(B):
        prev = 0
        for col in np.nonzero(special[b])[0]:
            if col == 0 or col == S - 1:
                attn[b, col, col] = True
                pos[b, col] = 0
            else:
                attn[b, prev + 1:col + 1, prev + 1:col + 1] = True
                pos[b, prev + 1:col + 1] = np.arange(0, col - prev)
            prev = col
    return attn, pos


def _flatten_levels(feats: Sequence[jnp.ndarray]
                    ) -> Tuple[jnp.ndarray, List[Tuple[int, int]]]:
    shapes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
    flat = jnp.concatenate(
        [f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats], axis=1)
    return flat, shapes


def _group_norm(x, p, groups=32, eps=1e-5):
    """GroupNorm over channel-last [B, H, W, C]."""
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _proposals(shapes) -> jnp.ndarray:
    """Per-pixel anchors (cx, cy, w, h), inverse-sigmoid space; invalid
    anchors (outside (0.01, 0.99)) -> +inf (HF
    generate_encoder_output_proposals with no padding)."""
    out = []
    for level, (h, w) in enumerate(shapes):
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        grid = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], axis=-1)
        wh = jnp.full_like(grid, 0.05 * 2.0 ** level)
        p = jnp.concatenate([grid, wh], axis=-1).reshape(-1, 4)
        out.append(p)
    p = jnp.concatenate(out, axis=0)                      # [N, 4]
    valid = jnp.all((p > 0.01) & (p < 0.99), axis=-1, keepdims=True)
    logit = jnp.log(p / (1 - p))
    return jnp.where(valid, logit, jnp.inf), valid[:, 0]


def forward(params, pixel_values, input_ids, token_type_ids,
            text_attn_3d, position_ids, text_token_mask,
            cfg: GroundingDinoConfig, stage: str = "full"
            ) -> Dict[str, jnp.ndarray]:
    """pixel_values [B, H, W, 3] normalized floats; input_ids [B, S];
    text_attn_3d [B, S, S] bool (True=attend); text_token_mask [B, S]
    bool (True=real token).  Returns dict with `logits`
    [B, num_queries, max_text_len] and `pred_boxes` [B, num_queries, 4]
    (cxcywh, normalized).

    `stage` truncates the program for cumulative-prefix profiling
    (tools/gdino_profile.py; isolated stage timings lie on this TPU —
    see CLAUDE.md): "encoder" returns right after the 6 fusion-encoder
    layers, "select" after the two-stage top-k query selection."""
    B = pixel_values.shape[0]
    D = cfg.d_model

    # ---- text tower -----------------------------------------------------
    t_hidden = bert_encode(params["text"], input_ids, token_type_ids,
                           position_ids, text_attn_3d, cfg.text)
    t_feat = _lin(t_hidden, params["text_proj"])
    text_pad_mask = ~text_token_mask

    # ---- vision tower + input projections -------------------------------
    backbone_feats = swin_backbone(params["backbone"], pixel_values,
                                   cfg.swin)
    feats = []
    for level in range(cfg.num_levels):
        ip = params["input_proj"][level]
        if level < len(backbone_feats):
            src = backbone_feats[level][0]
            stride = 1
        else:
            # extra levels: 3x3 stride-2 conv on the previous source
            src = backbone_feats[-1][0] if level == len(backbone_feats) \
                else feats[-1]
            stride = 2
        k = ip["conv"]["w"].shape[0]
        y = jax.lax.conv_general_dilated(
            src, ip["conv"]["w"].astype(src.dtype), (stride, stride),
            "VALID" if k == 1 else [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = (y + ip["conv"]["b"]).astype(src.dtype)
        feats.append(_group_norm(y, ip["gn"]))

    v_flat, shapes = _flatten_levels(feats)               # [B, N, D]
    pos_flat = jnp.concatenate(
        [(_sine_pos_2d(h, w, D, cfg.pos_temperature)
          .reshape(1, -1, D) + params["level_embed"][li][None, None])
         for li, (h, w) in enumerate(shapes)], axis=1)
    pos_flat = jnp.broadcast_to(pos_flat, (B,) + pos_flat.shape[1:]
                                ).astype(v_flat.dtype)

    # encoder reference points: normalized cell centers, same for all
    # levels (valid_ratios = 1 with no padding)
    refs = []
    for (h, w) in shapes:
        gy, gx = jnp.meshgrid(
            (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
            (jnp.arange(w, dtype=jnp.float32) + 0.5) / w, indexing="ij")
        refs.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
    enc_refs = jnp.concatenate(refs, axis=0)              # [N, 2]
    enc_refs = jnp.broadcast_to(
        enc_refs[None, :, None, :],
        (B, enc_refs.shape[0], cfg.num_levels, 2))

    text_pos = _sine_pos_1d(
        position_ids.astype(jnp.float32)[..., None], cfg.d_model,
        exchange_xy=False).astype(t_feat.dtype)

    v_feat, tf = v_flat, t_feat
    for layer in params["encoder"]["layers"]:
        v_feat, tf = _encoder_layer(
            v_feat, tf, layer, cfg, v_pos=pos_flat, ref_points=enc_refs,
            shapes=shapes, text_pos=text_pos, text_attn_3d=text_attn_3d,
            text_pad_mask=text_pad_mask)
    enc_text = tf
    if stage == "encoder":
        return {"v_feat": v_feat, "encoder_text": enc_text}

    # ---- two-stage query selection --------------------------------------
    prop_logit, prop_valid = _proposals(shapes)
    obj_query = jnp.where(prop_valid[None, :, None], v_feat, 0.0)
    obj_query = _ln(_lin(obj_query, params["enc_output"]),
                    params["enc_output_norm"], cfg.ln_eps)

    enc_class = jnp.einsum("bnd,bsd->bns", obj_query.astype(jnp.float32),
                           enc_text.astype(jnp.float32))
    enc_class = jnp.where(text_token_mask[:, None, :], enc_class, -jnp.inf)
    enc_coord_logits = (_mlp_head(obj_query, params["enc_bbox_head"])
                        .astype(jnp.float32) + prop_logit[None])

    topk_scores = jnp.max(enc_class, axis=-1)             # [B, N]
    _, topk_idx = jax.lax.top_k(topk_scores, cfg.num_queries)
    topk_coords = jnp.take_along_axis(
        enc_coord_logits, topk_idx[:, :, None], axis=1)
    reference = jax.nn.sigmoid(topk_coords)               # [B, nq, 4]
    if stage == "select":
        return {"pred_boxes": reference, "encoder_text": enc_text}
    # query_embed is stored at the checkpoint's 900 queries; a pruned
    # config (cfg.num_queries < 900) takes the leading rows -- the
    # two-stage top-k above already narrows to the same count
    target = jnp.broadcast_to(
        params["query_embed"][None, :cfg.num_queries],
        (B, cfg.num_queries, D)).astype(v_feat.dtype)

    # ---- decoder ---------------------------------------------------------
    dec_text_mask = (text_pad_mask.astype(jnp.float32)[:, None, None, :]
                     * -1e30)
    hidden = target
    for layer in params["decoder"]["layers"]:
        # query position embedding from current reference boxes:
        # sine(cy|cx|w|h interleaved) -> 2-layer MLP
        qpos_sine = _sine_pos_1d(reference, D // 2, exchange_xy=True)
        qpos = _mlp_head(qpos_sine.astype(hidden.dtype),
                         params["decoder"]["ref_head"])
        qk = hidden + qpos
        att = _mha(qk, qk, hidden, layer["self_attn"], cfg.heads)
        hidden = _ln(hidden + att, layer["ln_sa"], cfg.ln_eps)

        att = _mha(hidden + qpos, enc_text, enc_text, layer["text_cross"],
                   cfg.heads, additive_mask=dec_text_mask)
        hidden = _ln(hidden + att, layer["ln_tc"], cfg.ln_eps)

        ref_in = jnp.broadcast_to(
            reference[:, :, None, :],
            (B, cfg.num_queries, cfg.num_levels, 4))
        att = _deform_attention(hidden + qpos, v_feat, ref_in, shapes,
                                layer["deform"], cfg.heads, cfg.dec_points)
        hidden = _ln(hidden + att, layer["ln_ca"], cfg.ln_eps)

        y = _lin(jax.nn.relu(_lin(hidden, layer["fc1"])), layer["fc2"])
        hidden = _ln(hidden + y, layer["ln_ffn"], cfg.ln_eps)

        # iterative box refinement (shared bbox head)
        delta = _mlp_head(hidden, params["bbox_head"]).astype(jnp.float32)
        reference = jax.nn.sigmoid(delta + _inverse_sigmoid(reference))

    hidden = _ln(hidden, params["decoder"]["norm"], cfg.ln_eps)

    # ---- heads (final decoder level) -------------------------------------
    logits = jnp.einsum("bqd,bsd->bqs", hidden.astype(jnp.float32),
                        enc_text.astype(jnp.float32))
    logits = jnp.where(text_token_mask[:, None, :], logits, -jnp.inf)
    S = logits.shape[-1]
    if S < cfg.max_text_len:
        logits = jnp.pad(logits, ((0, 0), (0, 0),
                                  (0, cfg.max_text_len - S)),
                         constant_values=-jnp.inf)
    return {"logits": logits, "pred_boxes": reference,
            "encoder_text": enc_text}


# --------------------------------------------------------------------------
# init (random weights at the real shapes, for tests/serving smoke)
# --------------------------------------------------------------------------

def init_params(cfg: GroundingDinoConfig, key, dtype=jnp.float32
                ) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 4096))

    def lin(fi, fo, bias=True):
        out = {"w": jax.random.normal(next(ks), (fi, fo), dtype)
               / math.sqrt(fi)}
        if bias:
            out["b"] = jnp.zeros((fo,), dtype)
        return out

    def ln(d):
        return {"scale": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype)}

    D = cfg.d_model
    sw = cfg.swin

    def swin_params():
        stages = []
        for si, depth in enumerate(sw.depths):
            dim = sw.stage_dim(si)
            blocks = []
            for _ in range(depth):
                blocks.append({
                    "ln1": ln(dim), "ln2": ln(dim),
                    "q": lin(dim, dim), "k": lin(dim, dim),
                    "v": lin(dim, dim), "attn_out": lin(dim, dim),
                    "rpb": jax.random.normal(
                        next(ks), ((2 * sw.window_size - 1) ** 2,
                                   sw.num_heads[si]), dtype) * 0.02,
                    "rpb_index": jnp.asarray(
                        _swin_rel_pos_index(sw.window_size)),
                    "fc1": lin(dim, int(dim * sw.mlp_ratio)),
                    "fc2": lin(int(dim * sw.mlp_ratio), dim),
                })
            stage = {"blocks": blocks}
            if si < len(sw.depths) - 1:
                stage["downsample"] = {
                    "norm": ln(4 * dim),
                    "reduction": lin(4 * dim, 2 * dim, bias=False)}
            stages.append(stage)
        return {
            "patch_proj": {
                "w": jax.random.normal(
                    next(ks), (sw.patch_size, sw.patch_size, 3,
                               sw.embed_dim), dtype) * 0.02,
                "b": jnp.zeros((sw.embed_dim,), dtype)},
            "embed_norm": ln(sw.embed_dim),
            "stages": stages,
            "out_norms": [ln(sw.stage_dim(i)) for i in sw.out_stages],
        }

    tc = cfg.text

    def bert_params():
        layers = []
        for _ in range(tc.layers):
            layers.append({
                "q": lin(tc.dim, tc.dim), "k": lin(tc.dim, tc.dim),
                "v": lin(tc.dim, tc.dim), "out": lin(tc.dim, tc.dim),
                "attn_norm": ln(tc.dim),
                "fc1": lin(tc.dim, tc.ffn), "fc2": lin(tc.ffn, tc.dim),
                "out_norm": ln(tc.dim),
            })
        return {
            "word_emb": jax.random.normal(
                next(ks), (tc.vocab_size, tc.dim), dtype) * 0.02,
            "pos_emb": jax.random.normal(
                next(ks), (tc.max_pos, tc.dim), dtype) * 0.02,
            "type_emb": jax.random.normal(
                next(ks), (tc.type_vocab, tc.dim), dtype) * 0.02,
            "emb_norm": ln(tc.dim),
            "layers": layers,
        }

    def deform(points):
        return {
            "sampling_offsets": lin(D, cfg.heads * cfg.num_levels
                                    * points * 2),
            "attention_weights": lin(D, cfg.heads * cfg.num_levels
                                     * points),
            "value_proj": lin(D, D), "output_proj": lin(D, D),
        }

    def enc_layer():
        fd = cfg.fusion_dim
        return {
            "fusion": {
                "ln_v": ln(D), "ln_t": ln(D),
                "vision_proj": lin(D, fd), "text_proj": lin(D, fd),
                "values_vision_proj": lin(D, fd),
                "values_text_proj": lin(D, fd),
                "out_vision_proj": lin(fd, D), "out_text_proj": lin(fd, D),
                "vision_param": jnp.full((D,), 1e-4, dtype),
                "text_param": jnp.full((D,), 1e-4, dtype),
            },
            "text_enh": {
                "q": lin(D, D), "k": lin(D, D), "v": lin(D, D),
                "out": lin(D, D), "ln_before": ln(D), "ln_after": ln(D),
                "fc1": lin(D, cfg.ffn_dim // 2),
                "fc2": lin(cfg.ffn_dim // 2, D),
            },
            "deform": {**deform(cfg.enc_points), "ln1": ln(D),
                       "fc1": lin(D, cfg.ffn_dim),
                       "fc2": lin(cfg.ffn_dim, D), "ln2": ln(D)},
        }

    def dec_layer():
        return {
            "self_attn": {"q": lin(D, D), "k": lin(D, D), "v": lin(D, D),
                          "out": lin(D, D)},
            "ln_sa": ln(D),
            "text_cross": {"q": lin(D, D), "k": lin(D, D),
                           "v": lin(D, D), "out": lin(D, D)},
            "ln_tc": ln(D),
            "deform": deform(cfg.dec_points),
            "ln_ca": ln(D),
            "fc1": lin(D, cfg.ffn_dim), "fc2": lin(cfg.ffn_dim, D),
            "ln_ffn": ln(D),
        }

    gn = lambda: {"scale": jnp.ones((D,), dtype),
                  "bias": jnp.zeros((D,), dtype)}
    in_ch = [sw.stage_dim(i) for i in sw.out_stages]
    input_proj = []
    for level in range(cfg.num_levels):
        if level < len(in_ch):
            c, k = in_ch[level], 1
        else:
            c, k = (in_ch[-1] if level == len(in_ch) else D), 3
        input_proj.append({
            "conv": {"w": jax.random.normal(next(ks), (k, k, c, D), dtype)
                     * 0.02, "b": jnp.zeros((D,), dtype)},
            "gn": gn()})

    return {
        "backbone": swin_params(),
        "text": bert_params(),
        "text_proj": lin(tc.dim, D),
        "input_proj": input_proj,
        "level_embed": jax.random.normal(
            next(ks), (cfg.num_levels, D), dtype) * 0.02,
        "query_embed": jax.random.normal(
            next(ks), (cfg.num_queries, D), dtype) * 0.02,
        "encoder": {"layers": [enc_layer()
                               for _ in range(cfg.encoder_layers)]},
        "enc_output": lin(D, D), "enc_output_norm": ln(D),
        "enc_bbox_head": [lin(D, D), lin(D, D), lin(D, 4)],
        "decoder": {
            "layers": [dec_layer() for _ in range(cfg.decoder_layers)],
            "norm": ln(D),
            "ref_head": [lin(2 * D, D), lin(D, D)],
        },
        "bbox_head": [lin(D, D), lin(D, D), lin(D, 4)],
    }


# --------------------------------------------------------------------------
# HF checkpoint conversion (IDEA-Research/grounding-dino-tiny layout)
# --------------------------------------------------------------------------

def convert_hf(state_dict: Mapping[str, Any], cfg: GroundingDinoConfig,
               dtype=jnp.float32) -> Dict[str, Any]:
    def _t(x):
        return (x.detach().cpu().numpy() if hasattr(x, "detach")
                else np.asarray(x))

    sd = {k: _t(v) for k, v in state_dict.items()}
    # GroundingDinoForObjectDetection prefixes everything with "model."
    if any(k.startswith("model.") for k in sd):
        sd = {(k[6:] if k.startswith("model.") else k): v
              for k, v in sd.items()}

    def lin(prefix):
        out = {"w": jnp.asarray(sd[prefix + ".weight"].T, dtype)}
        if prefix + ".bias" in sd:
            out["b"] = jnp.asarray(sd[prefix + ".bias"], dtype)
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    sw = cfg.swin
    bb = "backbone.conv_encoder.model"

    def swin_blk(prefix, si):
        a = f"{prefix}.attention"
        return {
            "ln1": ln(f"{prefix}.layernorm_before"),
            "ln2": ln(f"{prefix}.layernorm_after"),
            "q": lin(f"{a}.self.query"), "k": lin(f"{a}.self.key"),
            "v": lin(f"{a}.self.value"),
            "attn_out": lin(f"{a}.output.dense"),
            "rpb": jnp.asarray(
                sd[f"{a}.self.relative_position_bias_table"], dtype),
            "rpb_index": jnp.asarray(_swin_rel_pos_index(sw.window_size)),
            "fc1": lin(f"{prefix}.intermediate.dense"),
            "fc2": lin(f"{prefix}.output.dense"),
        }

    stages = []
    for si, depth in enumerate(sw.depths):
        sp = f"{bb}.encoder.layers.{si}"
        stage = {"blocks": [swin_blk(f"{sp}.blocks.{bi}", si)
                            for bi in range(depth)]}
        if f"{sp}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": ln(f"{sp}.downsample.norm"),
                "reduction": lin(f"{sp}.downsample.reduction")}
        stages.append(stage)

    conv_w = sd[f"{bb}.embeddings.patch_embeddings.projection.weight"]
    backbone = {
        "patch_proj": {
            "w": jnp.asarray(conv_w.transpose(2, 3, 1, 0), dtype),
            "b": jnp.asarray(
                sd[f"{bb}.embeddings.patch_embeddings.projection.bias"],
                dtype)},
        "embed_norm": ln(f"{bb}.embeddings.norm"),
        "stages": stages,
        "out_norms": [ln(f"{bb}.hidden_states_norms.stage{i + 1}")
                      for i in sw.out_stages],
    }

    tb = "text_backbone"

    def bert_layer(i):
        p = f"{tb}.encoder.layer.{i}"
        return {
            "q": lin(f"{p}.attention.self.query"),
            "k": lin(f"{p}.attention.self.key"),
            "v": lin(f"{p}.attention.self.value"),
            "out": lin(f"{p}.attention.output.dense"),
            "attn_norm": ln(f"{p}.attention.output.LayerNorm"),
            "fc1": lin(f"{p}.intermediate.dense"),
            "fc2": lin(f"{p}.output.dense"),
            "out_norm": ln(f"{p}.output.LayerNorm"),
        }

    text = {
        "word_emb": jnp.asarray(
            sd[f"{tb}.embeddings.word_embeddings.weight"], dtype),
        "pos_emb": jnp.asarray(
            sd[f"{tb}.embeddings.position_embeddings.weight"], dtype),
        "type_emb": jnp.asarray(
            sd[f"{tb}.embeddings.token_type_embeddings.weight"], dtype),
        "emb_norm": ln(f"{tb}.embeddings.LayerNorm"),
        "layers": [bert_layer(i) for i in range(cfg.text.layers)],
    }

    def deform(prefix):
        return {"sampling_offsets": lin(f"{prefix}.sampling_offsets"),
                "attention_weights": lin(f"{prefix}.attention_weights"),
                "value_proj": lin(f"{prefix}.value_proj"),
                "output_proj": lin(f"{prefix}.output_proj")}

    def enc_layer(i):
        p = f"encoder.layers.{i}"
        fu = f"{p}.fusion_layer"
        te = f"{p}.text_enhancer_layer"
        de = f"{p}.deformable_layer"
        return {
            "fusion": {
                "ln_v": ln(f"{fu}.layer_norm_vision"),
                "ln_t": ln(f"{fu}.layer_norm_text"),
                "vision_proj": lin(f"{fu}.attn.vision_proj"),
                "text_proj": lin(f"{fu}.attn.text_proj"),
                "values_vision_proj": lin(f"{fu}.attn.values_vision_proj"),
                "values_text_proj": lin(f"{fu}.attn.values_text_proj"),
                "out_vision_proj": lin(f"{fu}.attn.out_vision_proj"),
                "out_text_proj": lin(f"{fu}.attn.out_text_proj"),
                "vision_param": jnp.asarray(sd[f"{fu}.vision_param"],
                                            dtype),
                "text_param": jnp.asarray(sd[f"{fu}.text_param"], dtype),
            },
            "text_enh": {
                "q": lin(f"{te}.self_attn.query"),
                "k": lin(f"{te}.self_attn.key"),
                "v": lin(f"{te}.self_attn.value"),
                "out": lin(f"{te}.self_attn.out_proj"),
                "ln_before": ln(f"{te}.layer_norm_before"),
                "ln_after": ln(f"{te}.layer_norm_after"),
                "fc1": lin(f"{te}.fc1"), "fc2": lin(f"{te}.fc2"),
            },
            "deform": {**deform(f"{de}.self_attn"),
                       "ln1": ln(f"{de}.self_attn_layer_norm"),
                       "fc1": lin(f"{de}.fc1"), "fc2": lin(f"{de}.fc2"),
                       "ln2": ln(f"{de}.final_layer_norm")},
        }

    def dec_layer(i):
        p = f"decoder.layers.{i}"
        return {
            "self_attn": {"q": lin(f"{p}.self_attn.query"),
                          "k": lin(f"{p}.self_attn.key"),
                          "v": lin(f"{p}.self_attn.value"),
                          "out": lin(f"{p}.self_attn.out_proj")},
            "ln_sa": ln(f"{p}.self_attn_layer_norm"),
            "text_cross": {"q": lin(f"{p}.encoder_attn_text.query"),
                           "k": lin(f"{p}.encoder_attn_text.key"),
                           "v": lin(f"{p}.encoder_attn_text.value"),
                           "out": lin(f"{p}.encoder_attn_text.out_proj")},
            "ln_tc": ln(f"{p}.encoder_attn_text_layer_norm"),
            "deform": deform(f"{p}.encoder_attn"),
            "ln_ca": ln(f"{p}.encoder_attn_layer_norm"),
            "fc1": lin(f"{p}.fc1"), "fc2": lin(f"{p}.fc2"),
            "ln_ffn": ln(f"{p}.final_layer_norm"),
        }

    bbox_prefix = ("bbox_embed.0" if "bbox_embed.0.layers.0.weight" in sd
                   else "decoder.bbox_embed.0")

    return {
        "backbone": backbone,
        "text": text,
        "text_proj": lin("text_projection"),
        "input_proj": [
            {"conv": {"w": jnp.asarray(
                sd[f"input_proj_vision.{i}.0.weight"].transpose(
                    2, 3, 1, 0), dtype),
                "b": jnp.asarray(sd[f"input_proj_vision.{i}.0.bias"],
                                 dtype)},
             "gn": {"scale": jnp.asarray(
                 sd[f"input_proj_vision.{i}.1.weight"], dtype),
                 "bias": jnp.asarray(
                     sd[f"input_proj_vision.{i}.1.bias"], dtype)}}
            for i in range(cfg.num_levels)],
        "level_embed": jnp.asarray(sd["level_embed"], dtype),
        "query_embed": jnp.asarray(
            sd["query_position_embeddings.weight"], dtype),
        "encoder": {"layers": [enc_layer(i)
                               for i in range(cfg.encoder_layers)]},
        "enc_output": lin("enc_output"),
        "enc_output_norm": ln("enc_output_norm"),
        "enc_bbox_head": [lin(f"encoder_output_bbox_embed.layers.{i}")
                          for i in range(3)],
        "decoder": {
            "layers": [dec_layer(i) for i in range(cfg.decoder_layers)],
            "norm": ln("decoder.layer_norm"),
            "ref_head": [
                lin(f"decoder.reference_points_head.layers.{i}")
                for i in range(2)],
        },
        "bbox_head": [lin(f"{bbox_prefix}.layers.{i}") for i in range(3)],
    }


# --------------------------------------------------------------------------
# post-processing: logits over text tokens -> per-phrase detections
# --------------------------------------------------------------------------

def phrase_label_map(input_ids: np.ndarray) -> np.ndarray:
    """[S] token ids -> [num_phrases, S] binary map grouping tokens
    between delimiter tokens into class phrases (HF build_label_maps)."""
    ids = np.asarray(input_ids)
    delim = np.isin(ids, np.asarray(SPECIAL_TOKEN_IDS + (0,)))
    groups = np.cumsum(delim) * (~delim)
    uniq = np.unique(groups)
    uniq = uniq[uniq != 0]
    return (groups[None, :] == uniq[:, None]).astype(np.float32)


def scores_per_phrase(logits: np.ndarray, label_map: np.ndarray
                      ) -> np.ndarray:
    """sigmoid token logits -> mean score over each phrase's tokens
    (the HF processor's phrase scoring).  logits [Q, max_text_len],
    label_map [P, S] -> [Q, P]."""
    lg = logits[:, :label_map.shape[1]]
    probs = np.where(lg >= 0, 1.0 / (1.0 + np.exp(-np.maximum(lg, 0))),
                     np.exp(np.minimum(lg, 0))
                     / (1.0 + np.exp(np.minimum(lg, 0))))
    denom = np.maximum(label_map.sum(-1), 1.0)
    return probs @ label_map.T / denom


# --------------------------------------------------------------------------
# Detector-protocol wrapper (drop-in alternative to YoloWorldDetector)
# --------------------------------------------------------------------------

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class GroundingDinoDetector:
    """Open-vocab detector behind the same Detection interface as
    models/yolo_world.YoloWorldDetector: the long-term-memory build loop
    (reference memory_2.py:905-945) can run on either.

    classes -> one BERT prompt "a. b. c." (HF processor convention);
    phrase scores = mean sigmoid over each class's tokens; detections
    thresholded + class-wise NMS.  The forward (vision + text + encoder
    + decoder + heads) is ONE jitted program; only [B, Q, P] phrase
    scores and [B, Q, 4] boxes cross the host boundary.
    """

    def __init__(self, params, cfg: GroundingDinoConfig,
                 classes, tokenizer=None, input_ids=None,
                 confidence: float = 0.35, iou_thr: float = 0.5,
                 image_size: int = 800):
        import jax as _jax
        from bsc_nav_tpu.models.detector import Detection
        from bsc_nav_tpu.models.wordpiece import classes_to_prompt

        self._Detection = Detection
        self.params = params
        self.cfg = cfg
        self.classes = list(classes)
        self.confidence = confidence
        self.iou_thr = iou_thr
        self.image_size = image_size

        if input_ids is None:
            if tokenizer is None:
                raise ValueError("need a WordPiece tokenizer (vocab.txt) "
                                 "or explicit input_ids")
            input_ids = np.asarray(
                [tokenizer.encode(classes_to_prompt(classes))], np.int32)
        self.input_ids = np.asarray(input_ids, np.int32)
        attn3d, pos_ids = generate_text_masks(self.input_ids)
        self._attn3d = jnp.asarray(attn3d)
        self._pos_ids = jnp.asarray(pos_ids.astype(np.int32))
        self._token_mask = jnp.ones(self.input_ids.shape, bool)
        self._ids_dev = jnp.asarray(self.input_ids)
        self._type_ids = jnp.zeros_like(self._ids_dev)
        lm = phrase_label_map(self.input_ids[0])
        if lm.shape[0] != len(self.classes):
            raise ValueError(
                f"prompt produced {lm.shape[0]} phrases for "
                f"{len(self.classes)} classes -- check tokenization")
        self._label_map = jnp.asarray(lm)

        def fwd_scores(p, rgbs_u8):
            # preprocessing (resize + imagenet normalize) inside the jit:
            # no eager dispatches on the per-frame path
            B = rgbs_u8.shape[0]
            images = rgbs_u8.astype(jnp.float32) / 255.0
            s = self.image_size
            if rgbs_u8.shape[1:3] != (s, s):
                images = jax.image.resize(images, (B, s, s, 3), "bilinear")
            images = (images - IMAGENET_MEAN) / IMAGENET_STD
            ids = jnp.broadcast_to(self._ids_dev, (B,) +
                                   self._ids_dev.shape[1:])
            out = forward(
                p, images, ids,
                jnp.broadcast_to(self._type_ids, ids.shape),
                jnp.broadcast_to(self._attn3d,
                                 (B,) + self._attn3d.shape[1:]),
                jnp.broadcast_to(self._pos_ids, ids.shape),
                jnp.broadcast_to(self._token_mask, ids.shape), cfg)
            S = self.input_ids.shape[1]
            probs = jax.nn.sigmoid(out["logits"][:, :, :S])
            denom = jnp.maximum(self._label_map.sum(-1), 1.0)
            scores = jnp.einsum("bqs,ps->bqp", probs,
                                self._label_map) / denom
            return scores, out["pred_boxes"]

        self._fwd = _jax.jit(fwd_scores)

    def detect(self, rgb: np.ndarray):
        return self.detect_batch(rgb[None])[0]

    def detect_batch(self, rgbs: np.ndarray):
        from bsc_nav_tpu.models.yolo_world import nms

        H0, W0 = rgbs.shape[1:3]
        scores, boxes = self._fwd(
            self.params, jnp.asarray(np.asarray(rgbs)[..., :3],
                                     dtype=np.uint8))
        scores = np.asarray(scores)
        boxes = np.asarray(boxes)
        results = []
        for b in range(rgbs.shape[0]):
            conf = scores[b].max(axis=-1)
            cls_idx = scores[b].argmax(axis=-1)
            sel = conf >= self.confidence
            cxy, wh = boxes[b][sel, :2], boxes[b][sel, 2:]
            xyxy = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
            xyxy = xyxy * np.array([W0, H0, W0, H0], np.float32)
            conf_s, cls_s = conf[sel], cls_idx[sel]
            dets = []
            for ci in np.unique(cls_s):
                m = cls_s == ci
                for k in nms(xyxy[m], conf_s[m], self.iou_thr):
                    bx = np.clip(xyxy[m][k],
                                 0, [W0, H0, W0, H0])   # per-axis
                    dets.append(self._Detection(
                        self.classes[int(ci)], float(conf_s[m][k]),
                        tuple(bx.tolist())))
            results.append(dets)
        return results
