"""Independent torch implementation of the SD3 MMDiT in the DIFFUSERS
module/state-dict layout (SD3Transformer2DModel), used as the conversion
oracle for models/mmdit.convert_sd3 — the same discipline as
torch_yolo_oracle.py.  Covers the real-checkpoint behaviors the tiny
synthetic mapping test cannot: AdaLayerNormContinuous (scale, shift)
chunk order, the context_pre_only last block (2-chunk ctx norm, no ctx
FFN/gates), pos_embed stored at pos_embed_max_size² with center crop,
RMS qk-norm, tanh-GELU FFNs.

Semantics follow the public diffusers implementation (reference role:
memory_2.py:542-560 loads the SD3 transformer through diffusers).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)
                * self.weight.float()).to(x.dtype)


class AdaLayerNormZero(nn.Module):
    """emb -> 6 chunks (shift_msa, scale_msa, gate_msa, shift_mlp,
    scale_mlp, gate_mlp)."""

    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        e = self.linear(F.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            e.chunk(6, dim=1)
        nx = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return nx, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroX(nn.Module):
    """MMDiT-X (SD3.5-medium dual-attention blocks): emb -> 9 chunks
    (..., gate_mlp, shift_msa2, scale_msa2, gate_msa2); the shared
    layernorm output is modulated twice."""

    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 9 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        e = self.linear(F.silu(emb))
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
         shift_msa2, scale_msa2, gate_msa2) = e.chunk(9, dim=1)
        nx = self.norm(x)
        nx1 = nx * (1 + scale_msa[:, None]) + shift_msa[:, None]
        nx2 = nx * (1 + scale_msa2[:, None]) + shift_msa2[:, None]
        return nx1, gate_msa, shift_mlp, scale_mlp, gate_mlp, nx2, gate_msa2


class SelfAttention(nn.Module):
    """diffusers Attention as used for MMDiT-X attn2 (latent stream
    only, RMS qk-norm)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(self.hd)
        self.norm_k = RMSNorm(self.hd)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def _heads(self, t):
        B, S, D = t.shape
        return t.view(B, S, self.heads, self.hd).transpose(1, 2)

    def forward(self, x):
        B, S, D = x.shape
        q = self.norm_q(self._heads(self.to_q(x)))
        k = self.norm_k(self._heads(self.to_k(x)))
        v = self._heads(self.to_v(x))
        out = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](out.transpose(1, 2).reshape(B, S, D))


class AdaLayerNormContinuous(nn.Module):
    """emb -> (scale, shift) — NOTE scale first (diffusers order)."""

    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        scale, shift = self.linear(F.silu(emb)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class JointAttention(nn.Module):
    def __init__(self, dim, heads, context_pre_only=False):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(self.hd)
        self.norm_k = RMSNorm(self.hd)
        self.norm_added_q = RMSNorm(self.hd)
        self.norm_added_k = RMSNorm(self.hd)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.context_pre_only = context_pre_only
        if not context_pre_only:
            self.to_add_out = nn.Linear(dim, dim)

    def _heads(self, t):
        B, S, D = t.shape
        return t.view(B, S, self.heads, self.hd).transpose(1, 2)

    def forward(self, hidden, ctx):
        B, Sx, D = hidden.shape
        q = self.norm_q(self._heads(self.to_q(hidden)))
        k = self.norm_k(self._heads(self.to_k(hidden)))
        v = self._heads(self.to_v(hidden))
        cq = self.norm_added_q(self._heads(self.add_q_proj(ctx)))
        ck = self.norm_added_k(self._heads(self.add_k_proj(ctx)))
        cv = self._heads(self.add_v_proj(ctx))
        # diffusers joint order: latent tokens first, context appended
        q = torch.cat([q, cq], dim=2)
        k = torch.cat([k, ck], dim=2)
        v = torch.cat([v, cv], dim=2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(B, -1, D)
        h_out, c_out = out[:, :Sx], out[:, Sx:]
        h_out = self.to_out[0](h_out)
        if self.context_pre_only:
            return h_out, None
        return h_out, self.to_add_out(c_out)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList([
            nn.Module(), nn.Identity(), nn.Linear(dim * mult, dim)])
        self.net[0].proj = nn.Linear(dim, dim * mult)

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0].proj(x),
                                  approximate="tanh"))


class JointTransformerBlock(nn.Module):
    def __init__(self, dim, heads, context_pre_only=False,
                 use_dual_attention=False):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.use_dual_attention = use_dual_attention
        self.norm1 = (AdaLayerNormZeroX(dim) if use_dual_attention
                      else AdaLayerNormZero(dim))
        self.norm1_context = (AdaLayerNormContinuous(dim)
                              if context_pre_only else
                              AdaLayerNormZero(dim))
        self.attn = JointAttention(dim, heads, context_pre_only)
        if use_dual_attention:
            self.attn2 = SelfAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(dim,
                                              elementwise_affine=False,
                                              eps=1e-6)
            self.ff_context = FeedForward(dim)

    def forward(self, hidden, ctx, temb):
        if self.use_dual_attention:
            (nh, gate_msa, shift_mlp, scale_mlp, gate_mlp, nh_dual,
             gate_msa2) = self.norm1(hidden, temb)
        else:
            nh, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
                hidden, temb)
        if self.context_pre_only:
            nc = self.norm1_context(ctx, temb)
        else:
            nc, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = \
                self.norm1_context(ctx, temb)
        attn_h, attn_c = self.attn(nh, nc)
        hidden = hidden + gate_msa[:, None] * attn_h
        if self.use_dual_attention:
            hidden = hidden + gate_msa2[:, None] * self.attn2(nh_dual)
        nh2 = (self.norm2(hidden) * (1 + scale_mlp[:, None])
               + shift_mlp[:, None])
        hidden = hidden + gate_mlp[:, None] * self.ff(nh2)
        if self.context_pre_only:
            return hidden, ctx
        ctx = ctx + c_gate_msa[:, None] * attn_c
        nc2 = (self.norm2_context(ctx) * (1 + c_scale_mlp[:, None])
               + c_shift_mlp[:, None])
        ctx = ctx + c_gate_mlp[:, None] * self.ff_context(nc2)
        return hidden, ctx


class TimestepEmbedding(nn.Module):
    def __init__(self, dim, in_dim=256):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def sinusoidal(t, dim=256, max_period=10000.0):
    """get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0: returns [cos | sin]."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class CombinedEmbeddings(nn.Module):
    def __init__(self, dim, pooled_dim):
        super().__init__()
        self.timestep_embedder = TimestepEmbedding(dim)
        self.text_embedder = TimestepEmbedding(dim, in_dim=pooled_dim)

    def forward(self, t, pooled):
        # SD3 pipeline passes sigma*1000 as the timestep
        return (self.timestep_embedder(sinusoidal(t * 1000.0))
                + self.text_embedder(pooled))


class PatchEmbed(nn.Module):
    def __init__(self, dim, in_ch, patch, pos_embed_max_size):
        super().__init__()
        self.patch = patch
        self.max = pos_embed_max_size
        self.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)
        self.pos_embed = nn.Parameter(
            torch.randn(1, pos_embed_max_size ** 2, dim) * 0.02)

    def forward(self, latent):
        x = self.proj(latent).flatten(2).transpose(1, 2)
        g = latent.shape[-1] // self.patch
        top = (self.max - g) // 2
        pe = self.pos_embed.view(1, self.max, self.max, -1)[
            :, top:top + g, top:top + g].reshape(1, g * g, -1)
        return x + pe


class SD3TransformerOracle(nn.Module):
    """diffusers SD3Transformer2DModel-layout oracle."""

    def __init__(self, dim=64, heads=4, depth=3, in_ch=4, patch=2,
                 context_dim=32, pooled_dim=16, pos_embed_max_size=8,
                 dual_attention_layers=()):
        super().__init__()
        self.dim = dim
        self.patch = patch
        self.in_ch = in_ch
        self.pos_embed = PatchEmbed(dim, in_ch, patch, pos_embed_max_size)
        self.time_text_embed = CombinedEmbeddings(dim, pooled_dim)
        self.context_embedder = nn.Linear(context_dim, dim)
        self.transformer_blocks = nn.ModuleList([
            JointTransformerBlock(
                dim, heads, context_pre_only=(i == depth - 1),
                use_dual_attention=(i in dual_attention_layers))
            for i in range(depth)])
        self.norm_out = AdaLayerNormContinuous(dim)
        self.proj_out = nn.Linear(dim, patch * patch * in_ch)

    def forward(self, latent, t, context, pooled):
        """latent [B, C, H, W] -> velocity [B, C, H, W]."""
        B, C, H, W = latent.shape
        hidden = self.pos_embed(latent)
        temb = self.time_text_embed(t, pooled)
        ctx = self.context_embedder(context)
        for blk in self.transformer_blocks:
            hidden, ctx = blk(hidden, ctx, temb)
        hidden = self.norm_out(hidden, temb)
        out = self.proj_out(hidden)
        p = self.patch
        out = out.view(B, H // p, W // p, p, p, C)
        out = torch.einsum("nhwpqc->nchpwq", out)
        return out.reshape(B, C, H, W)
