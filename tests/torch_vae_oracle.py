"""Independent torch implementation of the SD-family VAE DECODER in the
diffusers AutoencoderKL module/state-dict layout — the conversion oracle
for models/vae.convert_vae_decoder (reference loads it inside the
diffusers StableDiffusion3Pipeline, memory_2.py:555-559)."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """diffusers single-head VAE attention with LINEAR projections."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).view(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        att = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(C), dim=-1)
        out = self.to_out[0](att @ v)
        return x + out.transpose(1, 2).view(B, C, H, W)


class MidBlock(nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock(c, c, groups),
                                      ResnetBlock(c, c, groups)])
        self.attentions = nn.ModuleList([Attention(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class UpBlock(nn.Module):
    def __init__(self, cin, cout, blocks, groups, upsample):
        super().__init__()
        res = []
        for j in range(blocks):
            res.append(ResnetBlock(cin if j == 0 else cout, cout, groups))
        self.resnets = nn.ModuleList(res)
        if upsample:
            up = nn.Module()
            up.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([up])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class VAEDecoderOracle(nn.Module):
    """diffusers AutoencoderKL layout (decoder half)."""

    def __init__(self, latent_channels=4, base=16, mults=(1, 2),
                 blocks_per_stage=2, groups=4):
        super().__init__()
        chans = [base * m for m in mults]
        top = chans[-1]
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent_channels, top, 3, padding=1)
        dec.mid_block = MidBlock(top, groups)
        ups = []
        cin = top
        rev = list(reversed(chans))
        for i, cout in enumerate(rev):
            ups.append(UpBlock(cin, cout, blocks_per_stage, groups,
                               upsample=(i < len(rev) - 1)))
            cin = cout
        dec.up_blocks = nn.ModuleList(ups)
        dec.conv_norm_out = nn.GroupNorm(groups, chans[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(chans[0], 3, 3, padding=1)
        self.decoder = dec

    def forward(self, z):
        d = self.decoder
        x = d.conv_in(z)
        x = d.mid_block(x)
        for up in d.up_blocks:
            x = up(x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))
