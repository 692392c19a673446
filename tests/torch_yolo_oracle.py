"""Independent torch YOLOv8-World oracle in the ULTRALYTICS module
layout (state_dict keys match `model.{idx}.*` of yolov8*-worldv2).

Written from the public architecture definition (yolov8-worldv2 yaml +
the documented MaxSigmoidAttnBlock / BNContrastiveHead equations) — NOT
from this repo's JAX code — so agreement between the two is evidence
that both the JAX forward and the checkpoint converter implement the
public semantics.  Structure: Conv(conv+BN eps1e-3+SiLU), C2f, SPPF,
C2fAttn with max-sigmoid text gating, PAN neck, WorldDetect with DFL
box branch + BN-contrastive class head (logit_scale.exp() scaling).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c, c, 3, 1)
        self.cv2 = Conv(c, c, 3, 1)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(Bottleneck(self.c, shortcut)
                               for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class MaxSigmoidAttnBlock(nn.Module):
    def __init__(self, c1, c2, nh=1, ec=128, gc=512, scale=False):
        super().__init__()
        self.nh = nh
        self.hc = ec // nh
        self.ec = Conv(c1, ec, 1, act=False) if c1 != ec else None
        self.gl = nn.Linear(gc, ec)
        self.bias = nn.Parameter(torch.zeros(nh))
        self.proj_conv = Conv(c1, c2, 3, 1, act=False)
        self.scale = (nn.Parameter(torch.ones(1, nh, 1, 1)) if scale
                      else 1.0)

    def forward(self, x, guide):
        bs, _, h, w = x.shape
        guide = self.gl(guide)
        guide = guide.view(bs, -1, self.nh, self.hc)
        embed = self.ec(x) if self.ec is not None else x
        embed = embed.view(bs, self.nh, self.hc, h, w)
        aw = torch.einsum("bmchw,bnmc->bmhwn", embed, guide)
        aw = aw.max(dim=-1)[0]
        aw = aw / (self.hc ** 0.5)
        aw = aw + self.bias[None, :, None, None]
        aw = aw.sigmoid() * self.scale
        x = self.proj_conv(x)
        x = x.view(bs, self.nh, -1, h, w)
        x = x * aw.unsqueeze(2)
        return x.view(bs, -1, h, w)


class C2fAttn(nn.Module):
    def __init__(self, c1, c2, n=1, ec=128, nh=1, gc=512, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((3 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(Bottleneck(self.c, shortcut)
                               for _ in range(n))
        self.attn = MaxSigmoidAttnBlock(self.c, self.c, gc=gc, ec=ec,
                                        nh=nh)

    def forward(self, x, guide):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        y.append(self.attn(y[-1], guide))
        return self.cv2(torch.cat(y, 1))


class BNContrastiveHead(nn.Module):
    def __init__(self, embed_dims):
        super().__init__()
        self.norm = nn.BatchNorm2d(embed_dims)
        self.bias = nn.Parameter(torch.tensor([0.0]))
        self.logit_scale = nn.Parameter(-1.0 * torch.ones([]))

    def forward(self, x, w):
        x = self.norm(x)
        w = F.normalize(w, dim=-1, p=2)
        x = torch.einsum("bchw,bkc->bkhw", x, w)
        return x * self.logit_scale.exp() + self.bias


class WorldDetect(nn.Module):
    def __init__(self, chs, embed_dim, reg_max=16):
        super().__init__()
        c2 = max(16, chs[0] // 4, reg_max * 4)
        c3 = max(chs[0], min(100, embed_dim))
        self.reg_max = reg_max
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(ch, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for ch in chs)
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(ch, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, embed_dim, 1)) for ch in chs)
        self.cv4 = nn.ModuleList(BNContrastiveHead(embed_dim)
                                 for _ in chs)

    def forward(self, feats, txt):
        outs = []
        for i, x in enumerate(feats):
            box = self.cv2[i](x)
            cls = self.cv4[i](self.cv3[i](x), txt)
            outs.append((box, cls))
        return outs


class YoloWorldOracle(nn.Module):
    """Graph per yolov8-worldv2.yaml; `model.{idx}` naming so
    state_dict() keys match ultralytics checkpoints."""

    def __init__(self, w, n, ecs, nhs, embed_dim, gc, reg_max=16):
        """w: channel-width fn, n: depth fn, ecs/nhs: per-C2fAttn embed
        channels and heads (n12, n15, n18, n21 order)."""
        super().__init__()
        layers = [
            Conv(3, w(64), 3, 2),                            # 0
            Conv(w(64), w(128), 3, 2),                       # 1
            C2f(w(128), w(128), n(3), shortcut=True),        # 2
            Conv(w(128), w(256), 3, 2),                      # 3
            C2f(w(256), w(256), n(6), shortcut=True),        # 4
            Conv(w(256), w(512), 3, 2),                      # 5
            C2f(w(512), w(512), n(6), shortcut=True),        # 6
            Conv(w(512), w(1024), 3, 2),                     # 7
            C2f(w(1024), w(1024), n(3), shortcut=True),      # 8
            SPPF(w(1024), w(1024)),                          # 9
            nn.Upsample(scale_factor=2, mode="nearest"),     # 10
            nn.Identity(),                                   # 11 Concat
            C2fAttn(w(1024) + w(512), w(512), n(3),
                    ec=ecs[0], nh=nhs[0], gc=gc),            # 12
            nn.Upsample(scale_factor=2, mode="nearest"),     # 13
            nn.Identity(),                                   # 14 Concat
            C2fAttn(w(512) + w(256), w(256), n(3),
                    ec=ecs[1], nh=nhs[1], gc=gc),            # 15
            Conv(w(256), w(256), 3, 2),                      # 16
            nn.Identity(),                                   # 17 Concat
            C2fAttn(w(256) + w(512), w(512), n(3),
                    ec=ecs[2], nh=nhs[2], gc=gc),            # 18
            Conv(w(512), w(512), 3, 2),                      # 19
            nn.Identity(),                                   # 20 Concat
            C2fAttn(w(512) + w(1024), w(1024), n(3),
                    ec=ecs[3], nh=nhs[3], gc=gc),            # 21
            WorldDetect([w(256), w(512), w(1024)], embed_dim,
                        reg_max),                            # 22
        ]
        self.model = nn.ModuleList(layers)

    def forward(self, x, txt):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        p5 = m[9](x)
        # top-down
        n12 = m[12](torch.cat([m[10](p5), p4], 1), txt)
        n15 = m[15](torch.cat([m[13](n12), p3], 1), txt)
        # bottom-up
        n18 = m[18](torch.cat([m[16](n15), n12], 1), txt)
        n21 = m[21](torch.cat([m[19](n18), p5], 1), txt)
        return m[22]([n15, n18, n21], txt)


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Random weights AND non-trivial BN running stats so conversion
    errors can't hide behind identity stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for mod in model.modules():
            if isinstance(mod, (nn.BatchNorm2d,)):
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)
    model.eval()
