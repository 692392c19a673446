"""Pallas implicit-GEMM 3x3 stride-1 convolution for the YOLO stack.

XLA's conv lowering holds the YOLOv8x body at ~46% MFU (CLAUDE.md:
stem/space-to-depth/im2col/BN-fold variants all measured equal or
worse) -- the one documented remaining lever is a hand-tiled conv
(VERDICT r2 item 2; workload /root/reference/memory_2.py:49, v8x@640).

Formulation: implicit GEMM over row-strips.  For an output tile
[TH, W, CO] the kernel DMAs the (TH+2)-row input halo strip into VMEM
(full contiguous rows -- padded-destination DMAs trip Mosaic), builds
the W+2 zero-padded strip as a value, and accumulates the nine taps as
[TH*W, C] x [C, CO] MXU matmuls (no im2col materialization, no halo
re-reads from HBM), adds the (BN-folded) bias and applies the
activation in-register before the single store of the output tile.

Targets 3x3/s1/SAME NHWC convs; other shapes use lax.conv.

MEASURED RESULT (TPU v5e-1, b32, tools/conv_kernel_bench.py, r3):
negative -- keep lax.conv in the YOLO stack.
  - At the one lane-aligned v8x body shape (40x40x640->640) the kernel
    TIES XLA: 5.48 ms / 34.9% MFU vs lax 5.18 ms / 37.0%.
  - Aligned diagnostic shapes reach 7-40% MFU (128->7.3%, 256->25.8%,
    384->40.2%, 512->27.3%) -- the same band as XLA's lowering, i.e.
    the 46% ceiling is not an XLA artifact but the cost of halo
    re-reads + modest-M matmuls at these shapes.
  - The real v8x channel widths 160/320 are NOT multiples of the
    128-lane width and Mosaic rejects the kernel outright (opaque
    remote-compile INTERNAL via the tunnel); zero-padding channels to
    align would burn 20-60% extra FLOPs, more than any plausible win.
  - W=20 (the P5 level) also fails to compile (sublane-pad of the
    W+2 value slice).
Conclusion: XLA's conv lowering is at parity with a hand-tiled
implicit GEMM on this hardware generation for this workload; the
kernel stays in-tree as the measurement artifact (VERDICT r2 item 2
"or a committed negative result with the kernel in tree").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *,
            TH: int, W: int, C: int, CO: int, H: int, act: str):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_rows = pl.num_programs(1)

    # zero the H-halo rows when this tile touches the image border
    @pl.when(i == 0)
    def _():
        scratch[0] = jnp.zeros((W, C), scratch.dtype)

    @pl.when(i == n_rows - 1)
    def _():
        scratch[TH + 1] = jnp.zeros((W, C), scratch.dtype)

    # DMA the halo strip: rows [i*TH - 1, i*TH + TH + 1) clamped;
    # n is TH+2 interior, TH+1 at an edge, TH for a single-tile grid --
    # static size per predicated branch
    src_lo = jnp.maximum(i * TH - 1, 0)
    src_hi = jnp.minimum(i * TH + TH + 1, H)
    dst_lo = jnp.where(i == 0, 1, 0)
    n = src_hi - src_lo

    def copy(rows):
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_lo, rows), :, :],
            scratch.at[pl.ds(dst_lo, rows), :, :],
            sem,
        )
        dma.start()
        dma.wait()

    @pl.when(n == TH + 2)
    def _():
        copy(TH + 2)

    @pl.when(n == TH + 1)
    def _():
        copy(TH + 1)

    @pl.when(n == TH)
    def _():
        copy(TH)

    accv = jnp.zeros((TH * W, CO), jnp.float32)
    for dy in range(3):
        v = scratch[dy:dy + TH, :, :]                     # [TH, W, C]
        vp = jnp.pad(v, ((0, 0), (1, 1), (0, 0)))        # W+2 padded
        for dx in range(3):
            xs = vp[:, dx:dx + W, :].reshape(TH * W, C)
            accv += jnp.dot(xs, w_ref[dy * 3 + dx],
                            preferred_element_type=jnp.float32)
    accv += b_ref[0].astype(jnp.float32)
    if act == "silu":
        accv = accv * jax.nn.sigmoid(accv)
    o_ref[0] = accv.reshape(TH, W, CO).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "th", "interpret"))
def conv3x3_s1(x, w9, bias, act: str = "silu", th: int = 8,
               interpret: bool = False):
    """x [B, H, W, C]; w9 [9, C, CO] (tap-major HWIO flattened);
    bias [CO] f32 (BN pre-folded).  Returns [B, H, W, CO].
    H must divide by th."""
    B, H, W, C = x.shape
    CO = w9.shape[2]
    assert H % th == 0, (H, th)

    kern = functools.partial(_kernel, TH=th, W=W, C=C, CO=CO, H=H,
                             act=act)
    flops = 2 * B * H * W * C * CO * 9
    return pl.pallas_call(
        kern,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x in HBM
            pl.BlockSpec((9, C, CO), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, CO),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + w9.size * w9.dtype.itemsize
            + B * H * W * CO * x.dtype.itemsize,
            transcendentals=B * H * W * CO if act == "silu" else 0),
        interpret=interpret,
    )(x, w9, bias.reshape(1, CO))


def fold_bn(w_hwio, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-3):
    """Conv+BN -> conv weights [9, C, CO] + bias [CO] for conv3x3_s1
    (ultralytics Conv blocks carry BN; at inference it folds)."""
    s = bn_scale / jnp.sqrt(bn_var + eps)
    w = (w_hwio * s[None, None, None, :]).astype(w_hwio.dtype)
    b = (bn_bias - bn_mean * s).astype(jnp.float32)
    k, _, C, CO = w.shape
    return w.reshape(k * k, C, CO), b
