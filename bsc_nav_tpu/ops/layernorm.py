"""Pallas TPU layer norm -- kept as a MEASURED NEGATIVE RESULT.

The r3 trace attributed 20.5 of the ViT-L encoder's 36 ms/b32 to XLA's
cross-lane LN reduce fusions (0.756 ms per [32, 261, 1024] call), which
motivated this fused kernel (read tile -> f32 stats -> normalize+affine
-> write).  The in-context A/B on real TPU disagreed: full encoder
37.56 ms with the jnp LN vs 39.60/39.85/39.77/40.11 ms with this
kernel at bm=128/256/512/2048.  XLA overlaps the LN reductions with
neighboring MXU work, so the trace's serial attribution double-counted
them, and the pallas_call boundary breaks elementwise fusion around
each LN.  NOT dispatched from models/vit.layer_norm; kept in tree with
its parity test (tests/test_layernorm.py) per the repo's
negative-result convention (see also ops/conv2d.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                     # [bm, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "bm", "interpret"))
def layer_norm_tpu(x, scale, bias, eps: float = 1e-6, bm: int = 256,
                   interpret: bool = False):
    """LN over the last axis with affine params; x [..., D]."""
    shape = x.shape
    D = shape[-1]
    xm = x.reshape(-1, D)
    M = xm.shape[0]
    Mp = ((M + bm - 1) // bm) * bm
    if Mp != M:
        xm = jnp.pad(xm, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        interpret=interpret,
    )(xm, scale.reshape(1, D), bias.reshape(1, D))
    return out[:M].reshape(shape)


def use_layer_norm_kernel(x) -> bool:
    return (jax.default_backend() == "tpu"
            and x.shape[-1] % 128 == 0
            and x.dtype in (jnp.bfloat16, jnp.float32))
