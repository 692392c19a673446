"""int8 quantized linear serving (the reference's `Quantizing` role).

The reference serves the SD3.5 transformer NF4-quantized through
bitsandbytes to fit/accelerate an A100 (reference memory_2.py:542-560).
The TPU-native equivalent is W8A8: symmetric per-output-channel int8
weights x dynamic per-token int8 activations accumulated in int32 on
the MXU -- v5e/v5p run int8 matmuls at 2x the bf16 peak, so unlike
weight-only schemes (which still pay bf16 MXU rates) this converts
quantization into throughput on compute-bound token matmuls.

Scheme
  weight  w[fi, fo] -> w_q int8, w_s f32[fo]   (max|w| column scaling)
  act     x[..., fi] -> x_q int8, x_s f32[..., 1] per row (dynamic)
  y = (x_q @ w_q).int32 * x_s * w_s + b        (f32 epilogue)

Per-row dynamic activation scaling keeps the quantizer outlier-robust
without calibration data (there are no calibration sets in this
training-free system).  Accuracy headroom vs the reference is large:
NF4 is 4-bit weight-only; W8A8 carries ~16x finer weight resolution.

Quantized params are plain pytrees {"w_q", "w_s", "b"?}; `linear`
dispatches on the presence of "w_q" so a model can hold a mix of
quantized token matmuls and bf16 small/vector matmuls (modulation,
embeddings) in one params tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bsc_nav_tpu.models.vit import _linear


def quantize_weight(p: dict) -> dict:
    """{"w": [fi, fo], "b"?} -> {"w_q" int8, "w_s" f32[fo], "b"?}."""
    w = p["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    q = {"w_q": jnp.round(w / s).astype(jnp.int8),
         "w_s": s}
    if "b" in p:
        q["b"] = p["b"]
    return q


def linear_q8(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """y = x @ w + b with int8 MXU accumulation (int32), f32 epilogue.

    x: [..., fi] any float dtype; returns x.dtype like models.vit._linear.
    """
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    y = jnp.einsum("...d,df->...f", xq, p["w_q"],
                   preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * p["w_s"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Dispatching linear: quantized ({"w_q", ...}) or plain ({"w", ...})."""
    if "w_q" in p:
        return linear_q8(x, p)
    return _linear(x, p)


def quantize_conv_weight(p: dict) -> dict:
    """Conv leaf {"w": [kh,kw,ci,co], **rest} -> {"w_q" int8,
    "w_s" f32[co], **rest} (per-output-channel symmetric scaling;
    BN stats / bias keys pass through untouched)."""
    w = p["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    q = {k: v for k, v in p.items() if k != "w"}
    q["w_q"] = jnp.round(w / s).astype(jnp.int8)
    q["w_s"] = s
    return q


def conv_q8(x: jnp.ndarray, p: dict, stride: int = 1) -> jnp.ndarray:
    """NHWC 'SAME' conv with int8 MXU accumulation; returns the f32
    pre-affine output (caller applies BN/bias + activation).

    Activations use a dynamic per-sample scale (per-pixel scales are
    not expressible as a conv); weights the per-cout scale from
    quantize_conv_weight.
    """
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True),
                     1e-12) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, p["w_q"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * xs * p["w_s"]
