"""Pallas implicit-GEMM 3x3 conv (ops/conv2d.conv3x3_s1) vs XLA
lax.conv at the YOLOv8x C2f body shapes -- the documented ~46%-MFU
ceiling (CLAUDE.md) this kernel targets (VERDICT r2 item 2).

Isolated op timing first, then (if the op wins) measure INSIDE the
full detect dispatch per the repo's measure-in-context rule.

  python tools/conv_kernel_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12        # v5e MXU peak, bf16


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timed(name, fn, *args, iters=8, flops=None):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    mfu = f"  MFU {flops / (ms / 1e3) / PEAK_BF16 * 100:5.1f}%" \
        if flops else ""
    print(f"{name:<44} {ms:8.2f} ms{mfu}", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from bsc_nav_tpu.ops.conv2d import conv3x3_s1

    print("devices:", jax.devices(), flush=True)
    B = 32
    # (H, W, C, CO, th): the v8x body's 3x3/s1 conv population @640
    # (C2f bottleneck convs at P3/P4/P5 widths)
    shapes = [
        (80, 80, 160, 160, 8),
        (80, 80, 320, 320, 8),
        (40, 40, 320, 320, 8),
        (40, 40, 640, 640, 8),
        (20, 20, 640, 640, 4),
    ]
    for (H, W, C, CO, th) in shapes:
        rng = jax.random.PRNGKey(H * C)
        x = jax.random.normal(rng, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(rng, (3, 3, C, CO), jnp.bfloat16) * 0.05
        bias = jnp.zeros((CO,), jnp.float32)
        flops = 2 * B * H * W * C * CO * 9

        # reduce in-jit: returning the full map would time a 65 MB
        # tunnel transfer, not the conv
        def _lax(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + b
            y = y * jax.nn.sigmoid(y)
            return jnp.sum(y.astype(jnp.bfloat16).astype(jnp.float32))
        lax_fn = jax.jit(_lax)
        timed(f"lax.conv   {H}x{W}x{C}->{CO}", lax_fn, x, w, bias,
              flops=flops)

        w9 = jnp.asarray(np.asarray(w).reshape(9, C, CO))
        pk = jax.jit(lambda x, w9, b: jnp.sum(conv3x3_s1(
            x, w9, b, act="silu", th=th).astype(jnp.float32)))
        try:
            timed(f"pallas     {H}x{W}x{C}->{CO} (th={th})", pk, x, w9,
                  bias, flops=flops)
        except Exception as e:        # noqa: BLE001
            print(f"pallas {H}x{W}x{C}->{CO} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
