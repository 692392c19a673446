"""Mid-sequence attention kernel experiment (S ~ 1k-4k).

XLA's fused attention wins over the blockwise flash kernel here (see
ops/flash_attention.py dispatch comments) but still materializes the
[B,H,S,S] logits+probs round trip (~3.2 ms/op at S=1101 b6h24).  A
one-shot kernel with KV resident in VMEM and only q tiled (grid
reuses the K/V block across q steps) should approach pure q/k/v/out
traffic.  This tool measures candidate block sizes vs XLA.
"""

import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _mid_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # [bq, d]
    k = k_ref[0].astype(jnp.float32)                  # [S_p, d]
    v = v_ref[0].astype(jnp.float32)
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(k_pos < kv_len, logits, _NEG_INF)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = (out / jnp.sum(p, axis=1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq",))
def mid_attention(q, k, v, bq: int = 256):
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    scale = 1.0 / math.sqrt(Dh)
    Sq_p = ((Sq + bq - 1) // bq) * bq
    Sk_p = ((Sk + 127) // 128) * 128
    qp = jnp.pad(q.reshape(B * H, Sq, Dh), ((0, 0), (0, Sq_p - Sq),
                                            (0, 0)))
    kp = jnp.pad(k.reshape(B * H, Sk, Dh), ((0, 0), (0, Sk_p - Sk),
                                            (0, 0)))
    vp = jnp.pad(v.reshape(B * H, Sk, Dh), ((0, 0), (0, Sk_p - Sk),
                                            (0, 0)))
    grid = (B * H, Sq_p // bq)
    out = pl.pallas_call(
        functools.partial(_mid_kernel, kv_len=Sk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dh), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # constant in i -> Mosaic keeps K/V resident across q steps
            pl.BlockSpec((1, Sk_p, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk_p, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, Dh), q.dtype),
    )(qp, kp, vp)
    return out[:, :Sq].reshape(B, H, Sq, Dh)


def timed(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    r = float(np.asarray(out).ravel()[0])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(outs[-1]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<40} {ms:8.2f} ms (compile {c:.0f}s)", flush=True)
    return ms, r


def main():
    from bsc_nav_tpu.ops import flash_attention as FA
    print("devices:", jax.devices(), flush=True)
    B, h, S, d = 6, 24, 1101, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, h, S, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, h, S, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, h, S, d), jnp.bfloat16)

    def loop(fn, **kw):
        def f(q, k, v):
            o = v
            for _ in range(8):
                o = fn(q, k, o, **kw)
            return jnp.sum(o.astype(jnp.float32))
        return jax.jit(f)

    # correctness first
    ref = FA.reference_attention(q, k, v)
    for bq in (128, 256, 512):
        out = mid_attention(q, k, v, bq=bq)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"bq={bq} max err {err:.2e}", flush=True)

    timed("xla x8", loop(FA.reference_attention), q, k, v)
    for bq in (128, 256, 512, 1024):
        timed(f"mid bq={bq} x8", loop(mid_attention, bq=bq), q, k, v)
    timed("flash x8", loop(FA.flash_attention), q, k, v)


if __name__ == "__main__":
    main()
