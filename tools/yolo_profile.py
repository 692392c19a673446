"""YOLO-World component timing on real TPU: the build loop's detector
costs ~3.0 ms/frame (b32@640) vs the encoder+ingest 1.6 ms/frame --
where does it go?  backbone vs neck(C2fAttn) vs head vs resize/decode.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(outs[-1]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<46} compile {compile_s:5.1f}s  {ms:8.2f} ms/iter",
          flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import yolo_world as Y

    print("devices:", jax.devices(), flush=True)
    cfg = Y.YOLOV8X_WORLDV2
    params = Y.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                           text_dim=cfg.embed_dim)
    B, T = 32, 20
    temb = jax.random.normal(jax.random.PRNGKey(1), (T, cfg.embed_dim),
                             jnp.bfloat16)
    x640 = jax.random.uniform(jax.random.PRNGKey(2), (B, 640, 640, 3),
                              jnp.bfloat16)
    u680 = jax.random.randint(jax.random.PRNGKey(3), (B, 680, 680, 3),
                              0, 255, jnp.uint8)

    def full(p, x, t):
        outs = Y.forward(p, x, t, cfg)
        return sum(jnp.sum(a.astype(jnp.float32)) + jnp.sum(
            b.astype(jnp.float32)) for a, b in outs)
    t_full = timed("full forward b32@640", jax.jit(full), params, x640,
                   temb)
    # scoped W8A8 (r3 honest probes): neck+head int8 wins, backbone int8
    # loses -- scope="neck" is the serving default (bench BENCH_YOLO_INT8)
    timed("full forward b32@640 int8 scope=neck", jax.jit(full),
          Y.quantize_params(params), x640, temb)
    timed("full forward b32@640 int8 scope=all", jax.jit(full),
          Y.quantize_params(params, scope="all"), x640, temb)

    def fwd_decode(p, x, t):
        boxes, conf, cls = Y.decode_topk_device(
            Y.forward(p, x, t, cfg), cfg, k=256)
        return jnp.sum(conf)
    timed("forward + device decode/topk", jax.jit(fwd_decode), params,
          x640, temb)

    def with_resize(p, u8, t):
        x = u8.astype(jnp.bfloat16) / 255.0
        x = jax.image.resize(x, (B, 640, 640, 3), "bilinear")
        return full(p, x, t)
    timed("resize(680->640) + forward", jax.jit(with_resize), params,
          u680, temb)

    def backbone_only(p, x):
        xx = Y._conv_bn_silu(x, p["stem0"], stride=2)
        xx = Y._conv_bn_silu(xx, p["stem1"], stride=2)
        xx = Y._run_c2f(xx, p["c2f_2"])
        xx = Y._conv_bn_silu(xx, p["down3"], stride=2)
        p3 = Y._run_c2f(xx, p["c2f_4"])
        xx = Y._conv_bn_silu(p3, p["down5"], stride=2)
        p4 = Y._run_c2f(xx, p["c2f_6"])
        xx = Y._conv_bn_silu(p4, p["down7"], stride=2)
        xx = Y._run_c2f(xx, p["c2f_8"])
        p5 = Y._run_sppf(xx, p["sppf"])
        return (jnp.sum(p3.astype(jnp.float32))
                + jnp.sum(p4.astype(jnp.float32))
                + jnp.sum(p5.astype(jnp.float32)))
    t_bb = timed("backbone only (stem..sppf)", jax.jit(backbone_only),
                 params, x640)
    print(f"\nneck+head = full - backbone ~= {t_full - t_bb:.1f} ms",
          flush=True)

    # raw conv rate probe, CHAINED so XLA cannot CSE the repeats (the
    # earlier same-weight x10 probe dedup'd to ONE conv and reported an
    # impossible 778 TFLOP/s on a 394-peak chip).  Honest result at the
    # C2f body shape: bf16 141.9 TFLOP/s vs int8 213.7 TOP/s (1.5x) --
    # the rate win EXISTS, but in the full model it only survives on the
    # neck/head (early high-res low-channel stages pay quantization
    # bandwidth with no MXU win, so scope="neck" is the default).
    ca = jax.random.normal(jax.random.PRNGKey(4), (B, 80, 80, 320),
                           jnp.bfloat16)
    cws = jax.random.normal(jax.random.PRNGKey(5), (10, 3, 3, 320, 320),
                            jnp.bfloat16) * 0.05
    ca8 = jnp.round(ca.astype(jnp.float32) * 8).astype(jnp.int8)
    cw8 = jnp.round(cws.astype(jnp.float32) * 160).astype(jnp.int8)

    def chain_bf16(x, ws):
        for i in range(10):
            x = (jax.lax.conv_general_dilated(
                x, ws[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16) * 0.1)
        return jnp.sum(x.astype(jnp.float32))

    def chain_int8(x, ws):
        for i in range(10):
            y = jax.lax.conv_general_dilated(
                x, ws[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            x = jnp.clip(y // 1024, -127, 127).astype(jnp.int8)
        return jnp.sum(x.astype(jnp.float32))

    flops = 2 * B * 80 * 80 * 9 * 320 * 320 * 10
    ms = timed("chained conv3x3 x10 [32,80,80,320] bf16",
               jax.jit(chain_bf16), ca, cws)
    print(f"  -> {flops / ms / 1e9:.1f} TFLOP/s", flush=True)
    ms = timed("chained conv3x3 x10 same shape int8->int32",
               jax.jit(chain_int8), ca8, cw8)
    print(f"  -> {flops / ms / 1e9:.1f} TOP/s", flush=True)


if __name__ == "__main__":
    main()
