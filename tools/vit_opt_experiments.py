"""Round-2 encoder-roofline experiments (one-off, real TPU).

Baseline r2: full ViT-L forward b32@224 = 40.6 ms (tools/vit_profile).
Matmul roofline ~25-27 ms (197 bf16 TFLOP/s v5e).  Candidates measured
INSIDE the full forward (isolated op timings mislead — CLAUDE.md):

  A  baseline forward_features
  B  conv patch embed (lax.conv, no explicit 6D transpose)
  C  einsum patch embed (XLA picks layouts)
  D  layer norm with bf16 elementwise (stats still f32)
  E  fused-QKV kernel with heads_per_block 4 / 8
  F  best combination
  G  preprocess path from 680^2 uint8 (what bench actually runs)
"""

import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    out = fn(*args)
    r0 = float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(outs[-1]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<46} compile {compile_s:5.1f}s  {ms:8.2f} ms/iter",
          flush=True)
    return ms, r0


def main():
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.ops import flash_attention as FA

    print("devices:", jax.devices(), flush=True)
    cfg = vit.DINOV2_VITL14_REG
    params = vit.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    B = 32
    img = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                            jnp.bfloat16)

    # ---- A: baseline ----------------------------------------------------
    def fwd_base(p, x):
        return jnp.sum(vit.forward_features(p, x, cfg)[
            "x_norm_patchtokens"].astype(jnp.float32))
    t_a, s_a = timed("A  baseline full forward", jax.jit(fwd_base),
                     params, img)

    # ---- patch-embed variants -------------------------------------------
    def conv_embed(p, x):
        w = p["patch_embed"]["w"].reshape(14, 14, 3, cfg.dim)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(14, 14), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = (y + p["patch_embed"]["b"].astype(jnp.float32)).astype(x.dtype)
        return y.reshape(x.shape[0], -1, cfg.dim)

    def einsum_embed(p, x):
        Bx, H, W, C = x.shape
        g = H // 14
        x6 = x.reshape(Bx, g, 14, g, 14, C)
        w = p["patch_embed"]["w"].reshape(14, 14, 3, cfg.dim)
        y = jnp.einsum("bhpwqc,pqcd->bhwd", x6, w,
                       preferred_element_type=jnp.float32)
        y = (y + p["patch_embed"]["b"].astype(jnp.float32)).astype(x.dtype)
        return y.reshape(Bx, g * g, cfg.dim)

    def fwd_with_embed(embed):
        def f(p, x):
            xx = embed(p, x)
            cls = jnp.broadcast_to(p["cls_token"],
                                   (B, 1, cfg.dim)).astype(xx.dtype)
            xx = jnp.concatenate([cls, xx], axis=1)
            xx = xx + p["pos_embed"].astype(xx.dtype)
            reg = jnp.broadcast_to(
                p["reg_token"], (B, cfg.num_registers, cfg.dim)
            ).astype(xx.dtype)
            xx = jnp.concatenate([xx[:, :1], reg, xx[:, 1:]], axis=1)
            for blk in p["blocks"]:
                xx = vit._block(xx, blk, cfg)
            xx = vit.layer_norm(xx, p["norm"], cfg.ln_eps)
            return jnp.sum(xx[:, 1 + cfg.num_registers:].astype(jnp.float32))
        return f

    timed("B  conv patch embed", jax.jit(fwd_with_embed(conv_embed)),
          params, img)
    timed("C  einsum patch embed", jax.jit(fwd_with_embed(einsum_embed)),
          params, img)

    # ---- D: bf16-elementwise LN ------------------------------------------
    def layer_norm_bf16(x, p, eps):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        scale = (p["scale"].astype(jnp.float32)
                 * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        shift = (p["bias"].astype(jnp.float32)
                 - mu[..., 0][..., None] * scale.astype(jnp.float32)
                 ).astype(x.dtype)
        return x * scale + shift

    def block_lnvar(x, blk, ln_fn):
        y = ln_fn(x, blk["ln1"], cfg.ln_eps)
        att = FA.attention_from_qkv(vit._linear(y, blk["qkv"]),
                                    heads=cfg.heads)
        att = vit._linear(att, blk["proj"]) * blk["ls1"].astype(x.dtype)
        x = x + att
        y = ln_fn(x, blk["ln2"], cfg.ln_eps)
        y = vit._linear(jax.nn.gelu(vit._linear(y, blk["fc1"]),
                                    approximate=True), blk["fc2"])
        return x + y * blk["ls2"].astype(x.dtype)

    def fwd_ln(p, x):
        xx = einsum_embed(p, x)
        cls = jnp.broadcast_to(p["cls_token"], (B, 1, cfg.dim)).astype(
            xx.dtype)
        xx = jnp.concatenate([cls, xx], axis=1) + p["pos_embed"].astype(
            xx.dtype)
        reg = jnp.broadcast_to(p["reg_token"],
                               (B, cfg.num_registers, cfg.dim)).astype(
            xx.dtype)
        xx = jnp.concatenate([xx[:, :1], reg, xx[:, 1:]], axis=1)
        for blk in p["blocks"]:
            xx = block_lnvar(xx, blk, layer_norm_bf16)
        xx = vit.layer_norm(xx, p["norm"], cfg.ln_eps)
        return jnp.sum(xx[:, 1 + cfg.num_registers:].astype(jnp.float32))
    timed("D  bf16-elementwise LN (+einsum embed)", jax.jit(fwd_ln),
          params, img)

    # ---- E: kernel heads_per_block -----------------------------------------
    def block_hp(x, blk, hp):
        y = vit.layer_norm(x, blk["ln1"], cfg.ln_eps)
        att = FA.short_attention_qkv(vit._linear(y, blk["qkv"]),
                                     heads=cfg.heads, heads_per_block=hp)
        att = vit._linear(att, blk["proj"]) * blk["ls1"].astype(x.dtype)
        x = x + att
        y = vit.layer_norm(x, blk["ln2"], cfg.ln_eps)
        y = vit._linear(jax.nn.gelu(vit._linear(y, blk["fc1"]),
                                    approximate=True), blk["fc2"])
        return x + y * blk["ls2"].astype(x.dtype)

    def fwd_hp(hp):
        def f(p, x):
            xx = vit._linear(vit.patchify(x, 14), p["patch_embed"])
            cls = jnp.broadcast_to(p["cls_token"], (B, 1, cfg.dim)).astype(
                xx.dtype)
            xx = jnp.concatenate([cls, xx], axis=1) + p["pos_embed"].astype(
                xx.dtype)
            reg = jnp.broadcast_to(
                p["reg_token"], (B, cfg.num_registers, cfg.dim)
            ).astype(xx.dtype)
            xx = jnp.concatenate([xx[:, :1], reg, xx[:, 1:]], axis=1)
            for blk in p["blocks"]:
                xx = block_hp(xx, blk, hp)
            xx = vit.layer_norm(xx, p["norm"], cfg.ln_eps)
            return jnp.sum(xx[:, 1 + cfg.num_registers:].astype(jnp.float32))
        return f

    timed("E4 kernel heads_per_block=4", jax.jit(fwd_hp(4)), params, img)
    timed("E8 kernel heads_per_block=8", jax.jit(fwd_hp(8)), params, img)

    # ---- G: the bench path (680 uint8 -> preprocess -> forward) ---------
    img680 = jax.random.randint(jax.random.PRNGKey(7), (B, 680, 680, 3),
                                0, 255, jnp.uint8)

    def fwd_680(p, u8):
        x = vit.preprocess(u8, out_hw=(224, 224)).astype(jnp.bfloat16)
        return fwd_base(p, x)
    timed("G  preprocess(680->224) + forward", jax.jit(fwd_680),
          params, img680)

    def preprocess_only(u8):
        return jnp.sum(vit.preprocess(u8, out_hw=(224, 224)))
    timed("G0 preprocess alone", jax.jit(preprocess_only), img680)

    print(f"\nbaseline sum check: {s_a:.1f}", flush=True)


if __name__ == "__main__":
    main()
