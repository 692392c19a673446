"""Component-level ViT-L timing on real TPU: where do the 66ms/b32 go?

Times (a) full encoder, (b) attention-only stack, (c) MLP-only stack,
(d) layernorm-only stack, (e) attention at S=261 via the short kernel vs
plain XLA einsum, (f) S padded to 384.  One-off experiment tool.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(outs[-1]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<40} compile {compile_s:5.1f}s   {ms:8.2f} ms/iter",
          flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.ops import flash_attention as FA

    print("devices:", jax.devices(), flush=True)
    cfg = vit.DINOV2_VITL14_REG
    params = vit.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    B, S, D, h, hd = 32, 261, 1024, 16, 64
    img = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                            jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, h, S, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, h, S, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, h, S, hd), jnp.bfloat16)

    full = jax.jit(lambda p, x: jnp.sum(vit.forward_features(
        p, x, cfg)["x_norm_patchtokens"].astype(jnp.float32)))
    t_full = timed("full forward b32@224", full, params, img)
    qparams = vit.quantize_params(params)
    timed("full forward b32@224 int8 W8A8 matmuls", full, qparams, img)
    del qparams

    blk = params["blocks"][0]

    def attn_stack(x):
        for _ in range(cfg.depth):
            y = vit.layer_norm(x, blk["ln1"], cfg.ln_eps)
            qkv = vit._linear(y, blk["qkv"]).reshape(B, S, 3, h, hd)
            qq, kk, vv = (qkv[:, :, i].transpose(0, 2, 1, 3)
                          for i in range(3))
            att = FA.attention(qq, kk, vv).transpose(0, 2, 1, 3)
            x = x + vit._linear(att.reshape(B, S, D), blk["proj"])
        return jnp.sum(x.astype(jnp.float32))
    timed("attn stack x24 (ln+qkv+att+proj)", jax.jit(attn_stack), x)

    def mlp_stack(x):
        for _ in range(cfg.depth):
            y = vit.layer_norm(x, blk["ln2"], cfg.ln_eps)
            y = vit._linear(jax.nn.gelu(vit._linear(y, blk["fc1"]),
                                        approximate=False), blk["fc2"])
            x = x + y
        return jnp.sum(x.astype(jnp.float32))
    timed("mlp stack x24 (ln+fc1+gelu+fc2)", jax.jit(mlp_stack), x)

    def ln_stack(x):
        for _ in range(cfg.depth * 2):
            x = vit.layer_norm(x, blk["ln1"], cfg.ln_eps)
        return jnp.sum(x.astype(jnp.float32))
    timed("layernorm x48 alone", jax.jit(ln_stack), x)

    pre = jax.jit(lambda im: jnp.sum(
        vit.patchify(im, 14).astype(jnp.float32)))
    timed("patchify alone", pre, img)

    def att24(q, k, v):
        o = v
        for _ in range(24):
            o = FA.attention(q, k, o)
        return jnp.sum(o.astype(jnp.float32))
    timed("attention op x24 (dispatch)", jax.jit(att24), q, k, v)

    def att24_xla(q, k, v):
        o = v
        for _ in range(24):
            o = FA.reference_attention(q, k, o)
        return jnp.sum(o.astype(jnp.float32))
    timed("attention op x24 (XLA einsum)", jax.jit(att24_xla), q, k, v)

    def att24_short(q, k, v):
        o = v
        for _ in range(24):
            o = FA.short_attention(q, k, o)
        return jnp.sum(o.astype(jnp.float32))
    timed("attention op x24 (short kernel)", jax.jit(att24_short), q, k, v)

    # padded S: does 261 -> 384 help the matmuls?
    x384 = jnp.pad(x, ((0, 0), (0, 123), (0, 0)))

    # mlp_stack is shape-generic; reuse it on the padded input
    timed("mlp stack x24 @ S=384 (padded)", jax.jit(mlp_stack), x384)

    print(f"\nfull={t_full:.1f}ms", flush=True)


def main2():
    """Variant experiments: transpose-free BSHD attention inside the block."""
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import vit

    cfg = vit.DINOV2_VITL14_REG
    params = vit.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    B, S, D, h, hd = 32, 261, 1024, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D), jnp.bfloat16)
    blk = params["blocks"][0]
    scale = hd ** -0.5

    def attn_stack_bshd(x):
        for _ in range(cfg.depth):
            y = vit.layer_norm(x, blk["ln1"], cfg.ln_eps)
            qkv = vit._linear(y, blk["qkv"]).reshape(B, S, 3, h, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,S,h,hd]
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            att = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                             preferred_element_type=jnp.float32)
            att = att.astype(x.dtype).reshape(B, S, D)
            x = x + vit._linear(att, blk["proj"])
        return jnp.sum(x.astype(jnp.float32))
    timed("attn stack BSHD einsum (no transpose)", jax.jit(attn_stack_bshd), x)

    from bsc_nav_tpu.ops import flash_attention as FA
    def attn_stack_xla(x):
        for _ in range(cfg.depth):
            y = vit.layer_norm(x, blk["ln1"], cfg.ln_eps)
            qkv = vit._linear(y, blk["qkv"]).reshape(B, S, 3, h, hd)
            qq, kk, vv = (qkv[:, :, i].transpose(0, 2, 1, 3)
                          for i in range(3))
            att = FA.reference_attention(qq, kk, vv).transpose(0, 2, 1, 3)
            x = x + vit._linear(att.reshape(B, S, D), blk["proj"])
        return jnp.sum(x.astype(jnp.float32))
    timed("attn stack XLA ref (with transpose)", jax.jit(attn_stack_xla), x)


if __name__ == "__main__":
    import sys as _s
    # ONE entry block: --variants runs only the variant experiments
    # (the baseline suite costs minutes of compiles on the single-
    # process tunneled TPU)
    if "--variants" in _s.argv:
        main2()
    else:
        main()
