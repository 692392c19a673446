"""MMDiT component timing on real TPU: where does the CFG-step go?

SD3.5-medium b6 (cfg-batched) @512px: S_x=1024 latent + S_c context
tokens, dim 1536, 24 heads x hd 64, depth 24.  S_c defaults to the
REAL triple-encoder conditioning length 77 CLIP + 512 T5 = 589
(reference memory_2.py:263-270 passes max_sequence_length=512);
override with `python tools/mmdit_profile.py <ctx_len>` (154 = T5
dropped, 77 = the pre-r4 single-tower shape this file's history
references).
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
    from bsc_nav_tpu.models import mmdit as M
    from bsc_nav_tpu.ops import flash_attention as FA

    print("devices:", jax.devices(), flush=True)
    cfg = M.SD35_MEDIUM
    params = M.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    Sc = int(sys.argv[1]) if len(sys.argv) > 1 else 589
    B, Sx, D, h, hd = 6, 1024, cfg.dim, cfg.heads, cfg.head_dim
    S = Sx + Sc

    lat = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 16),
                            jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, Sc, cfg.context_dim),
                            jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.pooled_dim),
                             jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.bfloat16)

    def full(p, lat):
        return jnp.sum(M.forward(p, lat, t, ctx, pool, cfg
                                 ).astype(jnp.float32))
    t_full = timed("full forward (1 step, B=6)", jax.jit(full),
                   params, lat)

    qparams = M.quantize_params(params)
    timed("full forward int8 token matmuls (B=6)", jax.jit(full),
          qparams, lat)
    del qparams

    fused_params, layout = M.fuse_mods(params, cfg)

    def full_fused(p, lat):
        return jnp.sum(M.forward(p, lat, t, ctx, pool, cfg,
                                 mod_layout=layout).astype(jnp.float32))
    timed("full forward, fused adaLN mods (B=6)", jax.jit(full_fused),
          fused_params, lat)
    del fused_params

    q = jax.random.normal(jax.random.PRNGKey(4), (B, h, S, hd),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(5), (B, h, S, hd),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(6), (B, h, S, hd),
                          jnp.bfloat16)

    def att24(attfn, q, k, v):
        o = v
        for _ in range(24):
            o = attfn(q, k, o)
        return jnp.sum(o.astype(jnp.float32))

    timed(f"attention x24 dispatch (S={S})",
          jax.jit(lambda q, k, v: att24(FA.attention, q, k, v)), q, k, v)
    timed("attention x24 XLA einsum",
          jax.jit(lambda q, k, v: att24(FA.reference_attention, q, k, v)),
          q, k, v)

    x = jax.random.normal(jax.random.PRNGKey(7), (B, Sx, D), jnp.bfloat16)
    cx = jax.random.normal(jax.random.PRNGKey(8), (B, Sc, D), jnp.bfloat16)
    blk = params["blocks"][0]

    def matmul_stack(x, cx):
        for _ in range(24):
            for stream, xx in (("x", x), ("ctx", cx)):
                s = blk[stream]
                y = M._linear(xx, s["qkv"])[..., :D]
                y = M._linear(y, s["proj"])
                y = M._linear(jax.nn.gelu(M._linear(y, s["fc1"]),
                                          approximate=True), s["fc2"])
                if stream == "x":
                    x = x + y
                else:
                    cx = cx + y
        return jnp.sum(x.astype(jnp.float32)) + jnp.sum(
            cx.astype(jnp.float32))
    timed("matmul-only stack x24 (qkv+proj+mlp, both streams)",
          jax.jit(matmul_stack), x, cx)

    from bsc_nav_tpu.ops import quant as Q
    qblk = {st: {k: (Q.quantize_weight(v) if k in M.QUANT_KEYS else v)
                 for k, v in blk[st].items()} for st in ("x", "ctx")}

    def matmul_stack_q8(x, cx):
        for _ in range(24):
            for stream, xx in (("x", x), ("ctx", cx)):
                s = qblk[stream]
                y = Q.linear(xx, s["qkv"])[..., :D]
                y = Q.linear(y, s["proj"])
                y = Q.linear(jax.nn.gelu(Q.linear(y, s["fc1"]),
                                         approximate=True), s["fc2"])
                if stream == "x":
                    x = x + y
                else:
                    cx = cx + y
        return jnp.sum(x.astype(jnp.float32)) + jnp.sum(
            cx.astype(jnp.float32))
    timed("matmul-only stack x24, int8 W8A8",
          jax.jit(matmul_stack_q8), x, cx)

    # raw MXU rate check at the body shape: [B*Sx, D] x [D, 4D]
    a_bf = jax.random.normal(jax.random.PRNGKey(10), (B * Sx, D),
                             jnp.bfloat16)
    w_bf = jax.random.normal(jax.random.PRNGKey(11), (D, 4 * D),
                             jnp.bfloat16)
    a_i8 = jnp.round(a_bf.astype(jnp.float32) * 16).astype(jnp.int8)
    w_i8 = jnp.round(w_bf.astype(jnp.float32) * 16).astype(jnp.int8)

    def mm20(a, w, acc_t):
        tot = 0
        for i in range(20):
            y = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_t)
            tot = tot + y[0, i]
        return tot
    flops = 2 * a_bf.shape[0] * D * 4 * D * 20
    ms = timed("raw matmul x20 bf16 [6144,1536]x[1536,6144]",
               jax.jit(lambda a, w: mm20(a, w, jnp.float32)), a_bf, w_bf)
    print(f"  -> {flops / ms / 1e9:.1f} TFLOP/s")
    ms = timed("raw matmul x20 int8->int32 same shape",
               jax.jit(lambda a, w: mm20(a, w, jnp.int32)), a_i8, w_i8)
    print(f"  -> {flops / ms / 1e9:.1f} TOP/s")

    def qkv_transposes(x, cx):
        for _ in range(24):
            qx, kx, vx = M._stream_qkv(x, blk["x"], cfg)
            qc, kc, vc = M._stream_qkv(cx, blk["ctx"], cfg)
            qq = jnp.concatenate([qc, qx], axis=2)
            x = x + qq.transpose(0, 2, 1, 3).reshape(B, S, D)[:, Sc:]
        return jnp.sum(x.astype(jnp.float32))
    timed("qkv+qknorm+transpose+concat x24",
          jax.jit(qkv_transposes), x, cx)

    def norms_only(x):
        for _ in range(24 * 2):
            x = M._pre_norm(x, cfg.ln_eps)
        return jnp.sum(x.astype(jnp.float32))
    timed("pre_norm x48 (latent stream)", jax.jit(norms_only), x)

    c_emb = jax.random.normal(jax.random.PRNGKey(9), (B, D), jnp.bfloat16)

    def mods_only(c):
        tot = 0.0
        for _ in range(24):
            mx = M._linear(jax.nn.silu(c), blk["x"]["mod"])
            mc = M._linear(jax.nn.silu(c), blk["ctx"]["mod"])
            tot = tot + jnp.sum(mx.astype(jnp.float32)) + jnp.sum(
                mc.astype(jnp.float32))
        return tot
    timed("adaLN modulation x24", jax.jit(mods_only), c_emb)

    print(f"\nfull step (cond+uncond fused) should be ~= full forward; "
          f"full fwd={t_full:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
