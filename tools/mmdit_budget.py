"""MMDiT step-time budget on the real TPU (VERDICT r4 item 4 closure).

Attributes the SD3.5-medium CFG step at the PRODUCTION text-query shape
(B=6 cond+uncond batched, Sx=1024 latent tokens @512px, Sc=589 context
= 77 CLIP + 512 T5, reference memory_2.py:263-270) using the
cumulative-prefix method (isolated stage programs lie on this TPU --
CLAUDE.md; same method as tools/vae_profile.py / gdino_profile.py):
prefix(k) runs the REAL forward over blocks[:k], so per-block cost is a
consecutive-prefix diff of the same program.  Blocks 0-12 are MMDiT-X
dual-attention blocks, 13-23 single -- the k=13 split separates them.

Component A/Bs swap ONE implementation inside the full program:
  - attention: fused joint-qkv Pallas kernel (production) vs composed
    reference (XLA einsum softmax) -- the kernel's in-context win;
  - ctx length 589 vs 77 (T5 dropped) -- what the longer joint
    sequence costs;
  - no-dual: qkv2/proj2 stripped (structural; measures the 13 extra
    self-attentions including their matmuls);
  - int8 W8A8 token matmuls (bench default) vs bf16.

The matmul floor comes from XLA cost analysis of the full program.

  python tools/mmdit_budget.py          # full budget (TPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, SX, SC_FULL, SC_NOT5 = 6, 1024, 77 + 512, 77


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    t0 = time.perf_counter()
    first = float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    del first
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(np.asarray(outs[-1]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<52} {ms:8.2f} ms   (tail compile {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from bsc_nav_tpu.models import mmdit as M
    from bsc_nav_tpu.ops import flash_attention as FA
    from bsc_nav_tpu.utils.compile_cache import jit_init

    print("devices:", jax.devices(), flush=True)
    cfg = M.SD35_MEDIUM
    params = jit_init(lambda k: M.init_params(cfg, k, dtype=jnp.bfloat16),
                      jax.random.PRNGKey(0))
    qparams = jit_init(lambda k: M.quantize_params(
        M.init_params(cfg, k, dtype=jnp.bfloat16)), jax.random.PRNGKey(0))

    lat = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 16),
                            jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.pooled_dim),
                             jnp.bfloat16)

    def ctx_of(sc):
        return jax.random.normal(jax.random.PRNGKey(2),
                                 (B, sc, cfg.context_dim), jnp.bfloat16)

    ctx = ctx_of(SC_FULL)

    def fwd(p, lat, ctx):
        return jnp.sum(M.forward(p, lat, t, ctx, pool, cfg
                                 ).astype(jnp.float32))

    # ---- baselines: production int8 + bf16, both at S=1613 -------------
    t_i8 = timeit(f"FULL fwd b{B} S={SX + SC_FULL} int8 (bench default)",
                  jax.jit(fwd), qparams, lat, ctx)
    t_bf = timeit(f"FULL fwd b{B} S={SX + SC_FULL} bf16",
                  jax.jit(fwd), params, lat, ctx)

    # matmul floor from XLA's own FLOP count
    low = jax.jit(fwd).lower(params, lat, ctx)
    flops = low.compile().cost_analysis()["flops"]
    peak_bf16, peak_int8 = 197e12, 394e12
    print(f"XLA-counted FLOPs: {flops / 1e12:.2f} T -> bf16 floor "
          f"{flops / peak_bf16 * 1e3:.1f} ms ({flops / peak_bf16 / t_bf * 1e5:.0f}% "
          f"of measured); int8-peak floor {flops / peak_int8 * 1e3:.1f} ms",
          flush=True)

    # ---- cumulative prefixes (int8, production path) --------------------
    def prefix(p, k):
        return {**p, "blocks": p["blocks"][:k]}

    t_k = {}
    for k in (0, 6, 13, 18, 24):
        pk = prefix(qparams, k)
        t_k[k] = timeit(f"prefix: embeds + {k} blocks + final (int8)",
                        jax.jit(fwd), pk, lat, ctx)
        del pk
    dual_ms = (t_k[13] - t_k[0]) / 13
    single_ms = (t_k[24] - t_k[13]) / 11
    print(f"per-block: dual (0-12) {dual_ms:.2f} ms, single (13-23) "
          f"{single_ms:.2f} ms, embeds+final {t_k[0]:.2f} ms; "
          f"linearity check 6 blocks {(t_k[6] - t_k[0]) / 6:.2f} ms/blk",
          flush=True)

    # ---- attention A/Bs inside the FULL program -------------------------
    saved = (M.use_joint_qkv_attention, M.attention, M.self_qkv_dispatch)
    try:
        # composed path but attention() still dispatches blockwise flash
        M.use_joint_qkv_attention = lambda *a: False
        M.self_qkv_dispatch = (
            lambda qkv, heads, qg, kg, eps=1e-6: FA.joint_qkv_reference(
                qkv, qkv[:, :0], heads, qg, kg, qg, kg, eps=eps))
        t_flash = timeit("FULL fwd int8, composed qkv + flash attention",
                         jax.jit(fwd), qparams, lat, ctx)
        M.attention = FA.reference_attention
        t_xla = timeit("FULL fwd int8, composed qkv + XLA einsum attn",
                       jax.jit(fwd), qparams, lat, ctx)
    finally:
        (M.use_joint_qkv_attention, M.attention,
         M.self_qkv_dispatch) = saved
    print(f"joint-qkv kernel saves {t_flash - t_i8:.1f} ms vs composed+"
          f"flash, {t_xla - t_i8:.1f} ms vs composed+XLA", flush=True)

    # ---- ctx length: what the T5-512 tokens cost -------------------------
    t_not5 = timeit(f"FULL fwd b{B} S={SX + SC_NOT5} int8 (T5 dropped)",
                    jax.jit(fwd), qparams, lat, ctx_of(SC_NOT5))
    print(f"T5-512 conditioning costs {t_i8 - t_not5:.1f} ms/step "
          f"(+{(t_i8 - t_not5) / t_not5 * 100:.0f}%)", flush=True)

    # ---- dual attention: strip qkv2 (structural) -------------------------
    nodual = {**qparams, "blocks": [
        {"x": {k: v for k, v in blk["x"].items()
               if k not in ("qkv2", "proj2", "q_norm2", "k_norm2")},
         "ctx": blk["ctx"]} for blk in qparams["blocks"]]}
    t_nd = timeit("FULL fwd int8, dual attention stripped",
                  jax.jit(fwd), nodual, lat, ctx)
    del nodual
    print(f"MMDiT-X dual attention (13 blocks) costs {t_i8 - t_nd:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
