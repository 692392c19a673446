"""Sweep the joint-qkv attention q-tile (bq) at the REAL SD3.5
conditioning sequence lengths, inside the full MMDiT forward.

Shapes (SD3.5-medium @512px, CFG-batched B=6):
  - S = 1024 latent + 77+512 ctx = 1613   (T5-512 conditioning, the
    reference's max_sequence_length=512 path, memory_2.py:263-270)
  - S = 1024 + 77+77 = 1178               (T5 dropped: diffusers
    zero-block of tokenizer_max_length)

Per CLAUDE.md, only the in-context number is the truth: each candidate
bq is timed as the FULL 24-block forward (int8 token matmuls, the
serving config), not the isolated attention op.

Usage: python tools/joint_attn_sweep.py [ctx_len ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import mmdit as M
    from bsc_nav_tpu.ops import flash_attention as FA

    print("devices:", jax.devices(), flush=True)
    cfg = M.SD35_MEDIUM
    from bsc_nav_tpu.utils.compile_cache import jit_init
    params = jit_init(
        lambda k: M.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0), M.quantize_params)

    B = 6
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 16),
                            jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.pooled_dim),
                             jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.bfloat16)

    ctx_lens = [int(a) for a in sys.argv[1:]] or [589, 154]

    results = {}
    for Sc in ctx_lens:
        S = 1024 + Sc
        ctx = jax.random.normal(jax.random.PRNGKey(2),
                                (B, Sc, cfg.context_dim), jnp.bfloat16)
        cands = sorted({FA.joint_bq_auto(S)} | {
            bq for bq in range(128, 1025, 16)
            if (-(-S // bq) * bq) % 128 == 0
            and bq in (128, 208, 256, 320, 384, 416, 512, 576, 640,
                       704, 832, 1024)})
        print(f"\n-- S={S} (ctx {Sc}); candidates {cands}", flush=True)
        for bq in cands:
            Sp = -(-S // bq) * bq
            # scoped to THIS joint S; the dual-attention path (S=1024)
            # falls through to its own auto tile
            FA._SWEEP_BQ = lambda s, b=bq, tgt=S: b if s == tgt else None

            def full(p, lat, ctx):
                return jnp.sum(M.forward(p, lat, t, ctx, pool, cfg
                                         ).astype(jnp.float32))
            f = jax.jit(full)
            try:
                t0 = time.perf_counter()
                out = float(np.asarray(f(params, lat, ctx)))
                comp = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(5):
                    out = f(params, lat, ctx)
                out = float(np.asarray(out))
                ms = (time.perf_counter() - t0) / 5 * 1000
                print(f"bq={bq:4d} Sp={Sp:4d} ({Sp-S:3d} pad): "
                      f"{ms:7.2f} ms/fwd  (compile {comp:.0f}s)",
                      flush=True)
                results[(S, bq)] = ms
            except Exception as e:
                print(f"bq={bq:4d} Sp={Sp:4d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            finally:
                FA._SWEEP_BQ = None

    print("\nbest per S:")
    for S in sorted({k[0] for k in results}):
        rows = sorted((v, k[1]) for k, v in results.items() if k[0] == S)
        print(f"  S={S}: " + ", ".join(
            f"bq{bq}={ms:.1f}ms" for ms, bq in rows))


if __name__ == "__main__":
    main()
