"""Grounding DINO budget on the real TPU (VERDICT r4 item 5 closure).

Cumulative-prefix attribution (isolated stage timings lie on this TPU,
CLAUDE.md): the full forward is timed alongside prefixes that stop
after the fusion encoder / after two-stage selection, so stage costs
are consecutive-prefix DIFFS of the same real program.  All timings
dispatch `iters` back-to-back and sync ONCE (per-iter sync would add
the ~25 ms tunnel RTT to every row).  Also: decoder-query pruning A/B
(cfg.num_queries; the reference demo role, gdino.py:44-68, doesn't
need 900 candidate boxes) and a batch amortization A/B (the framework
serves GDINO as a pluggable detector, models/detector.py, so b>1 is a
real serving shape even though the reference only runs b1).

  python tools/gdino_profile.py            # full profile
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leaf(out):
    if isinstance(out, (tuple, list)):
        return _leaf(out[0])
    if isinstance(out, dict):
        return _leaf(next(iter(out.values())))
    return out


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    t0 = time.perf_counter()
    first = float(np.asarray(_leaf(out)).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(np.asarray(_leaf(outs[-1])).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<38} {ms:8.1f} ms   (tail compile {compile_s:.1f}s)")
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from bsc_nav_tpu.models import grounding_dino as G

    cfg = G.GROUNDING_DINO_TINY
    params = G.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 800, 800, 3),
                             jnp.bfloat16)
    ids = np.array([[101] + sum(([7 + i, 1012] for i in range(21)), [])
                    + [102]], np.int32)
    attn3d, pos_ids = G.generate_text_masks(ids)
    args = (jnp.asarray(ids), jnp.zeros_like(jnp.asarray(ids)),
            jnp.asarray(attn3d), jnp.asarray(pos_ids.astype(np.int32)),
            jnp.ones(ids.shape, bool))

    # ---- component towers (context-free floor for the prefix diffs) ----
    bb = jax.jit(lambda p, x: jnp.sum(G.swin_backbone(
        p["backbone"], x, cfg.swin)[0][0].astype(jnp.float32)))
    t_bb = timeit("swin-t backbone", bb, params, img)

    bert = jax.jit(lambda p: jnp.sum(G.bert_encode(
        p["text"], args[0], args[1], args[3], args[2],
        cfg.text).astype(jnp.float32)))
    t_bert = timeit("bert text tower", bert, params)

    # ---- cumulative prefixes of the REAL program ------------------------
    enc = jax.jit(lambda p, x: jnp.sum(G.forward(
        p, x, *args, cfg, stage="encoder")["v_feat"].astype(jnp.float32)))
    t_enc = timeit("prefix: towers+6 fusion-enc layers", enc, params, img)

    sel = jax.jit(lambda p, x: jnp.sum(G.forward(
        p, x, *args, cfg, stage="select")["pred_boxes"].astype(jnp.float32)))
    t_sel = timeit("prefix: + two-stage select", sel, params, img)

    full = jax.jit(lambda p, x: jnp.sum(G.forward(
        p, x, *args, cfg)["pred_boxes"].astype(jnp.float32)))
    t_full = timeit("FULL forward (nq=900)", full, params, img)

    print(f"budget b1: encoder-prefix {t_enc:.1f} "
          f"(towers {t_bb + t_bert:.1f} isolated) | "
          f"two-stage select +{t_sel - t_enc:.1f} | "
          f"decoder+heads +{t_full - t_sel:.1f}")

    pruned = dataclasses.replace(cfg, num_queries=300)
    fp = jax.jit(lambda p, x: jnp.sum(G.forward(
        p, x, *args, pruned)["pred_boxes"].astype(jnp.float32)))
    t300 = timeit("FULL forward (nq=300)", fp, params, img)
    print(f"decoder-query pruning 900->300 saves {t_full - t300:.1f} ms")

    # ---- batch amortization A/B (VERDICT r4 item 5) ---------------------
    for B in (4, 8):
        imgB = jax.random.uniform(jax.random.PRNGKey(2), (B, 800, 800, 3),
                                  jnp.bfloat16)
        argsB = tuple(jnp.repeat(a, B, axis=0) if a.ndim and a.shape[0] == 1
                      else a for a in args)
        fB = jax.jit(lambda p, x: jnp.sum(G.forward(
            p, x, *argsB, cfg)["pred_boxes"].astype(jnp.float32)))
        tB = timeit(f"FULL forward b{B} (nq=900)", fB, params, imgB)
        print(f"  -> {tB / B:.1f} ms/frame (b1 was {t_full:.1f})")


if __name__ == "__main__":
    main()
