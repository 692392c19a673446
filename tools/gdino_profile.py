"""Grounding DINO stage breakdown on the real TPU.

Splits the forward into separately-jitted stages (backbone+proj, BERT,
encoder, two-stage select + decoder) to locate the time at 800^2 with
21 classes, plus the full fused forward and a query-pruned variant
(cfg.num_queries is the faithful two-stage top-k width; the reference
demo role, gdino.py:44-68, doesn't need 900 candidate boxes).

  python tools/gdino_profile.py            # full profile
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    t0 = time.perf_counter()
    first = sync(out[0] if isinstance(out, (tuple, list)) else
                 next(iter(out.values())) if isinstance(out, dict) else out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(out[0] if isinstance(out, (tuple, list)) else
             next(iter(out.values())) if isinstance(out, dict) else out)
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

    # ---- stages (reduce in-jit: returning a feature map would time a
    # multi-MB tunnel transfer, not the stage) ---------------------------
    bb = jax.jit(lambda p, x: jnp.sum(G.swin_backbone(
        p["backbone"], x, cfg.swin)[0][0].astype(jnp.float32)))
    timeit("swin-t backbone", bb, params, img)

    bert = jax.jit(lambda p: jnp.sum(G.bert_encode(
        p["text"], args[0], args[1], args[3], args[2],
        cfg.text).astype(jnp.float32)))
    timeit("bert text tower", bert, params)

    full = jax.jit(lambda p, x: jnp.sum(G.forward(
        p, x, *args, cfg)["pred_boxes"].astype(jnp.float32)))
    t_full = timeit("FULL forward (nq=900)", full, params, img)

    pruned = dataclasses.replace(cfg, num_queries=300)
    fp = jax.jit(lambda p, x: jnp.sum(G.forward(
        p, x, *args, pruned)["pred_boxes"].astype(jnp.float32)))
    t300 = timeit("FULL forward (nq=300)", fp, params, img)

    print(f"decoder-query pruning 900->300 saves {t_full - t300:.1f} ms")


if __name__ == "__main__":
    main()
