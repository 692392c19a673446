"""Full-scale serving smoke on real TPU hardware.

Compiles and times single forwards of the big frozen models at their
production shapes (random weights -- identical FLOPs/memory to real
checkpoints):

  - DINOv2 ViT-L/14-reg @ 224, batch 32 (the memory-build encoder)
  - SD3.5-medium MMDiT: one denoising step @ 512px latents (the
    text->image imagination transformer, joint seq ~1100 tokens)
  - YOLOv8x-World detector @ 640px (long-term memory feeder)
  - CLIP ViT-H/14 image tower @ 224 (check_around scorer)

  python tools/tpu_smoke.py            # prints one timing line per model

Last recorded run (TPU v5e-1):  see tools/tpu_smoke.last.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# nominal single-chip peaks (TPU v5e): the MFU denominator.  The raw
# MXU probe through this tunnel over-reads (CLAUDE.md notes 403/457
# "measured" vs the 197/394 datasheet peaks -- timing artifacts), so
# rows report %-of-DATASHEET-peak, the conservative figure.
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def _analytic_flops(fn, *args):
    """Per-call FLOPs from XLA's compiled cost analysis (counts every
    dot/conv multiply-add as 2; int8 MXU ops counted the same)."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:                     # noqa: BLE001 (backend-optional)
        return None


def timed(name, fn, *args, iters=5, peak=PEAK_BF16):
    import jax
    t0 = time.perf_counter()
    out = fn(*args)
    first = float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(np.asarray(outs[-1]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    row = {"name": name, "compile_s": round(compile_s, 1),
           "ms_per_iter": round(ms, 1)}
    flops = _analytic_flops(fn, *args)
    mfu = ""
    if flops:
        tput = flops / (ms / 1e3)
        row["tflops_per_s"] = round(tput / 1e12, 1)
        row["mfu_pct"] = round(tput / peak * 100, 1)
        mfu = (f"   {row['tflops_per_s']:6.1f} TFLOP/s"
               f"  MFU {row['mfu_pct']:5.1f}%")
    print(f"{name:<34} compile {compile_s:6.1f}s   {ms:8.1f} ms/iter{mfu}")
    return row


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache (same dir as bench.py): unchanged rows
    # reload in seconds instead of recompiling cold (ViT-L ~267 s)
    from bsc_nav_tpu.utils.compile_cache import (
        enable_persistent_cache, jit_init)
    enable_persistent_cache()

    results = {"devices": str(jax.devices())}
    rows = []

    # --- DINOv2 ViT-L encoder -------------------------------------------
    from bsc_nav_tpu.models import vit
    vcfg = vit.DINOV2_VITL14_REG
    vparams = jit_init(lambda k: vit.init_params(
        vcfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (32, 224, 224, 3),
                            jnp.bfloat16)
    fwd = jax.jit(lambda p, x: jnp.sum(vit.forward_features(
        p, x, vcfg)["x_norm_patchtokens"].astype(jnp.float32)))
    rows.append(timed("dinov2_vitl14_reg b32@224", fwd, vparams, img))
    # int8 W8A8 serving row (ops/quant.py; bench's default encoder)
    rows.append(timed("dinov2_vitl14_reg b32 int8 W8A8", fwd,
                      jax.jit(vit.quantize_params)(vparams), img,
                      peak=PEAK_INT8))

    # --- CLIP ViT-H image tower -----------------------------------------
    from bsc_nav_tpu.models import clip as C
    ccfg = C.METACLIP_VITH14
    cparams = jit_init(lambda k: C.init_params(
        ccfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(2))
    cimg = jax.random.normal(jax.random.PRNGKey(3), (12, 224, 224, 3),
                             jnp.bfloat16)
    cfwd = jax.jit(lambda p, x: jnp.sum(
        C.encode_image(p, x, ccfg).astype(jnp.float32)))
    rows.append(timed("metaclip_vith14 image b12@224", cfwd, cparams, cimg))
    # int8 W8A8 A/B for the CLIP matcher (config.clip_int8; ADVICE r3:
    # record the on-TPU in-context number before enabling by default)
    rows.append(timed("metaclip_vith14 image b12 int8 W8A8", cfwd,
                      jax.jit(C.quantize_params)(cparams), cimg,
                      peak=PEAK_INT8))

    # --- SD3.5-medium MMDiT single step ----------------------------------
    from bsc_nav_tpu.models import mmdit as M
    mcfg = M.SD35_MEDIUM
    mparams = jit_init(lambda k: M.init_params(
        mcfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(4))
    lat = jax.random.normal(jax.random.PRNGKey(5),
                            (3, mcfg.input_size, mcfg.input_size,
                             mcfg.in_channels), jnp.bfloat16)
    # ctx 77 CLIP + 512 T5: the reference's imaginary() passes
    # max_sequence_length=512 (memory_2.py:263-270), so the serving
    # joint sequence is 1024 latent + 589 ctx = 1613 tokens
    ctx = jax.random.normal(jax.random.PRNGKey(6),
                            (3, 77 + 512, mcfg.context_dim),
                            jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(7), (3, mcfg.pooled_dim),
                               jnp.bfloat16)
    mfwd = jax.jit(lambda p, l, c, po: jnp.sum(M.forward(
        p, l, jnp.full((3,), 0.5), c, po, mcfg).astype(jnp.float32)))
    rows.append(timed("sd3.5-medium mmdit b3@512px T5-512 ctx", mfwd,
                      mparams, lat, ctx, pooled, iters=3))
    # int8 W8A8 serving row (ops/quant.py; bench's default text-query
    # path via DiffusionImagination(quantize=True))
    rows.append(timed("sd3.5-medium mmdit b3 T5-512 int8 W8A8", mfwd,
                      jax.jit(M.quantize_params)(mparams), lat, ctx,
                      pooled, iters=3, peak=PEAK_INT8))
    del mparams

    # --- T5-XXL encoder (SD3.5 conditioning, int8 serving) ---------------
    from bsc_nav_tpu.models import t5 as T5
    t5params = jit_init(lambda k: T5.init_params_q8(
        T5.T5_XXL, k, dtype=jnp.bfloat16), jax.random.PRNGKey(20))
    t5ids = jax.random.randint(jax.random.PRNGKey(21), (1, 512), 2,
                               32000, jnp.int32)
    t5fwd = jax.jit(lambda p, i: jnp.sum(T5.encode(
        p, i, T5.T5_XXL).astype(jnp.float32)))
    rows.append(timed("t5-xxl encode b1 S=512 int8 W8A8", t5fwd,
                      t5params, t5ids, iters=3, peak=PEAK_INT8))
    del t5params

    # --- SD3 VAE decode (text-query imagination shape) ---------------------
    from bsc_nav_tpu.models import vae as V
    vcfg = V.SD3_VAE
    vparams = jit_init(lambda k: V.init_params(
        vcfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(11))
    vlat = jax.random.normal(jax.random.PRNGKey(12),
                             (3, 64, 64, vcfg.latent_channels), jnp.bfloat16)
    vdec = jax.jit(lambda p, z: jnp.sum(
        V.decode(p, z, vcfg).astype(jnp.float32)))
    rows.append(timed("sd3-vae decode 3x512^2", vdec, vparams, vlat,
                      iters=3))
    del vparams

    # --- YOLOv8x-World @640 ----------------------------------------------
    from bsc_nav_tpu.models import yolo_world as Y
    ycfg = Y.YOLOV8X_WORLDV2
    yparams = jit_init(lambda k: Y.init_params(
        ycfg, k, dtype=jnp.bfloat16, text_dim=512),
        jax.random.PRNGKey(8))
    yimg = jax.random.uniform(jax.random.PRNGKey(9), (4, 640, 640, 3),
                              jnp.bfloat16)
    ytxt = jax.random.normal(jax.random.PRNGKey(10), (21, 512), jnp.bfloat16)
    yfwd = jax.jit(lambda p, x, t: jnp.sum(Y.forward(
        p, x, t, ycfg)[0][0].astype(jnp.float32)))
    rows.append(timed("yolov8x-world b4@640", yfwd, yparams, yimg, ytxt))

    # --- Grounding DINO tiny @800 (full arch: Swin-T + BERT + deform) ----
    import numpy as np
    from bsc_nav_tpu.models import grounding_dino as G
    gcfg = G.GROUNDING_DINO_TINY
    gparams = jit_init(lambda k: G.init_params(
        gcfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(11))
    gimg = jax.random.uniform(jax.random.PRNGKey(12), (1, 800, 800, 3),
                              jnp.bfloat16)
    ids = np.array([[101] + sum(([7 + i, 1012] for i in range(21)), [])
                    + [102]], np.int32)
    attn3d, pos_ids = G.generate_text_masks(ids)
    gfwd = jax.jit(lambda p, x: jnp.sum(G.forward(
        p, x, jnp.asarray(ids), jnp.zeros_like(jnp.asarray(ids)),
        jnp.asarray(attn3d), jnp.asarray(pos_ids.astype(np.int32)),
        jnp.ones(ids.shape, bool), gcfg)["pred_boxes"].astype(
            jnp.float32)))
    rows.append(timed("grounding-dino-tiny b1@800 (21 classes)", gfwd,
                      gparams, gimg, iters=3))

    # Qwen-3B bf16 (7.6 GB) + its int8 copy must coexist during
    # quantize_params; free every other model first (16 GB chip)
    del cparams, yparams, gparams

    # --- Qwen2.5-VL 3B (local judge: vision tower + text forward) --------
    from bsc_nav_tpu.models import qwen_vl as Q
    qcfg = Q.QWEN25_VL_3B
    qparams = jit_init(lambda k: Q.init_params(
        qcfg, k, dtype=jnp.bfloat16), jax.random.PRNGKey(13))
    # one 448x448 image -> 32x32 patch grid (HF pixel_values layout)
    grid = (1, 32, 32)
    vpatches = jax.random.normal(
        jax.random.PRNGKey(14),
        (grid[1] * grid[2],
         qcfg.vision.in_ch * qcfg.vision.temporal_patch
         * qcfg.vision.patch ** 2), jnp.bfloat16)
    qv = jax.jit(lambda p, x: jnp.sum(Q.vision_forward(
        p["vision"], x, (grid,), qcfg.vision).astype(jnp.float32)))
    rows.append(timed("qwen2.5-vl-3b vision tower 448px", qv, qparams,
                      vpatches, iters=3))
    S = 512
    emb = jax.random.normal(jax.random.PRNGKey(15),
                            (1, S, qcfg.text.hidden), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, 1, S))
    qt = jax.jit(lambda p, e: jnp.sum(Q.text_forward(
        p, e, pos, qcfg.text).astype(jnp.float32)))
    rows.append(timed("qwen2.5-vl-3b text fwd S=512", qt, qparams, emb,
                      iters=3))

    # --- Qwen greedy DECODE path (the judge's serving loop): prefill
    # S=512 + 64-token KV-cache while_loop, bf16 vs int8 W8A8 (the A/B
    # behind config.llm_int8; decode is weight-bandwidth-bound so int8's
    # halved HBM traffic is the expected win) -------------------------------
    gen = Q.make_greedy_generator(qcfg.text, max_len=S, max_new=64,
                                  eos_id=-1)   # -1: always decode 64
    gemb = jax.random.normal(jax.random.PRNGKey(16),
                             (1, S, qcfg.text.hidden), jnp.bfloat16)
    gpos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, 1, S))
    gfn = lambda p, e: gen(p, e, jnp.asarray(S, jnp.int32), gpos,
                           jnp.asarray(S, jnp.int32))[0]
    rows.append(timed("qwen2.5-vl-3b decode 512+64tok", gfn, qparams,
                      gemb, iters=3))
    qparams_i8 = jax.jit(Q.quantize_params)(qparams)
    del qparams
    rows.append(timed("qwen2.5-vl-3b decode 512+64tok int8", gfn,
                      qparams_i8, gemb, iters=3, peak=PEAK_INT8))
    del qparams_i8

    results["models"] = rows
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "tpu_smoke.last.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")

    # regression gate vs the latest committed per-round snapshot
    # (docs/tpu_smoke_r*.json; tools/smoke_compare.py flags >10% drift)
    import glob
    snaps = sorted(glob.glob(os.path.join(
        os.path.dirname(here), "docs", "tpu_smoke_r*.json")))
    if snaps:
        # resolve relative to this file so `python -m tools.tpu_smoke`
        # and import-based invocations find it too
        if here not in sys.path:
            sys.path.insert(0, here)
        from smoke_compare import compare
        with open(snaps[-1]) as f:
            base = json.load(f)
        _, regressions = compare(base, results)
        for name, b, ms, rel in regressions:
            print(f"REGRESSION vs {os.path.basename(snaps[-1])}: "
                  f"{name} {b} -> {ms} ms ({rel:+.1%})")


if __name__ == "__main__":
    main()
