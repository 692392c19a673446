"""Text-query end-to-end phase breakdown on the real TPU.

The bench's text query (bench.py:_text_query_phase) measures ~3.6-4.0 s
e2e while the MMDiT smoke row accounts for only 28 x ~71 ms = ~2.0 s.
This tool times each stage separately (same configs/shapes as bench.py):

  clip+sample : CLIP text encode + 28-step CFG rectified-flow sampling
                (no VAE) -- the latents are materialized
  vae         : VAE decode 3x512^2 from latents
  encode+loc  : DINOv2 encode of the 3 imagined images + store localize
  e2e         : the real composed path (imagination() + query_step)

Run alone on the TPU (one-process rule, CLAUDE.md); all output stderr
except a final JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, n=3):
    fn()  # warm (compile)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    import jax
    import jax.numpy as jnp

    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import dataclasses

    from bsc_nav_tpu.config import Config, MemoryConfig
    from bsc_nav_tpu.memory.pipeline import make_query_step
    from bsc_nav_tpu.memory.store import init_store
    from bsc_nav_tpu.models import clip as C
    from bsc_nav_tpu.models import mmdit as M
    from bsc_nav_tpu.models import tokenizer as T
    from bsc_nav_tpu.models import vae as V
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.models.imagination import DiffusionImagination

    full = jax.default_backend() == "tpu"
    log(f"backend: {jax.default_backend()} (full={full})")

    cfg = Config(memory=MemoryConfig(voxel_capacity=(1 << 18) - 8)) \
        if full else Config(memory=MemoryConfig(
            grid_size=128, token_dim=256, voxel_capacity=(1 << 14) - 8))
    vit_cfg = vit.DINOV2_VITL14_REG if full else vit.ViTConfig(
        img_size=224, patch_size=14, dim=256, depth=2, heads=4,
        num_registers=4)
    mcfg = M.SD35_MEDIUM if full else M.MMDIT_TEST
    vcfg = V.SD3_VAE if full else V.VAEConfig(
        latent_channels=mcfg.in_channels, base_channels=32,
        channel_mults=(1, 2), blocks_per_stage=1)
    lcfg = C.SD3_CLIP_L if full else C.SD3_CLIP_L_TEST
    gcfg = C.SD3_CLIP_G if full else C.SD3_CLIP_G_TEST

    rng = np.random.default_rng(0)
    vparams = vit.init_params(vit_cfg, jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16)
    query_step = make_query_step(cfg, vit_cfg, compute_dtype=jnp.bfloat16)
    state = init_store(cfg.memory, store_dtype=jnp.bfloat16)

    tokzr = T.HashTokenizer(vocab_size=lcfg.vocab_size,
                            context_length=lcfg.context_length)
    imagination = DiffusionImagination(
        mmdit_params=M.init_params(mcfg, jax.random.PRNGKey(2),
                                   dtype=jnp.bfloat16),
        mmdit_cfg=mcfg,
        vae_params=V.init_params(vcfg, jax.random.PRNGKey(3),
                                 dtype=jnp.bfloat16),
        vae_cfg=vcfg,
        clip_l_params=C.init_text_params(lcfg, jax.random.PRNGKey(4),
                                         dtype=jnp.bfloat16),
        clip_l_cfg=lcfg,
        clip_g_params=C.init_text_params(gcfg, jax.random.PRNGKey(5),
                                         dtype=jnp.bfloat16),
        clip_g_cfg=gcfg,
        tokenizer=tokzr,
        num_images=3,
        num_steps=28 if full else 4,
    )

    res = {}

    # ---- stage: clip + sample (no VAE) --------------------------------
    n = imagination.num_images

    @jax.jit
    def clip_sample(mp, tp, ids, ids_u, key):
        ctx, pool = imagination_encode(tp, ids)
        ctx_u, pool_u = imagination_encode(tp, ids_u)
        rep = lambda a: jnp.repeat(a, n, axis=0)
        return M.sample(mp, key, rep(ctx), rep(pool), mcfg,
                        num_steps=imagination.num_steps,
                        guidance_scale=7.0,
                        context_uncond=rep(ctx_u),
                        pooled_uncond=rep(pool_u))

    def imagination_encode(tp, ids):
        # SD3.5 triple-encoder assembly (CLIP-L + CLIP-G; T5 dropped
        # here, zero block appended -- diffusers text_encoder_3=None)
        hl, pl = C.encode_text_sd3(tp["l"], ids[0], lcfg)
        hg, pg = C.encode_text_sd3(tp["g"], ids[1], gcfg)
        pooled = jnp.concatenate([pl, pg], axis=-1)
        clip_ctx = jnp.concatenate([hl, hg], axis=-1)
        pad = mcfg.context_dim - clip_ctx.shape[-1]
        clip_ctx = jnp.pad(clip_ctx, [(0, 0), (0, 0), (0, pad)])
        ctx = jnp.concatenate([clip_ctx, jnp.zeros_like(clip_ctx)], axis=1)
        return ctx, pooled

    def stack_ids(text):
        l = T.tokenize([text], tokzr, pad_id=tokzr.eot)
        g = T.tokenize([text], tokzr)
        return jnp.asarray(np.stack([l, g]))

    ids = stack_ids("a red sofa")
    ids_u = stack_ids("")
    key = jax.random.PRNGKey(7)

    def run_clip_sample():
        lat = clip_sample(imagination.mmdit_params,
                          imagination.text_params, ids, ids_u, key)
        _ = float(lat[0, 0, 0, 0])
        return lat

    res["clip_sample_ms"] = timeit(run_clip_sample)
    log(f"clip+sample({imagination.num_steps} steps): "
        f"{res['clip_sample_ms']:.0f} ms")
    lat = run_clip_sample()

    # ---- stage: VAE decode -------------------------------------------
    @jax.jit
    def vae_dec(vp, z):
        return V.to_uint8(V.decode(vp, z, vcfg))

    def run_vae():
        img = vae_dec(imagination.vae_params, lat)
        _ = int(img[0, 0, 0, 0])
        return img

    res["vae_decode_ms"] = timeit(run_vae)
    log(f"vae decode 3x512^2: {res['vae_decode_ms']:.0f} ms")
    imgs = np.asarray(run_vae())

    # ---- stage: encode + localize ------------------------------------
    qimg = jnp.asarray(imgs)

    def run_query():
        pos, scores = query_step(state, vparams, qimg, top_k=100)
        _ = float(scores[0])

    res["encode_localize_ms"] = timeit(run_query)
    log(f"dinov2 encode + localize: {res['encode_localize_ms']:.0f} ms")

    # ---- e2e (the real composed path) --------------------------------
    def run_e2e():
        im = imagination("a wooden chair near a window")
        pos, scores = query_step(state, vparams, jnp.asarray(im),
                                 top_k=100)
        _ = float(scores[0])

    res["e2e_ms"] = timeit(run_e2e)
    log(f"e2e: {res['e2e_ms']:.0f} ms")
    res["accounted_ms"] = (res["clip_sample_ms"] + res["vae_decode_ms"]
                           + res["encode_localize_ms"])

    # ---- fused single-program path (make_text_query_step) ------------
    from bsc_nav_tpu.memory.pipeline import make_text_query_step
    tq = make_text_query_step(cfg, vit_cfg, imagination,
                              compute_dtype=jnp.bfloat16)
    inputs = imagination.prep_inputs("a wooden chair near a window")

    def run_fused():
        pos, scores, _imgs = tq(
            state, vparams, imagination.mmdit_params,
            imagination.vae_params, imagination.text_params,
            imagination.t5_params, *inputs, imagination.next_key(),
            top_k=100)
        _ = float(scores[0])

    res["fused_e2e_ms"] = timeit(run_fused)
    log(f"fused e2e (one program): {res['fused_e2e_ms']:.0f} ms")
    print(json.dumps({k: round(v, 1) for k, v in res.items()}))


if __name__ == "__main__":
    main()
