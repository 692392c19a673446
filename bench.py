"""Headline benchmark: the FULL reference build + query workloads.

Workload definition (BASELINE.md "perf-relevant reference constants"):
  680x680 RGB-D frames; per frame the reference build loop runs BOTH the
  DINOv2 ViT-L/14-reg patch encoder @224 into the voxel token store
  (memory_2.py:842-903) AND YOLO-World v8x detection @640 into long-term
  instance memory (memory_2.py:905-945).  Queries: image-goal localize
  (memory_2.py:563-671) and the text path, which first "imagines" 3
  512^2 images with SD3.5-medium (28 steps, cfg 7.0, memory_2.py:258-276)
  before localizing.

All model weights are random-init at the REAL architectures' shapes --
identical FLOPs/bytes to converted checkpoints.

Metrics (one JSON line on stdout; everything else stderr):
  memory_build_frames_per_sec   headline: encoder + ingest + detector
                                (device decode/top-k) + host NMS +
                                long-term integration, double-buffered
  encode_ingest_frames_per_sec  encoder + voxel ingest only (round-1
                                comparable number)
  query_localize_p50_ms         image-goal query (3 provided images)
  text_query_e2e_ms             CLIP text encode -> MMDiT 28-step CFG
                                sampling 3x512^2 -> VAE decode -> DINOv2
                                encode -> localize, end to end

Reference baseline: A100 wall clock unrecorded in the reference repo
(BASELINE.md); we use a deliberately GENEROUS estimate of 10 frames/sec
for the full A100 build loop (DINOv2 fp32 forward ~25 ms/frame unbatched
+ YOLO-World + per-point Python voxel loop + chunked HDF5 flushes), so
vs_baseline = fps / 10.0 understates the gain.
"""

import json
import os
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import numpy as np


REFERENCE_A100_FPS_ESTIMATE = 10.0

DETECT_CLASSES = [
    "bed", "sofa", "chair", "table", "plant", "tv", "toilet", "sink",
    "refrigerator", "oven", "microwave", "lamp", "cabinet", "counter",
    "shelf", "mirror", "picture", "curtain", "pillow", "towel",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# cold-start budget (VERDICT r3 item 4): every jitted entry's
# compile+first-execute seconds, reported in the output JSON.  With a
# warm persistent cache (JAX_CACHE_DIR) these drop to cache-reload
# time; BENCH_STARTUP_ONLY=1 exits after collecting them so cold-vs-
# warm restarts can be measured back to back.
STARTUP = {}


def _startup(name, seconds):
    STARTUP[name] = round(seconds, 1)
    log(f"{name} compile+first: {seconds:.1f}s")


def _startup_total():
    """Wall-clock startup total.  The imag_* entries are per-model
    sub-timings INSIDE the imagination_init interval (kept for
    attribution, VERDICT r4 item 3); summing both would double-count
    ~30-45 s and fail a genuinely warm --assert-warm run."""
    return round(sum(v for k, v in STARTUP.items()
                     if not k.startswith("imag_")), 1)


def _make_imagination(full, use_t5, abstract=False):
    """Build the SD3.5-class imagination stack (MMDiT + VAE + CLIP-L/G
    [+ T5-XXL]) with REAL params (jit_init, one cached program per
    model) or ABSTRACT ShapeDtypeStruct trees (jax.eval_shape -- zero
    device memory, for AOT-compiling the fused text-query program
    before the store exists).  Per-model init seconds land in STARTUP
    so a slow driver-side init is attributable (VERDICT r4 item 3)."""
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import clip as C
    from bsc_nav_tpu.models import mmdit as M
    from bsc_nav_tpu.models import tokenizer as T
    from bsc_nav_tpu.models import vae as V
    from bsc_nav_tpu.models.imagination import DiffusionImagination
    from bsc_nav_tpu.utils.compile_cache import jit_init

    mcfg = M.SD35_MEDIUM if full else M.MMDIT_TEST
    vcfg = V.SD3_VAE if full else V.VAEConfig(
        latent_channels=mcfg.in_channels, base_channels=32,
        channel_mults=(1, 2), blocks_per_stage=1)
    # the REAL SD3.5 conditioning towers: CLIP-L + CLIP-G (pooled
    # concat 2048, hidden concat zero-padded to 4096)
    lcfg = C.SD3_CLIP_L if full else C.SD3_CLIP_L_TEST
    gcfg = C.SD3_CLIP_G if full else C.SD3_CLIP_G_TEST
    tokzr = T.HashTokenizer(vocab_size=lcfg.vocab_size,
                            context_length=lcfg.context_length)
    # int8 W8A8 MMDiT serving matches the reference's NF4-quantized
    # SD3.5 (memory_2.py:542-560); BENCH_MMDIT_INT8=0 restores bf16
    mmdit_int8 = os.environ.get("BENCH_MMDIT_INT8", "1") != "0"

    if abstract:
        def mk(name, init_fn, key, quantize_fn=None):
            fn = ((lambda k: quantize_fn(init_fn(k)))
                  if quantize_fn else init_fn)
            import jax as _jax
            return _jax.eval_shape(fn, key)
    else:
        # jit_init: each model's init (+ the MMDiT int8 quantize) runs
        # as ONE cached program -- eager init of the 2.45B MMDiT alone
        # measured 130 s through the tunnel vs 37 s jitted cold / ~5 s
        # warm.
        def mk(name, init_fn, key, quantize_fn=None):
            t0 = time.perf_counter()
            p = jit_init(init_fn, key, quantize_fn)
            STARTUP[f"imag_{name}"] = round(time.perf_counter() - t0, 1)
            return p

    t5_kw = {}
    if use_t5:
        # full T5-XXL conditioning: the reference's imaginary() runs the
        # complete triple-encoder pipeline with max_sequence_length=512
        # (memory_2.py:263-270), so the honest e2e number must pay the
        # T5 encode AND the longer joint sequence (S = 1024+77+512).
        # int8 serving (t5.quantize_params scheme) fits the 4.7B
        # encoder next to the token store.
        from bsc_nav_tpu.models import t5 as T5

        class _HashT5Tok:
            def encode(self, text):
                return [hash(w) % 32000 + 2 for w in text.split()]
        t5_kw = dict(
            t5_params=mk("t5", lambda k: T5.init_params_q8(
                T5.T5_XXL, k, dtype=jnp.bfloat16), jax.random.PRNGKey(6)),
            t5_cfg=T5.T5_XXL, t5_tokenizer=_HashT5Tok())
    return DiffusionImagination(
        mmdit_params=mk(
            "mmdit",
            lambda k: M.init_params(mcfg, k, dtype=jnp.bfloat16),
            jax.random.PRNGKey(2),
            M.quantize_params if mmdit_int8 else None),
        mmdit_cfg=mcfg,
        vae_params=mk(
            "vae", lambda k: V.init_params(vcfg, k, dtype=jnp.bfloat16),
            jax.random.PRNGKey(3)),
        vae_cfg=vcfg,
        clip_l_params=mk(
            "clip_l",
            lambda k: C.init_text_params(lcfg, k, dtype=jnp.bfloat16),
            jax.random.PRNGKey(4)),
        clip_l_cfg=lcfg,
        clip_g_params=mk(
            "clip_g",
            lambda k: C.init_text_params(gcfg, k, dtype=jnp.bfloat16),
            jax.random.PRNGKey(5)),
        clip_g_cfg=gcfg,
        tokenizer=tokzr,
        num_images=3,
        num_steps=28 if full else 4,
        # pre-quantized inside jit_init; the quantized linear dispatch
        # is data-driven (w_q leaves)
        quantize=False,
        **t5_kw,
    )


def _precompile_textq(cfg, full, vit_cfg, store_dtype, vit_int8,
                      query_step=None):
    """AOT-compile the fused text-query program while the chip is EMPTY.

    Root cause of BENCH_r04's null text_query_e2e_ms: the fused program
    under the final round-4 code had never been compiled, so the driver
    cold-compiled it AFTER phases A/B -- with the 6.2 GB store, the ViT
    and the 2.45B+4.7B imagination params all resident -- and the
    tunnel's remote_compile died with HTTP 500.  Lowering from
    jax.eval_shape ShapeDtypeStructs allocates ZERO device memory and
    seeds the persistent compile cache, so the later real call is a
    cache reload instead of a loaded-chip compile.

    Tries the full T5 tier first, then the no-T5 tier, so at least one
    working fused program is warm.  Returns the precompiled tier name
    ('fused+t5' / 'fused') or None."""
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.memory.pipeline import make_text_query_step
    from bsc_nav_tpu.memory.store import init_store
    from bsc_nav_tpu.models import vit

    from bsc_nav_tpu.memory.pipeline import make_text_pool_step
    from bsc_nav_tpu.memory.query import localize

    want_t5 = full and os.environ.get("BENCH_T5", "1") != "0"
    # the text phase quantizes the store to int8 before loading T5 (see
    # _text_query_phase); the precompiled programs must match that aval
    tq_store_dtype = jnp.int8 if want_t5 else store_dtype
    state_s = jax.eval_shape(
        lambda: init_store(cfg.memory, store_dtype=tq_store_dtype))
    vfn = ((lambda k: vit.quantize_params(
        vit.init_params(vit_cfg, k, dtype=jnp.bfloat16)))
        if vit_int8 else
        (lambda k: vit.init_params(vit_cfg, k, dtype=jnp.bfloat16)))
    vparams_s = jax.eval_shape(vfn, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    prompt = "a red leather sofa in a living room"

    def compile_fused(imag):
        tq = make_text_query_step(cfg, vit_cfg, imag,
                                  compute_dtype=jnp.bfloat16)
        tq.lower(
            state_s, vparams_s, imag.mmdit_params, imag.vae_params,
            imag.text_params, imag.t5_params, *imag.prep_inputs(prompt),
            key, top_k=100).compile()

    def compile_split(imag):
        ps = make_text_pool_step(cfg, vit_cfg, imag,
                                 compute_dtype=jnp.bfloat16)
        args = (vparams_s, imag.mmdit_params, imag.vae_params,
                imag.text_params, imag.t5_params,
                *imag.prep_inputs(prompt), key)
        ps.lower(*args).compile()
        pooled_s = jax.eval_shape(ps, *args)[0]
        localize.lower(state_s, pooled_s, top_k=100).compile()

    def compile_two_program(imag):
        # the last-resort tier (imagination jit -> host uint8 -> query
        # jit) is DIFFERENT HLO from the fused/split programs, and
        # query_step's image-goal trace uses other image/store avals --
        # so if every tier above failed here, the runtime would
        # otherwise cold-compile both halves on a loaded chip, round
        # 4's exact failure mode.
        args = (imag.mmdit_params, imag.vae_params, imag.text_params,
                imag.t5_params, *imag.prep_inputs(prompt), key)
        imag._run.lower(*args).compile()
        if query_step is not None:
            imgs_s = jax.eval_shape(imag._run, *args)
            query_step.lower(state_s, vparams_s, imgs_s,
                             top_k=100).compile()

    # failed-tier memo: the fused+t5 compile failure is deterministic
    # and costs ~14 min per attempt (trace + lower + remote compile to
    # the helper crash); remember it in the cache dir so repeat bench
    # runs skip straight to the working tier.  Wiping the cache (or
    # BENCH_RETRY_FAILED_PRECOMPILE=1) retries everything.
    from bsc_nav_tpu.utils.compile_cache import _DEFAULT_CACHE_DIR
    cache_dir = (os.environ.get("JAX_CACHE_DIR") or _DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)

    def marker(name):
        return os.path.join(cache_dir, "textq_precompile_failed_"
                            + name.replace("+", "_"))

    ladder = []
    if want_t5:
        ladder += [("fused+t5", True, compile_fused),
                   ("split+t5", True, compile_split)]
    ladder += [("fused", False, compile_fused),
               ("split", False, compile_split)]
    if want_t5:
        ladder.append(("two-program+t5", True, compile_two_program))
    ladder.append(("two-program", False, compile_two_program))
    for name, use_t5, compile_fn in ladder:
        if (os.path.exists(marker(name))
                and not os.environ.get("BENCH_RETRY_FAILED_PRECOMPILE")):
            log(f"textq precompile [{name}] skipped: failed on a prior "
                f"run ({marker(name)}); BENCH_RETRY_FAILED_PRECOMPILE=1 "
                f"retries")
            continue
        try:
            t0 = time.perf_counter()
            compile_fn(_make_imagination(full, use_t5, abstract=True))
            _startup(f"textq_precompile[{name}]",
                     time.perf_counter() - t0)
            if os.path.exists(marker(name)):
                os.remove(marker(name))
            return name
        except Exception as e:                  # noqa: BLE001
            log(f"textq precompile [{name}] FAILED: "
                f"{type(e).__name__}: {str(e)[:200]}")
            try:
                with open(marker(name), "w") as f:
                    f.write(f"{time.ctime()}: {type(e).__name__}: "
                            f"{str(e)[:500]}\n")
            except OSError:
                pass
    return None


def main():
    import jax
    import jax.numpy as jnp

    # the axon TPU plugin ignores JAX_PLATFORMS; honor it via the config
    # API so CPU dev runs (JAX_PLATFORMS=cpu) actually stay off the TPU
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # persistent compile cache: the big pipelines take minutes to compile
    # cold; cached runs start in seconds
    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from bsc_nav_tpu import geometry as G
    from bsc_nav_tpu.config import Config, MemoryConfig
    from bsc_nav_tpu.memory import longterm as LT
    from bsc_nav_tpu.memory.pipeline import make_build_step, make_query_step
    from bsc_nav_tpu.memory.store import init_store, store_nbytes
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.models import yolo_world as Y

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    # off-TPU (structural/dev runs) shrink the generative stack; the
    # driver's TPU run always measures the full architectures
    full = backend == "tpu" and not os.environ.get("BENCH_TINY")

    cfg = Config(
        memory=MemoryConfig(voxel_capacity=(1 << 18) - 8),
    ) if full else Config(
        memory=MemoryConfig(grid_size=128, token_dim=256,
                            voxel_capacity=(1 << 14) - 8),
    )
    vit_cfg = vit.DINOV2_VITL14_REG if full else vit.ViTConfig(
        img_size=224, patch_size=14, dim=256, depth=2, heads=4,
        num_registers=4)
    # BENCH_STORE=int8 measures the quantized token store (half HBM,
    # cosine-exact via int8-row norms); default bf16
    store_dtype = (jnp.int8 if os.environ.get("BENCH_STORE") == "int8"
                   else jnp.bfloat16)
    log(f"store bytes: {store_nbytes(cfg.memory, store_dtype)/1e9:.2f} GB")

    B = int(os.environ.get("BENCH_BATCH", 32))
    H, W = cfg.sensor.height, cfg.sensor.width
    rng = np.random.default_rng(0)

    # int8 W8A8 encoder serving (vit.quantize_params): ViT-L 38.8 ->
    # 30.8 ms/b32 isolated; BENCH_VIT_INT8=0 restores bf16 for A/Bs
    # jit_init: init+quantize in ONE cached program (eager per-leaf
    # init pays ~1 ms dispatch/leaf through the tunnel)
    from bsc_nav_tpu.utils.compile_cache import jit_init
    vit_int8 = os.environ.get("BENCH_VIT_INT8", "1") != "0"
    params = jit_init(
        lambda k: vit.init_params(vit_cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0),
        vit.quantize_params if vit_int8 else None)
    build_step = make_build_step(cfg, vit_cfg, compute_dtype=jnp.bfloat16)
    query_step = make_query_step(cfg, vit_cfg, compute_dtype=jnp.bfloat16)

    # ---- detector: YOLO-World v8x @640, device decode + top-k ----------
    ycfg = Y.YOLOV8X_WORLDV2 if full else Y.YOLO_TEST
    # int8 W8A8 on the PAN neck + head (backbone stays bf16 -- measured
    # slower quantized); BENCH_YOLO_INT8=0 restores full bf16
    yparams = jit_init(
        lambda k: Y.init_params(ycfg, k, dtype=jnp.bfloat16,
                                text_dim=ycfg.embed_dim),
        jax.random.PRNGKey(1),
        Y.quantize_params                           # scope="neck"
        if os.environ.get("BENCH_YOLO_INT8", "1") != "0" else None)
    temb = rng.normal(size=(len(DETECT_CLASSES), ycfg.embed_dim))
    temb = (temb / np.linalg.norm(temb, axis=-1, keepdims=True)
            ).astype(np.float32)
    detector = Y.YoloWorldDetector(yparams, ycfg, DETECT_CLASSES,
                                   temb, confidence=0.55)

    base_tf_j = jnp.asarray(G.base_axes_transform(), jnp.float32)
    base2cam_j = jnp.asarray(
        G.base_to_cam_transform(cfg.sensor.sensor_height), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames=("stress_rate",))
    def detect_dispatch(p, rgb_u8, t, depth_d, poses_d, stress_rate=0):
        """Forward -> decode -> class-wise NMS -> depth backprojection
        to grid instances, ALL on device: one small [B, 32, *] transfer
        per batch instead of host-python NMS/backprojection that
        contends with the tunnel client for the single CPU core
        (measured 16x python slowdown while device work is in flight).

        stress_rate > 0 biases the random-weight detector's (sorted)
        top confidences into [0.55, 1) so ~stress_rate candidates per
        frame survive -- the rate real YOLO-World yields at conf 0.55
        on real scenes; boxes/classes and the whole suppression +
        backprojection path stay real (reference memory_2.py:905-945)."""
        s = ycfg.img_size
        x = rgb_u8.astype(jnp.bfloat16) / 255.0
        x = jax.image.resize(x, (x.shape[0], s, s, 3), "bilinear")
        # k=64 candidates into NMS: sub-threshold candidates never
        # suppress (host semantics filter at conf first), and the
        # suppression scan is O(K) sequential steps -- keep K small.
        # Valid HERE because stress_rate <= 6 bounds the above-threshold
        # pool; the product path (YoloWorldDetector.detect_batch_instances)
        # defaults to decode_k=256 / keep_k=64 to match the host chain
        # on crowded real scenes
        boxes, conf, cls_idx = Y.decode_topk_device(
            Y.forward(p, x, t, ycfg), ycfg, k=64)
        if stress_rate:
            # concat-free boost (conf is sorted desc): a tiny
            # concatenate here perturbed XLA's schedule for the whole
            # program, +163 ms/batch measured
            in_top = jnp.arange(conf.shape[1])[None, :] < stress_rate
            lo = conf[:, stress_rate - 1:stress_rate]
            hi = conf[:, :1]
            boost = 0.55 + 0.44 * (conf - lo) / (hi - lo + 1e-9)
            conf = jnp.where(in_top, boost, conf)
        boxes, conf, cls_idx, ok = Y.nms_device(
            boxes, conf, cls_idx, iou_thr=0.5,
            conf_thr=detector.confidence, k_out=32)
        cam_tfs = jax.vmap(lambda pose: (
            base_tf_j @ G.pose_vec_to_tf(pose)
            @ jnp.linalg.inv(base_tf_j) @ base_tf_j @ base2cam_j
        ))(poses_d)
        return LT.instances_device(boxes, conf, cls_idx, ok, depth_d,
                                   cam_tfs, cfg, s)

    def detect_host_post(dev_out, instances):
        """ONE small transfer + dedup integration for one batch (runs
        while the NEXT batch computes on device)."""
        batch_inst = LT.instances_from_device(dev_out, DETECT_CLASSES)
        instances[:] = LT.integrate(instances + batch_inst)

    # BENCH_INTEGRATE=device: keep the cumulative dedup integration ON
    # DEVICE too (longterm.integrate_device_scan) -- zero per-batch
    # transfers/syncs, ONE small transfer at the end.  MEASURED NEGATIVE
    # (r3 back-to-back A/B, B=32 @6 det/frame): device 183.8 fps vs
    # host-overlapped 214.3 fps, identical 734 instances.  The scan's
    # C+B*K = 3072 sequential lax.scan steps cost ~16 ms/batch of
    # critical-path device time, while the host post rides the double
    # buffer for free.  Kept as an option for hosts too weak to overlap.
    integrate_on_device = os.environ.get("BENCH_INTEGRATE") == "device"
    lt_scan = jax.jit(LT.integrate_device_scan,
                      static_argnames="threshold",
                      donate_argnums=(0,))
    LT_CAP = 2048

    def make_batch(seed):
        r = np.random.default_rng(seed)
        rgb = r.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8)
        depth = r.uniform(0.3, 9.0, size=(B, H, W)).astype(np.float32)
        poses = np.zeros((B, 7), np.float32)
        poses[:, :3] = r.uniform(-5, 5, size=(B, 3))
        poses[:, 6] = 1.0
        return (jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses),
                depth, poses)

    batches = [make_batch(s) for s in range(4)]
    n_iters = int(os.environ.get("BENCH_ITERS", 12))

    # ---- AOT precompile of the fused text-query program ----------------
    # MUST happen while the chip is empty (no store, no detector params):
    # see _precompile_textq.  BENCH_PRECOMPILE_TEXTQ=0 disables;
    # =force also runs it in tiny/CPU mode for structural testing.
    textq_pre = None
    pre_flag = os.environ.get("BENCH_PRECOMPILE_TEXTQ", "1")
    if (not os.environ.get("BENCH_SKIP_TEXTQ")
            and (full or pre_flag == "force") and pre_flag != "0"):
        textq_pre = _precompile_textq(cfg, full, vit_cfg, store_dtype,
                                      vit_int8, query_step=query_step)

    # ---- phase A: encoder + ingest only (round-1 comparable) -----------
    # NOTE: sync via value materialization -- block_until_ready does not
    # reliably wait on tunneled TPU runtimes.
    # Timed as >=3 sub-windows with a sync each and reported as the
    # MEDIAN (VERDICT r4 item 2: one 12-iter window with a single end
    # sync let one ~1.5 s tunnel stall poison the committed number --
    # r4 shipped 183.5 fps while the zero-det full build, a strict
    # SUPERSET of this work, measured 233.7 in the same run).
    def encode_ingest_phase(first=False):
        state = init_store(cfg.memory, store_dtype=store_dtype)
        carry = (state, jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        carry, stats = build_step(carry, params, *batches[0][:3])
        _ = int(stats["num_voxels"])             # forces execution
        if first:
            _startup("build_step", time.perf_counter() - t0)
        wins = []
        for _w in range(3):
            t0 = time.perf_counter()
            for i in range(n_iters):
                carry, stats = build_step(carry, params,
                                          *batches[i % 4][:3])
            _ = int(stats["num_voxels"])         # forces execution
            wins.append(n_iters * B / (time.perf_counter() - t0))
        del carry, state      # phase A's 6.2GB store dies before phase B
        return float(np.median(wins)), [round(w, 1) for w in wins]

    fps_encode, enc_samples = encode_ingest_phase(first=True)
    log(f"encode+ingest: 3 x {n_iters*B} frames -> median "
        f"{fps_encode:.1f} frames/s (windows: "
        f"{', '.join(f'{s:.1f}' for s in enc_samples)})")

    # ---- phase B: FULL build loop (+ detector into long-term memory) ---
    t0 = time.perf_counter()
    # warm BOTH variants with the EXACT call form the loop uses:
    # jax.jit caches omitted-default and explicit-keyword static args
    # as different traces, so a default-form warmup leaves the loop's
    # stress_rate=0 call cold (one ~5s persistent-cache reload INSIDE
    # the first timed loop, measured as 216 -> 54 fps)
    dev_out = detect_dispatch(yparams, batches[0][0], detector.text_emb,
                              batches[0][1], batches[0][2],
                              stress_rate=0)
    _ = float(dev_out[1][0, 0])
    _startup("detector", time.perf_counter() - t0)
    det_rate = int(os.environ.get("BENCH_DET_RATE", 6))
    t0 = time.perf_counter()
    dev_out = detect_dispatch(yparams, batches[0][0], detector.text_emb,
                              batches[0][1], batches[0][2],
                              stress_rate=det_rate)
    _ = float(dev_out[1][0, 0])
    _startup("detector_stressed", time.perf_counter() - t0)
    if integrate_on_device:
        t0 = time.perf_counter()
        warm = lt_scan(LT.integrate_state_init(LT_CAP), *dev_out)
        _ = float(warm[1][0])
        _startup("lt_scan", time.perf_counter() - t0)

    if os.environ.get("BENCH_STARTUP_ONLY"):
        # the agent session's real warmup also pays the text-query
        # path (imagination param init + fused-program compile or
        # persistent-cache reload); free the detector stream first
        # exactly like the normal text phase does (16 GB chip)
        import gc
        del batches, dev_out, yparams, detector
        gc.collect()
        try:
            state_box = [init_store(cfg.memory, store_dtype=store_dtype)]
            _text_query_phase(cfg, full, state_box, params, vit_cfg, rng,
                              query_step, startup_only=True,
                              precompiled=textq_pre)
        except Exception as e:                  # noqa: BLE001
            log(f"startup text-query phase FAILED: "
                f"{type(e).__name__}: {e}")
        print(json.dumps({"metric": "startup_seconds",
                          "value": _startup_total(),
                          "unit": "s", "vs_baseline": None,
                          "startup": dict(STARTUP)}))
        return

    def full_build(stress_rate):
        state = init_store(cfg.memory, store_dtype=store_dtype)
        carry = (state, jax.random.PRNGKey(0))
        instances = []
        lt_state = LT.integrate_state_init(LT_CAP)
        pending = None
        t0 = time.perf_counter()
        for i in range(n_iters):
            rgb_d, depth_d, poses_d, depth_np, poses_np = batches[i % 4]
            carry, stats = build_step(carry, params, rgb_d, depth_d,
                                      poses_d)
            this = detect_dispatch(yparams, rgb_d, detector.text_emb,
                                   depth_d, poses_d,
                                   stress_rate=stress_rate)
            if integrate_on_device:
                locs, conf, cls_idx, ok = this
                lt_state = lt_scan(lt_state, locs, conf, cls_idx, ok)
            elif pending is not None:      # overlaps device compute
                detect_host_post(pending, instances)
            if not integrate_on_device:
                pending = this
        if integrate_on_device:
            instances = LT.instances_from_integrate_state(
                lt_state, DETECT_CLASSES)
        else:
            detect_host_post(pending, instances)
        n_vox_final = int(stats["num_voxels"])  # forces execution
        dt = time.perf_counter() - t0
        return (n_iters * B / dt, carry[0], instances, n_vox_final,
                int(stats["dropped_voxels"]))

    # continuity number: the zero-detection loop (random-weight YOLO on
    # random frames clears conf 0.55 nowhere; r1/r2 headline conditions)
    fps_zero_det, _zstate, _zinst, _, _ = full_build(stress_rate=0)
    del _zstate, _zinst          # the 6.2GB store must die BEFORE the
    log(f"FULL build (zero-det continuity): {fps_zero_det:.1f} frames/s")

    # sanity cross-check (VERDICT r4 item 2): encode+ingest is a strict
    # SUBSET of the zero-det full build's work, so its fps must not be
    # lower.  A violation means a tunnel stall / cache reload landed in
    # the phase-A windows -- re-run them once and take the better median.
    if fps_encode < fps_zero_det:
        log(f"INCONSISTENT: encode+ingest {fps_encode:.1f} < zero-det "
            f"full build {fps_zero_det:.1f} (subset of that work); "
            f"re-running phase A")
        fe2, es2 = encode_ingest_phase()
        enc_samples = enc_samples + es2
        if fe2 > fps_encode:
            fps_encode = fe2
        log(f"encode+ingest re-run: median {fe2:.1f} frames/s "
            f"(windows: {', '.join(f'{s:.1f}' for s in es2)}); "
            f"reporting {fps_encode:.1f}")

    # HEADLINE: detector-stressed build -- ~det_rate detections/frame
    # flow through host NMS + backprojection + long-term integration.
    # One pass is only ~2 s of wall clock and the tunnel host's loop
    # timing is noisy (same-code samples 171-223 fps observed), so run
    # the phase BENCH_REPEATS times and report the best; every sample
    # is logged for honesty.
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    samples = []
    state = instances = None
    for r in range(repeats):
        # each pass inits a fresh 6.2GB store; the PREVIOUS pass's
        # returned store must be released first or two stores are
        # resident on the 16GB chip for the whole pass (r3's monotonic
        # 212.8 -> 187.7 -> 175.0 sample decay)
        del state, instances
        fps_r, state, instances, n_vox_final, dropped = full_build(
            stress_rate=det_rate)
        samples.append(fps_r)
        log(f"  stressed pass {r + 1}/{repeats}: {fps_r:.1f} frames/s")
    # steady-state headline: the MEDIAN pass, not the best (VERDICT r3
    # item 2 -- a number that only holds on the first pass is not a
    # steady-state number)
    fps = float(np.median(samples))
    log(f"FULL build (stressed @{det_rate} det/frame): {n_iters*B} frames"
        f" -> {fps:.1f} frames/s (samples: "
        f"{', '.join(f'{s:.1f}' for s in samples)}), voxels={n_vox_final},"
        f" dropped={dropped}, longterm instances={len(instances)}")

    # ---- image-goal query latency ---------------------------------------
    qimg = jnp.asarray(rng.integers(0, 255, size=(3, 512, 512, 3),
                                    dtype=np.uint8))
    pos, scores = query_step(state, params, qimg, top_k=100)
    _ = float(scores[0])
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        pos, scores = query_step(state, params, qimg, top_k=100)
        _ = float(scores[0])                    # forces execution
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat) * 1000)
    triv = jax.jit(lambda x: x + 1)
    _ = float(triv(jnp.zeros(8))[0])
    rtt = []
    for _i in range(10):
        t0 = time.perf_counter()
        _ = float(triv(jnp.zeros(8))[0])
        rtt.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtt) * 1000)
    log(f"image query p50: {p50:.1f} ms (top score {float(scores[0]):.3f});"
        f" sync round-trip overhead ~{rtt_ms:.1f} ms")

    # ---- batched query: Q=4 queries, ONE store pass + ONE sync ----------
    # (the agent's adaptive-region sweep and multi-goal retrieval route
    # through this; single-query p50 is tunnel-RTT-bound, VERDICT r2 #3)
    from bsc_nav_tpu.memory.pipeline import make_query_batch_step
    query_batch_step = make_query_batch_step(cfg, vit_cfg,
                                             compute_dtype=jnp.bfloat16)
    qimgs4 = jnp.asarray(rng.integers(
        0, 255, size=(4, 3, 512, 512, 3), dtype=np.uint8))
    bpos, bscores = query_batch_step(state, params, qimgs4, top_k=100)
    _ = float(bscores[0, 0])
    blat = []
    for _i in range(10):
        t0 = time.perf_counter()
        bpos, bscores = query_batch_step(state, params, qimgs4, top_k=100)
        _ = float(bscores[0, 0])                # forces execution
        blat.append(time.perf_counter() - t0)
    q4_ms = float(np.median(blat) * 1000)
    q4_amortized = q4_ms / 4.0
    log(f"batched query Q=4: {q4_ms:.1f} ms total -> "
        f"{q4_amortized:.1f} ms/query amortized")

    # ---- text query END TO END (imagination included) -------------------
    # free device buffers the text phase doesn't need: with the MMDiT-X
    # dual-attention params (2.55B, +0.43GB bf16 over plain SD3) the
    # store (6.2GB) + imagination stack leave no headroom for stale
    # frame batches / detector params on a 16GB chip
    import gc
    del batches, dev_out, qimgs4, bpos, bscores, yparams, detector
    gc.collect()
    text_e2e_ms = prefetch_ms = None
    try:
        # hand over the ONLY store reference: the phase may swap the
        # bf16 store for an int8 one, and a second live reference here
        # would keep both resident (10 GB) under the T5 stack
        state_box = [state]
        del state
        text_e2e_ms, prefetch_ms = _text_query_phase(
            cfg, full, state_box, params, vit_cfg, rng, query_step,
            precompiled=textq_pre)
    except Exception as e:                      # noqa: BLE001
        # the driver contract requires the JSON line no matter what;
        # report the phase failure on stderr and carry null
        log(f"text-query phase FAILED: {type(e).__name__}: {e}")

    out = {
        "metric": "memory_build_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_A100_FPS_ESTIMATE, 2),
        "encode_ingest_frames_per_sec": round(fps_encode, 2),
        "encode_ingest_samples": enc_samples,
        "zero_det_frames_per_sec": round(fps_zero_det, 2),
        "stressed_samples": [round(s, 1) for s in samples],
        "det_per_frame": det_rate,
        "query_localize_p50_ms": round(p50, 2),
        "query_batch_q4_amortized_ms": round(q4_amortized, 2),
        "text_query_e2e_ms": (round(text_e2e_ms, 1)
                              if text_e2e_ms is not None else None),
        "text_query_prefetch_residual_ms": (
            round(prefetch_ms, 1) if prefetch_ms is not None else None),
        "text_query_t5": _TEXTQ_T5[0],
        "text_query_path": _TEXTQ_PATH[0],
        "text_query_store": _TEXTQ_STORE[0],
        "textq_precompiled": textq_pre,
        "sync_rtt_ms": round(rtt_ms, 2),
        "backend": backend,
        "batch": B,
        "full_arch": bool(full),
        "longterm_instances": len(instances),
        "startup": dict(STARTUP),
        "baseline_note": ("A100 reference estimated at 10 fps full build "
                          "loop (unrecorded in repo; see BASELINE.md)"),
    }
    print(json.dumps(out))


def _run_text_tier(cfg, full, state, params, vit_cfg, use_t5, mode,
                   query_step, startup_only, imag_cache=None):
    """One text-query tier: build the imagination stack and measure
    (e2e_ms, prefetch_residual_ms).  mode:
      fused        one program incl. the store scan (fastest; its +t5
                   variant exceeds the compile server at production
                   store sizes -- tools/t5_compile_bisect.py)
      split        imagination+encode+pool program chained DEVICE-side
                   into the localize program (the [D] pooled handoff
                   never visits the host; ~fused speed, compiles with
                   T5)
      two-program  imagination jit -> host uint8 -> query jit (the
                   reference-shaped fallback; pays the image round
                   trip)"""
    import gc

    import jax.numpy as jnp

    # Reuse the already-built stack across attempts of the same
    # conditioning (retry of a failed tier, fused+t5 -> split+t5
    # descent): rebuilding pays 30-116 s of param init through the
    # tunnel per attempt (docs/startup_r05.json).  A use_t5 flip
    # evicts first -- the T5 tree alone is 4.7 GB and must be freed
    # before the smaller tier's footprint is measured against the chip.
    t0 = time.perf_counter()
    if imag_cache is not None and imag_cache.get("use_t5") == use_t5:
        imagination = imag_cache["imagination"]
        log(f"textq: reusing the built imagination stack "
            f"(use_t5={use_t5})")
    else:
        if imag_cache:
            imag_cache.clear()
            gc.collect()
        imagination = _make_imagination(full, use_t5)
        if imag_cache is not None:
            imag_cache["use_t5"] = use_t5
            imag_cache["imagination"] = imagination
    _startup("imagination_init", time.perf_counter() - t0)

    if mode == "fused":
        from bsc_nav_tpu.memory.pipeline import make_text_query_step
        tq_step = make_text_query_step(cfg, vit_cfg, imagination,
                                       compute_dtype=jnp.bfloat16)

        def dispatch(text):
            _p, sc, _imgs = tq_step(
                state, params, imagination.mmdit_params,
                imagination.vae_params, imagination.text_params,
                imagination.t5_params, *imagination.prep_inputs(text),
                imagination.next_key(), top_k=100)
            return sc

        def finish(sc):
            return float(sc[0])
    elif mode == "split":
        from bsc_nav_tpu.memory.pipeline import make_text_pool_step
        from bsc_nav_tpu.memory.query import localize
        pool_step = make_text_pool_step(cfg, vit_cfg, imagination,
                                        compute_dtype=jnp.bfloat16)

        def dispatch(text):
            pooled, _imgs = pool_step(
                params, imagination.mmdit_params,
                imagination.vae_params, imagination.text_params,
                imagination.t5_params, *imagination.prep_inputs(text),
                imagination.next_key())
            _p, sc = localize(state, pooled, top_k=100)
            return sc

        def finish(sc):
            return float(sc[0])
    else:
        def dispatch(text):
            # async handle: the decoded uint8 images, still on device
            return imagination._run(
                imagination.mmdit_params, imagination.vae_params,
                imagination.text_params, imagination.t5_params,
                *imagination.prep_inputs(text), imagination.next_key())

        def finish(imgs_dev):
            imgs = jnp.asarray(np.asarray(imgs_dev))  # host round trip
            _p, s = query_step(state, params, imgs, top_k=100)
            return float(s[0])

    t0 = time.perf_counter()
    _ = finish(dispatch("a red leather sofa in a living room"))
    _startup("text_query", time.perf_counter() - t0)
    if startup_only:
        return None, None
    tq = []
    for i in range(2):
        t0 = time.perf_counter()
        _ = finish(dispatch(f"a wooden chair near a window {i}"))
        tq.append(time.perf_counter() - t0)
    text_e2e_ms = float(np.median(tq) * 1000)
    cond = ("CLIP-L+G + T5-XXL-512" if use_t5
            else "CLIP-L+G, T5 zero-block")
    log(f"text query e2e ({mode}): {text_e2e_ms:.0f} ms "
        f"(SD3.5-class 3x512^2 28 steps, {cond}, + encode + localize)")

    # agent-loop-shaped metric (VERDICT r3 item 5): the robot PREFETCHES
    # stage-2 at the decision point (robot._prefetch_working_memory) and
    # syncs after walking the stage-1 candidates.  Emulate the walk with
    # host sleep ~80% of e2e and measure the residual blocking sync --
    # how much of the query the overlap actually hides on this runtime.
    blocked = []
    for i in range(2):
        h = dispatch(f"a potted plant on a shelf {i}")
        time.sleep(text_e2e_ms / 1000 * 0.8)           # stage-1 walk
        t0 = time.perf_counter()
        _ = finish(h)
        blocked.append(time.perf_counter() - t0)
    prefetch_ms = float(np.median(blocked) * 1000)
    log(f"text query prefetch residual sync after 0.8*e2e host work: "
        f"{prefetch_ms:.0f} ms (vs {text_e2e_ms:.0f} blocking)")
    return text_e2e_ms, prefetch_ms


def _text_query_phase(cfg, full, state_box, params, vit_cfg, rng,
                      query_step, startup_only=False, precompiled=None):
    """Graded text-query tiers (VERDICT r4 item 1: the driver artifact
    must carry a NUMBER, with the tier recorded in text_query_path):

        fused+t5      one program, full triple-encoder conditioning
        split+t5      full conditioning, device-chained two programs
                      (the compile-robust T5 path)
        fused         one program, diffusers text_encoder_3=None
        split         device-chained, no T5
        two-program   imagination jit -> host uint8 -> query jit
                      (+t5 variant first when T5 is wanted)

    When the empty-chip precompile already chose a tier, start there
    (everything above it failed to compile with zero device memory --
    a loaded-chip attempt is doomed).  Each tier is retried once
    (tunnel HTTP 500s can be transient) unless it OOMed, in which case
    retrying the same footprint is pointless."""
    import gc
    import jax.numpy as jnp

    if os.environ.get("BENCH_SKIP_TEXTQ"):
        return None, None
    state = state_box.pop()          # sole reference -- see caller
    want_t5 = full and os.environ.get("BENCH_T5", "1") != "0"
    if want_t5 and state.feats.dtype != jnp.int8:
        # 16 GB budget: the bf16 store (6.2 GB) + the full triple-
        # encoder conditioning (~9.4 GB incl. int8 T5-XXL) do not
        # coexist; the int8 store (3.1 GB, cosine-EXACT scores) does.
        # Same convention as int8 ingest / frozen segments.
        from bsc_nav_tpu.memory.store import quantize_store
        log("textq: quantizing the token store to int8 (cosine-exact) "
            "to fit the T5-XXL conditioning next to it")
        state = quantize_store(state)
        _TEXTQ_STORE[0] = "int8"
    else:
        _TEXTQ_STORE[0] = str(np.dtype(state.feats.dtype))
    tiers = []
    if want_t5:
        tiers += [("fused+t5", True, "fused"), ("split+t5", True, "split")]
    tiers += [("fused", False, "fused"), ("split", False, "split")]
    if want_t5:
        tiers.append(("two-program+t5", True, "two-program"))
    tiers.append(("two-program", False, "two-program"))
    names = [t[0] for t in tiers]
    # BENCH_TEXTQ_TIER=<name> pins one tier (fallback A/Bs, debugging).
    # Applied to the FULL ladder, before the precompiled fast-start
    # slice: a pin must run the named tier or fail loudly -- silently
    # measuring a different tier than the one pinned would mislabel the
    # A/B.  An unknown name (typo, or a +t5 tier under BENCH_T5=0) is
    # an error, not a fallthrough.
    pin = os.environ.get("BENCH_TEXTQ_TIER")
    if pin:
        if pin not in names:
            raise ValueError(f"BENCH_TEXTQ_TIER={pin!r} is not a tier "
                             f"on this ladder; valid: {', '.join(names)}")
        tiers = [t for t in tiers if t[0] == pin]
    elif precompiled in names:
        skipped = names[:names.index(precompiled)]
        if skipped:
            log(f"textq: starting at tier {precompiled} (empty-chip "
                f"precompile already failed: {', '.join(skipped)})")
        tiers = tiers[names.index(precompiled):]

    last_err = None
    imag_cache = {}    # one-slot: reuse the built stack across attempts
    for name, use_t5, mode in tiers:
        for attempt in range(2):
            gc.collect()                 # free the failed tier's params
            try:
                res = _run_text_tier(cfg, full, state, params, vit_cfg,
                                     use_t5, mode, query_step,
                                     startup_only, imag_cache=imag_cache)
                _TEXTQ_PATH[0] = name + ("+retry" if attempt else "")
                _TEXTQ_T5[0] = use_t5
                return res
            except Exception as e:              # noqa: BLE001
                msg = str(e)
                # keep only the STRING: holding the exception object
                # pins the failed tier's params (T5 alone is 4.7 GB)
                # through its traceback frames, OOMing every later
                # tier (observed r5 run 2)
                last_err = f"{type(e).__name__}: {msg[:300]}"
                log(f"text tier {name} attempt {attempt + 1} FAILED: "
                    f"{type(e).__name__}: {msg[:200]}")
                if any(s in msg for s in ("RESOURCE_EXHAUSTED",
                                          "Out of memory", "OOM")):
                    break                # smaller tier, not a retry
    raise RuntimeError(f"all text-query tiers failed; last: {last_err}")


#: whether the measured text query ran the full T5-XXL conditioning,
#: and which tier produced the number ("fused+t5" / "fused" /
#: "two-program+t5" / "two-program", "+retry" suffix if the first
#: attempt failed) -- reported in the bench JSON
_TEXTQ_T5 = [None]
_TEXTQ_PATH = [None]
#: store dtype the text query ran against ("int8" after the T5-fit
#: conversion; cosine-exact either way)
_TEXTQ_STORE = [None]


if __name__ == "__main__":
    main()
