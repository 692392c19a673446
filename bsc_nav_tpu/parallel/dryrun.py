"""Multi-chip dry run: the full framework step jitted over a device mesh.

This is the sharded analog of the full pipeline step -- there is no
gradient training anywhere in this framework (the reference is
training-free, SURVEY.md intro); the "training step" equivalent is the
memory-BUILD step (batched encode + voxel ingest) chained with the
query step, which together exercise every collective pattern the
framework uses at scale:

  dp  : frame batch data-parallelism (encoder runs per-shard; ingest
        scatters merge across dp via XLA-inserted collectives)
  mp  : Megatron-style tensor parallelism inside the ViT (column/row
        split matmuls) and capacity-axis sharding of the token store
        for query similarity + distributed top-k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bsc_nav_tpu import geometry as G
from bsc_nav_tpu.config import Config, MemoryConfig, QueryConfig, SensorConfig
from bsc_nav_tpu.memory import longterm as LT
from bsc_nav_tpu.memory.ingest import ingest_frames
from bsc_nav_tpu.memory.pipeline import encode_patch_grid
from bsc_nav_tpu.memory.query import gaussian_center_pool, localize
from bsc_nav_tpu.memory.store import init_store
from bsc_nav_tpu.models import vit
from bsc_nav_tpu.models import yolo_world as Y
from bsc_nav_tpu.parallel import mesh as M


def dryrun_config() -> Config:
    """Tiny but structurally real: full dp/mp shardable shapes."""
    return Config(
        sensor=SensorConfig(width=56, height=56),
        memory=MemoryConfig(
            grid_size=64,
            floor_height=-3.2,
            map_height=3.2,
            token_dim=64,
            cache_size=4,
            voxel_capacity=1015,   # padded_rows -> 1016 = 8 * 127
            depth_sample_rate=8,
        ),
        query=QueryConfig(top_k=16, query_width=28, query_height=28),
    )


def dryrun_multichip(n_devices: int, devices=None, dp=None, mp=None,
                     textq: bool = False) -> None:
    """Create an n-device mesh, jit the FULL pipeline step over it with
    real dp/mp shardings, and run one step on tiny shapes.  Raises on
    any sharding/compile/execution failure.

    With dp/mp unset, picks the widest 2D factorization (e.g. 8 -> 4x2);
    pass them explicitly to exercise the edges (dp=n x mp=1 pure data
    parallel, dp=1 x mp=n store fully sharded + encoder TP across all
    devices)."""
    devices = devices if devices is not None else jax.devices()[:n_devices]
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}")
    if dp is None or mp is None:
        # widest 2D factorization: dp x mp
        mp = 1
        for cand in range(int(n_devices ** 0.5), 0, -1):
            if n_devices % cand == 0:
                mp = cand
                break
        dp = n_devices // mp
    assert dp * mp == n_devices, f"dp={dp} * mp={mp} != {n_devices}"
    mesh = M.make_mesh(dp=dp, mp=mp, devices=devices)

    cfg = dryrun_config()
    if mp > 1:
        # the store's padded capacity axis must divide across mp (e.g.
        # n=12 -> mp=3 would not divide the default 1016 rows): size the
        # capacity so padded_rows is a multiple of lcm(8, mp)
        import dataclasses
        import math as _math
        rows = 8 * mp // _math.gcd(8, mp)
        padded = ((1016 + rows - 1) // rows) * rows
        cfg = cfg.replace(memory=dataclasses.replace(
            cfg.memory, voxel_capacity=padded - 1))
    # enough heads that encoder TP engages at this mp (dim 64 : heads in
    # {2,4,8} all give an MXU-friendly head_dim and divide across shards)
    heads = mp if mp > 2 and cfg.memory.token_dim % mp == 0 else 2
    vit_cfg = vit.ViTConfig(
        img_size=28, patch_size=14, dim=cfg.memory.token_dim, depth=2,
        heads=heads, num_registers=4, mlp_ratio=4.0)

    params = vit.init_params(vit_cfg, jax.random.PRNGKey(0))
    # head-blocked qkv layout + shard_map attention when TP divides heads
    use_tp = mp > 1 and vit_cfg.heads % mp == 0
    params = M.shard_vit_params(params, mesh, tp_qkv_layout=use_tp)
    tp_mesh = mesh if use_tp else None

    state = init_store(cfg.memory)
    state = M.shard_store(state, mesh)

    B = 2 * dp
    rng = np.random.default_rng(0)
    H, W = cfg.sensor.height, cfg.sensor.width
    rgb = jnp.asarray(
        rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.uniform(0.3, 3.0, size=(B, H, W)), jnp.float32)
    poses = np.zeros((B, 7), np.float32)
    poses[:, 6] = 1.0
    poses[:, :3] = rng.uniform(-0.5, 0.5, size=(B, 3))
    poses = jnp.asarray(poses)

    fsh = M.frames_sharding(mesh)
    rgb = jax.device_put(rgb, fsh)
    depth = jax.device_put(depth, fsh)
    poses = jax.device_put(poses, fsh)

    # detector leg (dp-sharded over the same frame batch): tiny YOLO-World
    # forward -> device decode -> device NMS -> instance backprojection,
    # the full-build loop's second stream (bench.py detect_dispatch,
    # reference memory_2.py:905-945). Params replicated (small model).
    ycfg = Y.YOLO_TEST
    yparams = Y.init_params(ycfg, jax.random.PRNGKey(3),
                            text_dim=ycfg.embed_dim)
    temb = rng.normal(size=(4, ycfg.embed_dim)).astype(np.float32)
    temb = jnp.asarray(temb / np.linalg.norm(temb, axis=-1, keepdims=True))
    base_tf = jnp.asarray(G.base_axes_transform(), jnp.float32)
    base2cam = jnp.asarray(
        G.base_to_cam_transform(cfg.sensor.sensor_height), jnp.float32)

    @jax.jit
    def full_step(state, params, yparams, rgb, depth, poses, key, qimg):
        patch = encode_patch_grid(params, rgb, vit_cfg, cfg,
                                  tp_mesh=tp_mesh)
        state, stats = ingest_frames(
            state, rgb, depth, poses, patch, key, cfg)
        # detector stream into long-term instances (dp over frames)
        x = rgb.astype(jnp.float32) / 255.0
        x = jax.image.resize(
            x, (x.shape[0], ycfg.img_size, ycfg.img_size, 3), "bilinear")
        boxes, conf, cls_idx = Y.decode_topk_device(
            Y.forward(yparams, x, temb, ycfg), ycfg, k=8)
        boxes, conf, cls_idx, ok = Y.nms_device(
            boxes, conf, cls_idx, iou_thr=0.5, conf_thr=0.0, k_out=4)
        cam_tfs = jax.vmap(lambda pose: (
            base_tf @ G.pose_vec_to_tf(pose)
            @ jnp.linalg.inv(base_tf) @ base_tf @ base2cam
        ))(poses)
        inst = LT.instances_device(boxes, conf, cls_idx, ok, depth,
                                   cam_tfs, cfg, ycfg.img_size)
        # query against the just-built store (sharded similarity + top-k)
        tokens = vit.forward_features(
            params, vit.preprocess(qimg, out_hw=(28, 28)), vit_cfg,
            tp_mesh=tp_mesh,
        )["x_norm_patchtokens"]
        pooled = gaussian_center_pool(tokens)
        positions, scores = localize(state, pooled, top_k=8)
        return state, stats, positions, scores, inst

    qimg = jnp.asarray(
        rng.integers(0, 255, size=(3, H, W, 3), dtype=np.uint8))

    with mesh:
        state, stats, positions, scores, inst = full_step(
            state, params, yparams, rgb, depth, poses,
            jax.random.PRNGKey(1), qimg)

    # force execution + sanity
    n = int(stats["num_voxels"])
    assert n > 0, "dry run ingested no voxels"
    s = np.asarray(scores)
    assert not np.isnan(s).any(), "NaN similarity scores in dry run"
    assert np.isfinite(s[s > -np.inf]).all()
    locs, iconf, icls, iok = (np.asarray(a) for a in inst)
    assert locs.shape == (B, 4, 3) and iok.shape == (B, 4)
    n_inst = int(iok.sum())
    assert np.isfinite(iconf[iok]).all()

    # explicit-collective path: shard_map distributed top-k over the
    # mp-sharded store must agree with the GSPMD localize
    from bsc_nav_tpu.parallel.sharded_query import sharded_localize
    q = jnp.ones((cfg.memory.token_dim,), jnp.float32)
    p_ref, s_ref = localize(state, q, top_k=8)
    p_sh, s_sh = sharded_localize(state, q, mesh, top_k=8)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)

    # MMDiT tensor parallelism (imagination model): sharded params +
    # per-shard joint attention must match the unsharded forward
    mmdit_ok = ""
    if mp > 1:
        from bsc_nav_tpu.models import mmdit as MM
        mcfg = MM.MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                              dim=16 * mp, depth=2, heads=mp * 2,
                              context_dim=32, pooled_dim=16)
        mparams = MM.init_params(mcfg, jax.random.PRNGKey(2))
        lat = jnp.asarray(rng.normal(size=(dp * 2, 8, 8, 4))
                          .astype(np.float32))
        mctx = jnp.asarray(rng.normal(size=(dp * 2, 5, 32))
                           .astype(np.float32))
        mpool = jnp.asarray(rng.normal(size=(dp * 2, 16))
                            .astype(np.float32))
        tvec = jnp.full((dp * 2,), 0.5, jnp.float32)
        ref = MM.forward(mparams, lat, tvec, mctx, mpool, mcfg)
        smp = M.shard_mmdit_params(mparams, mesh)
        with mesh:
            out = jax.jit(lambda p, l: MM.forward(
                p, l, tvec, mctx, mpool, mcfg, tp_mesh=mesh))(smp, lat)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        mmdit_ok = ", mmdit-tp verified"

    # fused text-query leg (VERDICT r4 item 7): the largest single
    # program in the system -- CLIP-L/G + T5 conditioning -> MMDiT CFG
    # sampling -> VAE decode -> ViT encode -> localize against the
    # mp-SHARDED store, all in ONE jit executed under the mesh
    # (production path: memory.pipeline.make_text_query_step, the
    # program whose TPU compile died in round 4's driver run).
    textq_ok = ""
    if textq:
        from bsc_nav_tpu.memory.pipeline import make_text_query_step
        from bsc_nav_tpu.models import clip as CL
        from bsc_nav_tpu.models import mmdit as MM
        from bsc_nav_tpu.models import t5 as T5
        from bsc_nav_tpu.models import tokenizer as TOK
        from bsc_nav_tpu.models import vae as VV
        from bsc_nav_tpu.models.imagination import DiffusionImagination

        mcfg = MM.MMDIT_TEST
        vcfg = VV.VAEConfig(
            latent_channels=mcfg.in_channels, base_channels=16,
            channel_mults=(1, 2), blocks_per_stage=1, groups=4,
            scaling_factor=1.0, shift_factor=0.0)
        lcfg, gcfg = CL.SD3_CLIP_L_TEST, CL.SD3_CLIP_G_TEST
        tcfg = T5.T5Config(vocab_size=64, dim=mcfg.context_dim, d_kv=8,
                           heads=2, d_ff=64, layers=1, rel_buckets=8,
                           rel_max_distance=16)

        class _Tok:
            def encode(self, text):
                return [hash(w) % 62 + 2 for w in text.split()]

        imag = DiffusionImagination(
            mmdit_params=MM.init_params(mcfg, jax.random.PRNGKey(11)),
            mmdit_cfg=mcfg,
            vae_params=VV.init_params(vcfg, jax.random.PRNGKey(12)),
            vae_cfg=vcfg,
            clip_l_params=CL.init_text_params(lcfg, jax.random.PRNGKey(13)),
            clip_l_cfg=lcfg,
            clip_g_params=CL.init_text_params(gcfg, jax.random.PRNGKey(14)),
            clip_g_cfg=gcfg,
            tokenizer=TOK.HashTokenizer(vocab_size=lcfg.vocab_size,
                                        context_length=lcfg.context_length),
            num_images=2, num_steps=2,
            t5_params=T5.init_params(tcfg, jax.random.PRNGKey(15)),
            t5_cfg=tcfg, t5_tokenizer=_Tok(), t5_seq_len=8)
        tq = make_text_query_step(cfg, vit_cfg, imag)
        with mesh:
            _tp, tscores, timgs = tq(
                state, params, imag.mmdit_params, imag.vae_params,
                imag.text_params, imag.t5_params,
                *imag.prep_inputs("a red sofa"), imag.next_key(),
                top_k=8)
        tsc = np.asarray(tscores)
        assert not np.isnan(tsc).any(), "NaN text-query scores"
        assert np.asarray(timgs).dtype == np.uint8
        textq_ok = ", fused text query (clip+t5 -> mmdit -> vae -> localize) verified"

    print(f"dryrun_multichip OK: mesh dp={dp} mp={mp}, "
          f"{n} voxels, {n_inst} detector instances, "
          f"top score {float(s[0]):.4f}, "
          f"distributed top-k verified{mmdit_ok}{textq_ok}")


def dryrun_all(n_devices: int, devices=None) -> None:
    """Run the dry run at the three mesh-factorization edges: pure data
    parallel (dp=n), the widest balanced 2D mesh, and full model/store
    parallel (mp=n: token store sharded n-way + encoder TP across all
    devices).  Each factorization must compile and execute."""
    # widest balanced split (same rule as dryrun_multichip's default)
    mp_mid = 1
    for cand in range(int(n_devices ** 0.5), 0, -1):
        if n_devices % cand == 0:
            mp_mid = cand
            break
    # the fused text-query leg runs at the balanced factorization (the
    # store is mp-sharded there, so the one-program text query executes
    # with a genuinely distributed localize tail)
    factorizations = [(n_devices, 1, False),
                      (n_devices // mp_mid, mp_mid, True),
                      (1, n_devices, False)]
    # dedup repeated (dp, mp) but MERGE the textq flag: for prime n (or
    # n=1) the balanced split collapses to (n, 1), and dropping its
    # textq=True leg would leave the fused text-query program untested
    # on 2-chip meshes.
    merged = {}
    for dp, mp, textq in factorizations:
        merged[(dp, mp)] = merged.get((dp, mp), False) or textq
    for (dp, mp), textq in merged.items():
        dryrun_multichip(n_devices, devices=devices, dp=dp, mp=mp,
                         textq=textq)
