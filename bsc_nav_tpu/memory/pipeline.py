"""Fused device pipelines: encoder + voxel ingest, encoder + query.

These are the two "one XLA program" paths the framework is built around
(SURVEY §7 steps 2-4):

  build_step: RGB-D frames + poses  ->  updated voxel store
      (reference path: memory_2.py:842-903 frame loop + DINOv2 forward)
  query_step: query images          ->  top-K goal voxels
      (reference path: memory_2.py:563-671 voxel_localized)

Batching frames decouples simulator stepping from ingestion (the
reference is frame-at-a-time because its Python loop forces it; mapping
is pose-conditioned and replayable, so frames queue up on host and hit
the TPU in batches).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import Config
from bsc_nav_tpu.memory.ingest import ingest_frames
from bsc_nav_tpu.memory.query import (
    gaussian_center_pool, localize, localize_batch)
from bsc_nav_tpu.memory.store import VoxelStoreState
from bsc_nav_tpu.models import vit


def encode_patch_grid(params, images_uint8: jnp.ndarray, vit_cfg: vit.ViTConfig,
                      cfg: Config, compute_dtype=jnp.float32,
                      tp_mesh=None) -> jnp.ndarray:
    """uint8 frames [B, H, W, 3] -> patch-token grid [B, nh, nw, D]
    (reference _get_patch_token, memory_2.py:732-742: resize to the query
    resolution, ImageNet-normalize, DINOv2 forward, reshape)."""
    q = (cfg.query.query_height, cfg.query.query_width)
    x = vit.preprocess(images_uint8, out_hw=q).astype(compute_dtype)
    feats = vit.forward_features(params, x, vit_cfg,
                                 tp_mesh=tp_mesh)["x_norm_patchtokens"]
    B = images_uint8.shape[0]
    nh = q[0] // vit_cfg.patch_size
    nw = q[1] // vit_cfg.patch_size
    return feats.reshape(B, nh, nw, -1)


def make_build_step(cfg: Config, vit_cfg: vit.ViTConfig,
                    compute_dtype=jnp.float32):
    """Returns jitted (carry, params, rgb, depth, poses) -> (carry, stats)
    with carry = (state, prng_key).

    The PRNG key is threaded INSIDE the jitted step: any eager op between
    steps (even a key split) costs a full host<->device round trip, which
    dominates wall clock on tunneled/remote TPU deployments.
    """

    @functools.partial(jax.jit, donate_argnames=("carry",))
    def build_step(carry, params, rgb, depth, poses):
        state, key = carry
        key, sub = jax.random.split(key)
        patch = encode_patch_grid(params, rgb, vit_cfg, cfg, compute_dtype)
        state, stats = ingest_frames(
            state, rgb, depth, poses, patch.astype(jnp.float32), sub, cfg)
        return (state, key), stats

    return build_step


def make_query_step(cfg: Config, vit_cfg: vit.ViTConfig,
                    compute_dtype=jnp.float32):
    """Returns jitted (state, params, query_images_uint8, top_k, masks...)
    -> (positions, scores).  query images are e.g. diffusion samples for a
    text prompt (memory_2.py:570) or the goal image (imagenav)."""

    @functools.partial(jax.jit, static_argnames=("top_k", "use_region",
                                                 "use_floor"))
    def query_step(state: VoxelStoreState, params, images_uint8,
                   top_k: int = 100,
                   use_region: bool = False,
                   curr_grid: Optional[jnp.ndarray] = None,
                   region_radius: float = 0.0,
                   use_floor: bool = False,
                   floor_range: Optional[jnp.ndarray] = None):
        q = (cfg.query.query_height, cfg.query.query_width)
        x = vit.preprocess(images_uint8, out_hw=q).astype(compute_dtype)
        tokens = vit.forward_features(params, x, vit_cfg)["x_norm_patchtokens"]
        pooled = gaussian_center_pool(tokens)
        return localize(
            state, pooled, top_k=top_k, use_region=use_region,
            curr_grid=curr_grid, region_radius=region_radius,
            use_floor=use_floor, floor_range=floor_range)

    return query_step


def make_text_query_step(cfg: Config, vit_cfg: vit.ViTConfig,
                         imagination, compute_dtype=jnp.float32):
    """Fused text query: ONE jitted program for the whole
    text -> imagined images -> DINOv2 encode -> store localize path
    (reference two-stage flow memory_2.py:258-276 `imaginary` +
    :563-671 `voxel_localized`).

    The two-stage path decodes the diffusion samples, syncs them to
    host as uint8, re-uploads them, and dispatches a second program --
    on a tunneled TPU deployment that round trip measured ~270 ms of
    the text-query e2e (tools/textq_profile.py).  Tracing
    `imagination.imagine_core` together with the encoder and the store
    scan keeps the images on device and gives XLA one schedule to
    overlap the VAE decode tail with the encoder head.

    Returns (positions [K,3], scores [K], images [N,H,W,3] uint8); the
    images come back as device arrays the caller may materialize lazily
    (e.g. for the VLM verification stage) or drop unsynced.
    """
    core = imagination.imagine_core

    @functools.partial(jax.jit, static_argnames=("top_k", "use_region",
                                                 "use_floor"))
    def text_query_step(state: VoxelStoreState, vit_params, mmdit_params,
                        vae_params, text_params, t5_params,
                        ids, ids_uncond, t5_ids, t5_ids_uncond, key,
                        top_k: int = 100,
                        use_region: bool = False,
                        curr_grid: Optional[jnp.ndarray] = None,
                        region_radius: float = 0.0,
                        use_floor: bool = False,
                        floor_range: Optional[jnp.ndarray] = None):
        imgs = core(mmdit_params, vae_params, text_params, t5_params,
                    ids, ids_uncond, t5_ids, t5_ids_uncond, key)
        q = (cfg.query.query_height, cfg.query.query_width)
        x = vit.preprocess(imgs, out_hw=q).astype(compute_dtype)
        tokens = vit.forward_features(
            vit_params, x, vit_cfg)["x_norm_patchtokens"]
        pooled = gaussian_center_pool(tokens)
        positions, scores = localize(
            state, pooled, top_k=top_k, use_region=use_region,
            curr_grid=curr_grid, region_radius=region_radius,
            use_floor=use_floor, floor_range=floor_range)
        return positions, scores, imgs

    return text_query_step


def make_text_pool_step(cfg: Config, vit_cfg: vit.ViTConfig,
                        imagination, compute_dtype=jnp.float32):
    """First half of the SPLIT text query: imagination + DINOv2 encode
    + center-Gaussian pooling in ONE jit, returning (pooled [D] f32,
    images [N,H,W,3] uint8).  The second half is the store scan
    (`memory.query.localize`), a separate jitted program consuming the
    pooled vector DIRECTLY as a device array -- no host round trip (the
    handoff is one [D] vector that never leaves the device, unlike the
    uint8-image two-program path that paid ~280 ms).

    Why split instead of `make_text_query_step`: the single fused
    program with the full T5-XXL conditioning AND a production-size
    store scan exceeds what the TPU compile server survives
    (remote_compile HTTP 500, tpu_compile_helper exit 1 -- round-5
    bisection, tools/t5_compile_bisect.py: every strict subset of that
    program compiles, only the union dies).  Each half compiles in
    ~60 s; async dispatch chains them with ~1 ms of extra overhead.
    """
    core = imagination.imagine_core

    @jax.jit
    def text_pool_step(vit_params, mmdit_params, vae_params, text_params,
                       t5_params, ids, ids_uncond, t5_ids, t5_ids_uncond,
                       key):
        imgs = core(mmdit_params, vae_params, text_params, t5_params,
                    ids, ids_uncond, t5_ids, t5_ids_uncond, key)
        q = (cfg.query.query_height, cfg.query.query_width)
        x = vit.preprocess(imgs, out_hw=q).astype(compute_dtype)
        tokens = vit.forward_features(
            vit_params, x, vit_cfg)["x_norm_patchtokens"]
        return gaussian_center_pool(tokens), imgs

    return text_pool_step


def make_query_batch_step(cfg: Config, vit_cfg: vit.ViTConfig,
                          compute_dtype=jnp.float32):
    """Returns jitted (state, params, images_uint8 [Q, N, H, W, 3],
    top_k) -> (positions [Q, K, 3], scores [Q, K]): Q independent
    queries (N images each) encoded in one ViT dispatch and localized
    in one [VK, D] x [D, Q] store pass (the single-query scan is
    matvec-limited -- CLAUDE.md perf note; this amortizes the store
    read and the tunnel sync across all pending queries)."""

    @functools.partial(jax.jit, static_argnames=("top_k",))
    def query_batch_step(state: VoxelStoreState, params, images_uint8,
                         top_k: int = 100):
        Qn, Ni = images_uint8.shape[0], images_uint8.shape[1]
        q = (cfg.query.query_height, cfg.query.query_width)
        flat = images_uint8.reshape((Qn * Ni,) + images_uint8.shape[2:])
        x = vit.preprocess(flat, out_hw=q).astype(compute_dtype)
        tokens = vit.forward_features(
            params, x, vit_cfg)["x_norm_patchtokens"]
        grouped = tokens.reshape(Qn, Ni, tokens.shape[1], tokens.shape[2])
        pooled = jax.vmap(gaussian_center_pool)(grouped)
        return localize_batch(state, pooled, top_k=top_k)

    return query_batch_step


def token_similarity_map(params, query_img: jnp.ndarray,
                         ref_img: jnp.ndarray, vit_cfg: vit.ViTConfig,
                         cfg: Config) -> jnp.ndarray:
    """Patch-level cosine similarity between a query image's pooled
    token and every reference-image patch (reference matching2D,
    memory_2.py:278-295).  Returns [nh, nw] f32 for visualization via
    utils.visualize.render_token_matching."""
    q = (cfg.query.query_height, cfg.query.query_width)
    qx = vit.preprocess(query_img[None], out_hw=q)
    rx = vit.preprocess(ref_img[None], out_hw=q)
    qt = vit.forward_features(params, qx, vit_cfg)["x_norm_patchtokens"]
    rt = vit.forward_features(params, rx, vit_cfg)["x_norm_patchtokens"]
    qv = jnp.mean(qt[0], axis=0)
    qv = qv / jnp.maximum(jnp.linalg.norm(qv), 1e-12)
    rn = rt[0] / jnp.maximum(
        jnp.linalg.norm(rt[0], axis=-1, keepdims=True), 1e-12)
    sims = rn @ qv
    nh = q[0] // vit_cfg.patch_size
    nw = q[1] // vit_cfg.patch_size
    return sims.reshape(nh, nw)
