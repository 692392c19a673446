"""Batched RGB-D frame ingestion into the voxel token store.

This replaces the reference's per-point Python loop (reference
memory_2.py:842-903, `obs2voxeltoken`) and its 50k-token HDF5 flush
(memory_2.py:326-358) with ONE vectorized XLA program over a batch of
frames.  All dynamic-occupancy behavior is expressed as masked,
deterministic scatters so the program is trace-once / run-many.

Sequential-semantics preservation: points carry a global ``order`` index
(frame-major); every conflict between points that touch the same voxel is
resolved exactly as the reference's sequential loop would:

  - first-touch voxel slot assignment == first occurrence in order
    (memory_2.py:888-894);
  - token cache: append while count < K in arrival order, then
    random-index replacement, later point wins a contested index
    (memory_2.py:345-354, dist-base policy);
  - top-down cv_map: highest (height, order) wins -- the reference's
    ``height >= max_height`` overwrite (memory_2.py:901-903);
  - RGB fusion: associative weighted sums (order-free).

Reference behavioral divergences (deliberate, documented):
  - the reference DROPS the token of the point that triggers the 50k
    flush (memory_2.py:880-881 else-branch) -- we don't replicate that
    off-by-one;
  - grid_rgb is accumulated in f32 sums, not re-quantized to uint8 per
    step;
  - replacement randomness uses a JAX PRNG key, not Python's `random`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from bsc_nav_tpu import geometry as G
from bsc_nav_tpu.config import Config
from bsc_nav_tpu.memory.store import VoxelStoreState, linear_voxel_id

_HI = jax.lax.Precision.HIGHEST


def points_per_frame(cfg: Config) -> int:
    """Static subsample count: ceil(H*W / depth_sample_rate)
    (reference memory_2.py:747-749 shuffles pixels then strides)."""
    hw = cfg.sensor.height * cfg.sensor.width
    return -(-hw // cfg.memory.depth_sample_rate)


def _select_pixels(key: jnp.ndarray, h: int, w: int, n: int) -> jnp.ndarray:
    """Random pixel subset of size n (flat indices).  The reference
    shuffles all H*W indices and strides (memory_2.py:747-749, i.e.
    uniform WITHOUT replacement); we sample WITH replacement -- O(n)
    instead of O(HW log HW) on device, and for n ~ HW/1000 a duplicate
    occurs once every few frames with no semantic effect (duplicates are
    processed like any two points hitting the same voxel)."""
    return jax.random.randint(key, (n,), 0, h * w, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def ingest_frames(
    state: VoxelStoreState,
    rgb: jnp.ndarray,          # [B, H, W, 3] uint8
    depth: jnp.ndarray,        # [B, H, W]    f32 (metres)
    poses: jnp.ndarray,        # [B, 7]       f32 (px,py,pz,qx,qy,qz,qw)
    patch_tokens: jnp.ndarray, # [B, nh, nw, D]
    key: jnp.ndarray,          # PRNG key
    cfg: Config,
) -> Tuple[VoxelStoreState, dict]:
    """Scatter a batch of frames into the store.  Returns (state, stats)."""

    B, H, W = depth.shape
    mem = cfg.memory
    Gs, Hc = mem.grid_size, mem.num_height_cells
    V, K, D = mem.voxel_capacity, mem.cache_size, mem.token_dim
    V1 = state.feat_count.shape[0]       # padded slot rows; garbage slot = V
    nh, nw = patch_tokens.shape[1], patch_tokens.shape[2]
    P = points_per_frame(cfg)
    N = B * P
    zmin, zmax = mem.zmin, mem.zmax

    # --- static transforms ------------------------------------------------
    base_tf = jnp.asarray(G.base_axes_transform(), jnp.float32)
    base2cam = jnp.asarray(
        G.base_to_cam_transform(cfg.sensor.sensor_height), jnp.float32
    )
    calib = jnp.asarray(
        G.camera_intrinsics(H, W, cfg.sensor.hfov_deg), jnp.float32
    )
    inv_calib = jnp.asarray(
        jnp.linalg.inv(calib), jnp.float32
    )
    patch_intr = jnp.asarray(G.patch_intrinsics(nh, nw), jnp.float32)

    # --- frame chain: initialize on the very first frame ever ------------
    inv_init = jnp.where(
        state.initialized,
        state.inv_init_base_tf,
        G.initial_base_inverse(poses[0].astype(jnp.float32), base_tf),
    )
    cam2world = jax.vmap(
        lambda p: G.camera_to_world_transform(
            p.astype(jnp.float32), inv_init, base_tf, base2cam
        )
    )(poses)                                            # [B, 4, 4]

    # --- point selection + backprojection ---------------------------------
    pix_keys = jax.random.split(key, B + 1)
    repl_key = pix_keys[0]
    pix = jax.vmap(lambda k: _select_pixels(k, H, W, P))(pix_keys[1:])  # [B,P]
    py_img = pix // W
    px_img = pix % W

    z = jnp.take_along_axis(
        depth.reshape(B, H * W), pix, axis=1
    ).astype(jnp.float32)                                # [B, P]
    uv1 = jnp.stack(
        [px_img.astype(jnp.float32) + 0.5,
         py_img.astype(jnp.float32) + 0.5,
         jnp.ones_like(z)],
        axis=-1,
    )                                                    # [B, P, 3]
    rays = jnp.einsum("bpj,ij->bpi", uv1, inv_calib, precision=_HI)
    p_local = rays * z[..., None]                        # camera-frame points
    valid = (z > cfg.sensor.min_depth) & (z < cfg.sensor.max_depth)

    p_world = jnp.einsum(
        "bpj,bij->bpi", p_local, cam2world[:, :3, :3], precision=_HI
    ) + cam2world[:, None, :3, 3]

    # --- voxel ids ---------------------------------------------------------
    rc = G.world_to_grid(p_world, Gs, mem.cell_size)     # [B, P, 3] (r, c, h)
    valid &= G.grid_in_range(rc, Gs, zmin, zmax)
    rc = rc.at[..., 2].add(-zmin)                        # shift h >= 0

    # --- patch-token lookup (memory_2.py:869-878) --------------------------
    ppx, ppy, _ = G.project_points(patch_intr, p_local)
    valid &= (ppx >= 0) & (ppy >= 0) & (ppx < nw) & (ppy < nh)
    ppx = jnp.clip(ppx, 0, nw - 1)
    ppy = jnp.clip(ppy, 0, nh - 1)
    token = jax.vmap(lambda t, y, x: t[y, x])(
        patch_tokens, ppy, ppx
    )                                                    # [B, P, D]

    rgb_v = jnp.take_along_axis(
        rgb.reshape(B, H * W, 3), pix[..., None], axis=1
    ).astype(jnp.float32)                                # [B, P, 3]

    radial_sq = jnp.sum(p_local * p_local, axis=-1)
    alpha = jnp.exp(-radial_sq / (2.0 * mem.alpha_sigma_sq))

    # --- flatten frame-major: order preserves sequential semantics --------
    rc = rc.reshape(N, 3)
    valid = valid.reshape(N)
    token = token.reshape(N, D)
    rgb_v = rgb_v.reshape(N, 3)
    alpha = alpha.reshape(N)
    radial_sq = radial_sq.reshape(N)
    order = jnp.arange(N, dtype=jnp.int32)

    lid = linear_voxel_id(rc, Gs, Hc)
    GARBAGE_LID = Gs * Gs * Hc                           # extra slot_map row
    lid = jnp.where(valid, lid, GARBAGE_LID)

    # ======================================================================
    # 1. first-touch slot assignment (reference memory_2.py:888-894)
    # ======================================================================
    looked = state.slot_map[lid]
    is_new = valid & (looked == -1)

    # find the FIRST (in arrival order) occurrence of each new voxel id:
    # sort by (lid, order); run heads have the minimal order of their run.
    sort_key = jnp.where(is_new, lid, jnp.int32(2**31 - 1))
    sorted_key, sorted_order = jax.lax.sort((sort_key, order), num_keys=2)
    live = sorted_key != jnp.int32(2**31 - 1)
    run_head = live & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    # back to point order: slots are handed out in ARRIVAL order, exactly
    # like the reference's max_id counter (memory_2.py:890-894)
    first_by_point = jnp.zeros((N,), bool).at[sorted_order].set(run_head)
    arrival_rank = jnp.cumsum(first_by_point.astype(jnp.int32)) - 1
    n_new_total = jnp.sum(first_by_point.astype(jnp.int32))

    new_slot = state.num_voxels + arrival_rank
    fits = first_by_point & (new_slot < V)
    scat_lid = jnp.where(fits, lid, GARBAGE_LID)
    slot_map = state.slot_map.at[scat_lid].set(
        jnp.where(fits, new_slot, -1), mode="drop"
    )
    # garbage row must stay -1 regardless
    slot_map = slot_map.at[GARBAGE_LID].set(-1)

    scat_slot = jnp.where(fits, new_slot, V)
    slot_pos = state.slot_pos.at[scat_slot].set(rc, mode="drop")

    num_voxels = jnp.minimum(state.num_voxels + n_new_total, V)
    dropped = state.dropped_voxels + jnp.maximum(
        state.num_voxels + n_new_total - V, 0
    )

    # re-gather: every valid point now has a slot (or -1 if over capacity)
    slot = slot_map[lid]
    valid &= slot >= 0
    slot_g = jnp.where(valid, slot, V)                   # garbage slot = V

    # ======================================================================
    # 2. RGB fusion: associative weighted sums (memory_2.py:888-899)
    # ======================================================================
    a = jnp.where(valid, alpha, 0.0)
    rgb_sum = state.rgb_sum.at[slot_g].add(a[:, None] * rgb_v)
    weight = state.weight.at[slot_g].add(a)

    # ======================================================================
    # 3. top-down cv_map: (height, order)-max wins (memory_2.py:901-903)
    # ======================================================================
    cell = jnp.where(valid, rc[:, 0] * Gs + rc[:, 1], Gs * Gs)
    ORD = N + 1
    packed = jnp.where(valid, (rc[:, 2] + 1) * ORD + order, -1)
    cell_best = jnp.full((Gs * Gs + 1,), -1, jnp.int32).at[cell].max(packed)
    won = valid & (packed == cell_best[cell]) & (rc[:, 2] >= state.max_height[cell])
    wcell = jnp.where(won, cell, Gs * Gs)
    cv_map = state.cv_map.at[wcell].set(
        jnp.clip(rgb_v, 0, 255).astype(jnp.uint8), mode="drop"
    )
    max_height = state.max_height.at[wcell].set(rc[:, 2], mode="drop")

    # ======================================================================
    # 4. token cache insert
    #    dist policy:     append-then-random-replace (memory_2.py:345-354)
    #    surprise policy: neighborhood-novelty gate + most-similar
    #                     replacement (memory_2.py:364-536; two-phase --
    #                     novelty is judged against the PRE-batch running
    #                     mean token of the 26 neighbor voxels)
    # ======================================================================
    tok_norm = jnp.sqrt(
        jnp.sum(token.astype(jnp.float32) ** 2, axis=-1)
    )
    cache_valid = valid
    feat_sum, feat_obs = state.feat_sum, state.feat_obs
    if mem.replacement == "surprise":
        r = mem.neighbor_radius
        offs = jnp.asarray(
            [(dr, dc, dh)
             for dr in range(-r, r + 1)
             for dc in range(-r, r + 1)
             for dh in range(-r, r + 1)
             if (dr, dc, dh) != (0, 0, 0)], jnp.int32)       # [26, 3]
        nrc = rc[:, None, :] + offs[None]                    # [N, 26, 3]
        n_ok = (
            (nrc[..., 0] >= 0) & (nrc[..., 0] < Gs)
            & (nrc[..., 1] >= 0) & (nrc[..., 1] < Gs)
            & (nrc[..., 2] >= 0) & (nrc[..., 2] < Hc)
        )
        nlid = jnp.where(n_ok, linear_voxel_id(nrc, Gs, Hc), GARBAGE_LID)
        nslot = jnp.where(slot_map[nlid] >= 0, slot_map[nlid], V)
        if mem.surprise_exact:
            # exact reference semantics (memory_2.py:375-384): min cosine
            # distance against EVERY cached token of every neighbor,
            # chunked so the [chunk, 26, K, D] gather stays bounded
            CH = 512
            n_pad = (-N) % CH
            nslot_p = jnp.pad(nslot, ((0, n_pad), (0, 0)),
                              constant_values=V)
            n_ok_p = jnp.pad(n_ok, ((0, n_pad), (0, 0)))
            token_p = jnp.pad(token.astype(jnp.float32),
                              ((0, n_pad), (0, 0)))
            tok_norm_p = jnp.pad(tok_norm, (0, n_pad))

            def chunk_surprise(args):
                ns, ok, tk, tn = args          # [CH,26],[CH,26],[CH,D],[CH]
                rows = ns[:, :, None] * K + jnp.arange(K)[None, None, :]
                nf = state.feats[rows].astype(jnp.float32)   # [CH,26,K,D]
                nn = state.feat_norm[rows]                   # [CH,26,K]
                km = (jnp.arange(K)[None, None, :]
                      < state.feat_count[ns][:, :, None])
                cos = jnp.einsum("cnkd,cd->cnk", nf, tk, precision=_HI)
                cos = cos / jnp.maximum(nn * tn[:, None, None], 1e-12)
                cd = jnp.where(ok[:, :, None] & km, 1.0 - cos, jnp.inf)
                return jnp.min(cd, axis=(1, 2))

            surprise = jax.lax.map(
                chunk_surprise,
                (nslot_p.reshape(-1, CH, offs.shape[0]),
                 n_ok_p.reshape(-1, CH, offs.shape[0]),
                 token_p.reshape(-1, CH, D),
                 tok_norm_p.reshape(-1, CH))).reshape(-1)[:N]
        else:
            n_obs = feat_obs[nslot]                          # pre-batch
            n_ok &= n_obs > 0
            n_mean = feat_sum[nslot] / jnp.maximum(n_obs, 1.0)[..., None]
            n_mean_norm = jnp.linalg.norm(n_mean, axis=-1)
            cos = jnp.einsum("nkd,nd->nk", n_mean,
                             token.astype(jnp.float32), precision=_HI)
            cos = cos / jnp.maximum(n_mean_norm * tok_norm[:, None], 1e-12)
            cos_dist = jnp.where(n_ok, 1.0 - cos, jnp.inf)
            surprise = jnp.min(cos_dist, axis=-1)
        existed_before = looked >= 0
        cache_valid = valid & (
            ~existed_before | (surprise > mem.surprise_threshold))
        # running statistics updated with every valid observation
        feat_sum = feat_sum.at[slot_g].add(token.astype(jnp.float32))
        feat_obs = feat_obs.at[slot_g].add(valid.astype(jnp.float32))

    # arrival rank of each inserting point within its voxel this batch
    skey = jnp.where(cache_valid, slot, jnp.int32(2**31 - 1))
    s_sorted, o_sorted, idx_sorted = jax.lax.sort(
        (skey, order, order), num_keys=2
    )
    s_live = s_sorted != jnp.int32(2**31 - 1)
    s_first = s_live & jnp.concatenate(
        [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]]
    )
    pos_in_sort = jnp.arange(N, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(s_first, pos_in_sort, -1))
    s_rank = pos_in_sort - run_start                     # rank within voxel run
    # scatter rank back to point order
    rank_by_point = jnp.zeros((N,), jnp.int32).at[idx_sorted].set(s_rank)

    pos_k = state.feat_count[slot_g] + rank_by_point
    if mem.replacement == "surprise":
        # replace the cached token MOST similar to the incoming one
        # (memory_2.py:459-465); cache rows live at slot*K + k
        rows = slot_g[:, None] * K + jnp.arange(K)[None, :]  # [N, K]
        cached = state.feats[rows].astype(jnp.float32)       # [N, K, D]
        csim = jnp.einsum("nkd,nd->nk", cached,
                          token.astype(jnp.float32), precision=_HI)
        csim = csim / jnp.maximum(
            state.feat_norm[rows] * tok_norm[:, None], 1e-12)
        kmask = (jnp.arange(K)[None, :] < state.feat_count[slot_g][:, None])
        repl_idx = jnp.argmax(
            jnp.where(kmask, csim, -jnp.inf), axis=-1).astype(jnp.int32)
    else:
        repl_idx = jax.random.randint(repl_key, (N,), 0, K, dtype=jnp.int32)
    write_k = jnp.where(pos_k < K, pos_k, repl_idx)

    # NOTE: scatters use 2D (slot, k) indices on the original arrays --
    # a reshape->scatter->reshape chain defeats XLA's in-place aliasing
    # of the donated store and copies the multi-GB token buffer
    # (measured 91 ms vs 5.5 ms per batch at 2^18 capacity).
    target = jnp.where(cache_valid, slot_g * K + write_k, V1 * K)
    cache_best = (
        jnp.full((V1 * K + 1,), -1, jnp.int32).at[target].max(order)
    )
    cache_won = cache_valid & (cache_best[target] == order)
    # flat cache row; V1*K = out of bounds -> dropped by scatter mode
    wrow = jnp.where(cache_won, slot_g * K + write_k, V1 * K)

    feat_scale = state.feat_scale
    if state.feats.dtype == jnp.int8:
        # per-token absmax quantization; the scale cancels in cosine
        # similarity so feat_norm stores the INT8 row norm directly
        absmax = jnp.max(jnp.abs(token.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(token.astype(jnp.float32)
                               / scale[:, None]), -127, 127)
        stored = q.astype(jnp.int8)
        tok_norm = jnp.sqrt(jnp.sum(q * q, axis=-1))
        feat_scale = feat_scale.at[wrow].set(scale, mode="drop")
    else:
        stored = token.astype(state.feats.dtype)

    feats = state.feats.at[wrow].set(stored, mode="drop")
    feat_norm = state.feat_norm.at[wrow].set(tok_norm, mode="drop")
    feat_dist = state.feat_dist.at[wrow].set(radial_sq, mode="drop")

    inserted = jnp.zeros((V1,), jnp.int32).at[
        jnp.where(cache_valid, slot_g, V)].add(
        cache_valid.astype(jnp.int32)
    )
    feat_count = jnp.minimum(state.feat_count + inserted, K)

    new_state = state.replace(
        feat_scale=feat_scale,
        feat_sum=feat_sum,
        feat_obs=feat_obs,
        feats=feats,
        feat_norm=feat_norm,
        feat_dist=feat_dist,
        feat_count=feat_count,
        rgb_sum=rgb_sum,
        weight=weight,
        slot_pos=slot_pos,
        slot_map=slot_map,
        num_voxels=num_voxels,
        dropped_voxels=dropped,
        cv_map=cv_map,
        max_height=max_height,
        inv_init_base_tf=inv_init,
        initialized=jnp.ones((), jnp.bool_),
    )
    stats = {
        "points_valid": jnp.sum(valid),
        "new_voxels": n_new_total,
        "num_voxels": num_voxels,
        "dropped_voxels": dropped,
    }
    return new_state, stats
