"""Query-side localization: query features -> top-K goal voxels.

TPU-native counterpart of the reference's HDF5 scan
(reference memory_2.py:563-671 `voxel_localized`): the entire
"pool query tokens -> cosine similarity over every stored token ->
per-voxel max -> region/floor masks -> top-K" pipeline is ONE XLA
program over the dense token store, instead of a batched h5py group
walk.  The big similarity contraction is a [V*K, D] x [D] matvec --
HBM-bandwidth-bound, ideal for the MXU at bf16.

Masks supported (matching reference semantics):
  - region radius around the agent's grid cell (memory_2.py:624-629);
  - floor height range (memory_2.py:633-640);
both are static-shape boolean masks, not dynamic filtering.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from bsc_nav_tpu.memory.store import VoxelStoreState
from bsc_nav_tpu.ops.similarity import max_cosine, max_cosine_per_voxel_batch

_HI = jax.lax.Precision.HIGHEST


def gaussian_center_pool(tokens: jnp.ndarray) -> jnp.ndarray:
    """Pool patch tokens with a center-weighted Gaussian over the patch
    grid, then average across query images (memory_2.py:591-608).

    tokens: [B, T, D] with T a square number.  Returns [D].
    """
    B, T, D = tokens.shape
    g = int(round(T ** 0.5))
    assert g * g == T, "token count must be a square patch grid"
    xs = jnp.tile(jnp.arange(g, dtype=jnp.float32), g)
    ys = jnp.repeat(jnp.arange(g, dtype=jnp.float32), g)
    center = (g - 1) / 2.0
    d2 = (xs - center) ** 2 + (ys - center) ** 2
    sigma = (g / 2.0) ** 2
    w = jnp.exp(-d2 / (2.0 * sigma))
    w = w / jnp.sum(w)
    pooled = jnp.einsum("btd,t->bd", tokens.astype(jnp.float32), w,
                        precision=_HI)
    return jnp.mean(pooled, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "use_region", "use_floor"),
)
def localize(
    state: VoxelStoreState,
    query: jnp.ndarray,                # [D] pooled query feature
    top_k: int = 100,
    use_region: bool = False,
    curr_grid: Optional[jnp.ndarray] = None,    # [3] int32 (r, c, h)
    region_radius: float = 0.0,
    use_floor: bool = False,
    floor_range: Optional[jnp.ndarray] = None,  # [2] int32 (min_h, max_h)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K most query-similar voxels.

    Returns (positions [top_k, 3] int32, scores [top_k] f32).  Scores of
    padding entries (fewer occupied voxels than top_k) are -inf.
    """
    V1 = state.feat_count.shape[0]

    qn = query.astype(jnp.float32)
    qn = qn / jnp.maximum(jnp.linalg.norm(qn), 1e-12)

    # fused one-pass scan: dot + norm-divide + count-mask + per-voxel
    # max without materializing [V1, K] (Pallas on TPU, jnp elsewhere;
    # int8 stores read half the bytes, scale cancels via int8-row norms)
    per_voxel = max_cosine(state.feats, state.feat_norm,
                           state.feat_count, qn)         # [V1]

    occupied = jnp.arange(V1) < state.num_voxels
    mask = occupied

    if use_region:
        d2 = jnp.sum(
            (state.slot_pos.astype(jnp.float32)
             - curr_grid.astype(jnp.float32)[None, :]) ** 2,
            axis=-1,
        )
        mask &= d2 <= region_radius * region_radius
    if use_floor:
        h = state.slot_pos[:, 2]
        mask &= (h >= floor_range[0]) & (h <= floor_range[1])

    per_voxel = jnp.where(mask, per_voxel, -jnp.inf)
    scores, idx = jax.lax.top_k(per_voxel, top_k)
    positions = state.slot_pos[idx]
    return positions, scores


@functools.partial(jax.jit,
                   static_argnames=("top_k", "use_floor", "use_region"))
def localize_batch(
    state: VoxelStoreState,
    queries: jnp.ndarray,              # [Q, D] pooled query features
    top_k: int = 100,
    use_floor: bool = False,
    floor_range: Optional[jnp.ndarray] = None,  # [2] int32 (min_h, max_h)
    use_region: bool = False,
    curr_grid: Optional[jnp.ndarray] = None,    # [Q, 3] int32 per query
    region_radii: Optional[jnp.ndarray] = None,  # [Q] f32 (inf = no mask)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K voxels for EVERY query in one store pass.

    The single-query scan is matvec-limited (one MXU column); this is a
    [VK, D] x [D, Q] matmul, so Q queries cost barely more than one --
    use it whenever more than one goal is localized against the same
    store (two-stage text+image retrieval, adaptive-region radius
    sweeps, batched episode farming).  Supports the single-floor height
    mask like `localize`, plus a PER-QUERY region mask (curr_grid [Q,3]
    + region_radii [Q]; an inf radius leaves that query unrestricted)
    so a growing-radius search (reference objnav_benchmark.py:1080-1100)
    is one device pass instead of one per radius.
    Returns (positions [Q, top_k, 3] int32, scores [Q, top_k] f32)."""
    V1 = state.feat_count.shape[0]
    qn = queries.astype(jnp.float32)
    qn = qn / jnp.maximum(
        jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)
    per_voxel = max_cosine_per_voxel_batch(
        state.feats, state.feat_norm, state.feat_count, qn)   # [Q, V1]
    mask = jnp.arange(V1)[None] < state.num_voxels
    if use_floor:
        h = state.slot_pos[:, 2]
        mask = mask & ((h >= floor_range[0])
                       & (h <= floor_range[1]))[None]
    if use_region:
        d2 = jnp.sum(
            (state.slot_pos.astype(jnp.float32)[None, :, :]
             - curr_grid.astype(jnp.float32)[:, None, :]) ** 2,
            axis=-1)                                          # [Q, V1]
        r2 = jnp.square(region_radii.astype(jnp.float32))[:, None]
        mask = mask & jnp.where(jnp.isfinite(r2), d2 <= r2, True)
    per_voxel = jnp.where(mask, per_voxel, -jnp.inf)
    scores, idx = jax.lax.top_k(per_voxel, top_k)
    return state.slot_pos[idx], scores
