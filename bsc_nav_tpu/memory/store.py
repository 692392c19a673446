"""Device-resident voxel token store.

TPU-native re-architecture of the reference's spatial memory state
(reference memory_2.py:708-722 `_init_cache` + the HDF5 voxel-group store,
memory_2.py:330-354):

  - The reference keeps TWO sparse structures keyed by voxel: a dense
    ``occupied_ids`` int32 map -> RGB point ids, and ragged HDF5 groups
    ``grid_{r}_{c}_{h}`` -> per-voxel token caches.  Both are populated
    under the same per-point validity guard (memory_2.py:878-899), so the
    voxel sets are identical.  Here they are unified: one flat
    ``slot_map`` (linearized voxel id -> slot) indexes a single dense,
    capacity-bounded slot table carrying RGB fusion state AND the token
    cache.  Static shapes => one compiled XLA program for ingest/query.

  - Every array carries one extra "garbage" row (index ``capacity``) so
    masked scatters can redirect invalid points without dynamic shapes.

  - RGB fusion stores exact weighted sums (f32) instead of the reference's
    per-step uint8-quantized running mean (memory_2.py:896-899); the
    weighted running mean is associative, so the exported uint8 color is
    the numerically-cleaner equivalent of the reference's sequential
    accumulation.

Capacity bounds (``MemoryConfig.voxel_capacity``) replace the reference's
unbounded HDF5 growth; overflow voxels are counted in ``dropped_voxels``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from bsc_nav_tpu.config import MemoryConfig


@struct.dataclass
class VoxelStoreState:
    """All device-side memory state.  Shapes are static given a config.

    V = voxel_capacity, K = cache_size, D = token_dim, G = grid_size,
    H = num_height_cells.  Arrays sized V+1 / G*G+1 / ... include one
    trailing garbage row for masked scatters.
    """

    # --- token cache (reference: HDF5 groups, memory_2.py:330-354) ------
    # FLAT layout [V1*K, D]: a [V, K=10, D] rank-3 array would be
    # physically padded by the TPU tiler to [V, 16, D] (+60% HBM and
    # query bandwidth); the flat layout pads only to the row tile.
    # Token index (slot, k) lives at row slot*K + k.
    # feats dtype options: f32 / bf16, or int8 with per-token absmax
    # scales in feat_scale (the reference quantizes its biggest model to
    # NF4 to fit VRAM, memory_2.py:542-560; here the HBM-bound object is
    # the token store, and the per-token scale cancels in cosine
    # similarity so query quality costs only the rounding error)
    feats: jnp.ndarray        # [V1*K, D] store dtype
    feat_norm: jnp.ndarray    # [V1*K] f32   (||stored token|| for cosine)
    feat_scale: jnp.ndarray   # [V1*K | 1] f32 (int8 dequant scales)
    feat_dist: jnp.ndarray    # [V1*K] f32   (squared radial distance)
    feat_count: jnp.ndarray   # [V+1]    int32 (tokens held, <= K)

    # --- per-voxel RGB fusion (reference: grid_rgb/weight, :888-899) ----
    rgb_sum: jnp.ndarray      # [V+1, 3] f32   (sum of alpha * rgb)
    weight: jnp.ndarray       # [V+1]    f32   (sum of alpha)
    slot_pos: jnp.ndarray     # [V+1, 3] int32 (voxel row, col, h-shifted)

    # --- indexing --------------------------------------------------------
    slot_map: jnp.ndarray     # [G*G*H + 1] int32 (linear voxel id -> slot, -1 empty)
    num_voxels: jnp.ndarray   # []  int32
    dropped_voxels: jnp.ndarray  # [] int32 (capacity overflow)

    # --- top-down maps (reference: cv_map/max_height, :98-99, :901-903) -
    cv_map: jnp.ndarray       # [G*G + 1, 3] uint8
    max_height: jnp.ndarray   # [G*G + 1] int32 (-1 = unobserved)

    # --- surprise-policy statistics (running token mean per voxel;
    # size-1 dummies under the dist policy) --------------------------------
    feat_sum: jnp.ndarray     # [V+1 | 1, D] f32
    feat_obs: jnp.ndarray     # [V+1 | 1]    f32 (observation count)

    # --- frame chain (reference: inv_init_base_tf, memory_2.py:844-847) -
    inv_init_base_tf: jnp.ndarray  # [4, 4] f32
    initialized: jnp.ndarray       # [] bool


def linear_voxel_id(rc: jnp.ndarray, grid_size: int, num_h: int) -> jnp.ndarray:
    """(row, col, h-shifted) -> flat id in [0, G*G*H)."""
    return (rc[..., 0] * grid_size + rc[..., 1]) * num_h + rc[..., 2]


def padded_rows(cfg: MemoryConfig) -> int:
    """Slot-table row count: capacity + garbage row, padded to a multiple
    of 8 so the capacity axis divides evenly across a model-parallel mesh
    axis (parallel/mesh.py).  Rows in [capacity, padded) are never
    assigned; row ``capacity`` is the masked-scatter garbage target."""
    return ((cfg.voxel_capacity + 1 + 7) // 8) * 8


def init_store(cfg: MemoryConfig, store_dtype=jnp.float32) -> VoxelStoreState:
    K, D = cfg.cache_size, cfg.token_dim
    G, H = cfg.grid_size, cfg.num_height_cells
    V1 = padded_rows(cfg)
    is_int8 = jnp.dtype(store_dtype) == jnp.int8
    return VoxelStoreState(
        feats=jnp.zeros((V1 * K, D), store_dtype),
        feat_norm=jnp.zeros((V1 * K,), jnp.float32),
        feat_scale=jnp.zeros((V1 * K if is_int8 else 1,), jnp.float32),
        feat_dist=jnp.zeros((V1 * K,), jnp.float32),
        feat_count=jnp.zeros((V1,), jnp.int32),
        rgb_sum=jnp.zeros((V1, 3), jnp.float32),
        weight=jnp.zeros((V1,), jnp.float32),
        slot_pos=jnp.zeros((V1, 3), jnp.int32),
        slot_map=jnp.full((G * G * H + 1,), -1, jnp.int32),
        num_voxels=jnp.zeros((), jnp.int32),
        dropped_voxels=jnp.zeros((), jnp.int32),
        cv_map=jnp.zeros((G * G + 1, 3), jnp.uint8),
        max_height=jnp.full((G * G + 1,), -1, jnp.int32),
        feat_sum=jnp.zeros(
            (V1 if cfg.replacement == "surprise" else 1, D), jnp.float32),
        feat_obs=jnp.zeros(
            (V1 if cfg.replacement == "surprise" else 1,), jnp.float32),
        inv_init_base_tf=jnp.eye(4, dtype=jnp.float32),
        initialized=jnp.zeros((), jnp.bool_),
    )


@jax.jit
def quantize_feat_rows(feats: jnp.ndarray, feat_norm: jnp.ndarray):
    """[VK, D] float token rows -> (int8 rows, int8-row norms, scales).

    Per-row symmetric absmax int8 (the int8-ingest convention,
    memory/ingest.py:352-362): cosine over the QUANTIZED rows is exact
    because the per-row scale cancels, so feat_norm must hold the
    int8-row norm.  Elementwise round/clip/cast fuses into one HBM
    pass; no f32 copy materializes."""
    f = feats.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(f), axis=-1)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(f / scale[:, None]), -127, 127)
    qi = q.astype(jnp.int8)
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1))
    # rows never written keep norm 0 (masked_norms drops by count; the
    # guard keeps exports/debug views clean)
    norm = jnp.where(feat_norm > 0, norm, 0.0)
    return qi, norm.astype(jnp.float32), scale.astype(jnp.float32)


def quantize_store(state: VoxelStoreState) -> VoxelStoreState:
    """Convert a live f32/bf16 store to the int8 store layout in place
    (query side is dtype-agnostic: ops/quant-style int8 rows with
    per-row scales, scores cosine-EXACT over the quantized rows).

    Built for the text-query phase's memory budget: a 16 GB chip cannot
    hold the bf16 production store (6.2 GB) next to the full SD3.5
    triple-encoder conditioning stack (~9.4 GB with int8 T5-XXL), but
    the int8 store (3.1 GB) fits.  Further ingest into the returned
    state keeps working (int8 ingest path).  No-op on int8 stores."""
    if state.feats.dtype == jnp.int8:
        return state
    qi, norm, scale = quantize_feat_rows(state.feats, state.feat_norm)
    return state.replace(feats=qi, feat_norm=norm, feat_scale=scale)


def store_nbytes(cfg: MemoryConfig, store_dtype=jnp.float32) -> int:
    """Approximate device footprint of a store with this config."""
    V, K, D = padded_rows(cfg), cfg.cache_size, cfg.token_dim
    G, H = cfg.grid_size, cfg.num_height_cells
    itemsize = jnp.dtype(store_dtype).itemsize
    return (
        V * K * D * itemsize        # feats (flat layout, no K padding)
        + V * K * 8                 # feat_norm + feat_dist
        + V * (4 + 12 + 4 + 12)     # count, rgb_sum, weight, slot_pos
        + (G * G * H + 1) * 4       # slot_map
        + (G * G + 1) * 7           # cv_map + max_height
    )


def occupied_positions(state: VoxelStoreState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(positions [V+1,3], valid mask [V+1]) of occupied slots."""
    V1 = state.slot_pos.shape[0]
    valid = jnp.arange(V1) < state.num_voxels
    return state.slot_pos, valid


def token_cache_view(state: VoxelStoreState):
    """(feats [V1, K, D], norms [V1, K], dists [V1, K]) reshaped views of
    the flat store (host-side/occasional use; reshape is a relayout)."""
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    D = state.feats.shape[1]
    return (state.feats.reshape(V1, K, D),
            state.feat_norm.reshape(V1, K),
            state.feat_dist.reshape(V1, K))


def dequantized_feats(state: VoxelStoreState) -> jnp.ndarray:
    """Token cache as f32 [V1, K, D] (identity for float stores,
    scale-applied for int8 stores) -- export/reload path."""
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    D = state.feats.shape[1]
    f = state.feats.astype(jnp.float32)
    if state.feats.dtype == jnp.int8:
        f = f * state.feat_scale[:, None]
    return f.reshape(V1, K, D)


def fused_rgb(state: VoxelStoreState) -> jnp.ndarray:
    """Weighted-mean color per slot as uint8 (export form of the
    reference's grid_rgb, memory_2.py:896-899)."""
    w = jnp.maximum(state.weight, 1e-12)[:, None]
    return jnp.clip(state.rgb_sum / w, 0, 255).astype(jnp.uint8)
