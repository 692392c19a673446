"""Serialization of the voxel store in the reference's on-disk contract.

Write/read the exact bundle the reference produces per scene
(reference memory_2.py:1074-1083 `create_memory` epilogue, read back by
`load_memory` memory_2.py:187-256):

  feat.h5df          HDF5 groups ``grid_{r}_{c}_{h}`` with datasets
                     ``features`` [n, D] f32 and ``distances`` [n] f32
  grid_rgb_pos.npy   int32 [max_id, 3] voxel indices
  grid_rgb.npy       uint8 [max_id, 3] fused colors
  weight.npy         f32   [max_id]
  occupied_ids.npy   int32 [G, G, H] voxel -> point id (-1 empty)
  max_id.npy         scalar
  original_pos.npy   agent origin position [3]
  map_height.npy     [minh, maxh]
  base_height.npy    agent heights sampled during mapping
  long_memory.json   [{label, loc: [r,c,h], confidence}, ...]

A faster native snapshot (single .npz of the dense store) is also
provided for intra-framework checkpointing.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import h5py
import numpy as np
import jax.numpy as jnp

from bsc_nav_tpu.config import MemoryConfig
from bsc_nav_tpu.memory.store import (
    VoxelStoreState,
    dequantized_feats,
    fused_rgb,
    init_store,
    linear_voxel_id,
)


def save_reference_format(
    state: VoxelStoreState,
    path: str,
    cfg: MemoryConfig,
    original_pos: Sequence[float],
    base_height: Sequence[float] = (),
    long_memory: Optional[List[dict]] = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    n = int(state.num_voxels)
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    pos = np.asarray(state.slot_pos)[:n]
    counts = np.asarray(state.feat_count)[:n]
    feats = np.asarray(dequantized_feats(state), dtype=np.float32)[:n]
    dists = np.asarray(state.feat_dist).reshape(V1, K)[:n]

    with h5py.File(os.path.join(path, "feat.h5df"), "w") as h5f:
        for i in range(n):
            k = int(counts[i])
            if k == 0:
                continue
            g = h5f.create_group(f"grid_{pos[i,0]}_{pos[i,1]}_{pos[i,2]}")
            g.create_dataset("features", data=feats[i, :k],
                             maxshape=(None, feats.shape[-1]), chunks=True)
            g.create_dataset("distances", data=dists[i, :k],
                             maxshape=(None,), chunks=True)

    np.save(os.path.join(path, "grid_rgb_pos.npy"), pos.astype(np.int32))
    np.save(os.path.join(path, "grid_rgb.npy"), np.asarray(fused_rgb(state))[:n])
    np.save(os.path.join(path, "weight.npy"),
            np.asarray(state.weight, dtype=np.float32)[:n])
    G, H = cfg.grid_size, cfg.num_height_cells
    occ = np.asarray(state.slot_map)[: G * G * H].reshape(G, G, H)
    np.save(os.path.join(path, "occupied_ids.npy"), occ.astype(np.int32))
    np.save(os.path.join(path, "max_id.npy"), np.array(n))
    np.save(os.path.join(path, "original_pos.npy"),
            np.asarray(original_pos, dtype=np.float32))
    np.save(os.path.join(path, "map_height.npy"),
            np.array([cfg.zmin, cfg.zmax]))
    np.save(os.path.join(path, "base_height.npy"),
            np.asarray(list(base_height), dtype=np.float64))
    with open(os.path.join(path, "long_memory.json"), "w") as f:
        json.dump(long_memory or [], f, indent=4)


def load_reference_format(path: str, cfg: MemoryConfig,
                          store_dtype=jnp.float32):
    """Rebuild a device store from a reference-format bundle.

    Returns (state, meta) with meta = dict(original_pos, base_height,
    long_memory, map_height)."""
    n = int(np.load(os.path.join(path, "max_id.npy")))
    if n > cfg.voxel_capacity:
        raise ValueError(
            f"memory at {path} has {n} voxels > capacity {cfg.voxel_capacity}")
    pos = np.load(os.path.join(path, "grid_rgb_pos.npy"))
    rgb = np.load(os.path.join(path, "grid_rgb.npy"))
    weight = np.load(os.path.join(path, "weight.npy"))
    occ = np.load(os.path.join(path, "occupied_ids.npy"))
    minh, maxh = np.load(os.path.join(path, "map_height.npy"))

    if (int(minh), int(maxh)) != (cfg.zmin, cfg.zmax):
        raise ValueError(
            f"height range mismatch: disk ({minh},{maxh}) vs cfg "
            f"({cfg.zmin},{cfg.zmax})")

    state = init_store(cfg, store_dtype=store_dtype)
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    D = state.feats.shape[1]
    G, H = cfg.grid_size, cfg.num_height_cells

    feats = np.zeros((V1, K, D), np.float32)
    dists = np.zeros((V1, K), np.float32)
    counts = np.zeros((V1,), np.int32)

    # map (r, c, h) -> slot using the saved point ids so slot numbering is
    # identical to the producing run
    slot_of = {tuple(pos[i]): i for i in range(n)}
    with h5py.File(os.path.join(path, "feat.h5df"), "r") as h5f:
        for name in h5f:
            if not name.startswith("grid_"):
                continue
            _, r, c, h = name.split("_")
            key = (int(r), int(c), int(h))
            s = slot_of.get(key)
            if s is None:
                continue  # token voxel without RGB point: impossible in
                          # the producing pipeline, skip defensively
            f = np.asarray(h5f[name]["features"], np.float32)
            d = np.asarray(h5f[name]["distances"], np.float32)
            k = min(len(f), K)
            feats[s, :k] = f[:k]
            dists[s, :k] = d[:k]
            counts[s] = k

    slot_map = np.full((G * G * H + 1,), -1, np.int32)
    slot_map[: G * G * H] = occ.reshape(-1)

    rgb_sum = np.zeros((V1, 3), np.float32)
    w = np.zeros((V1,), np.float32)
    w[:n] = weight
    rgb_sum[:n] = rgb.astype(np.float32) * weight[:, None]
    slot_pos = np.zeros((V1, 3), np.int32)
    slot_pos[:n] = pos

    if jnp.dtype(store_dtype) == jnp.int8:
        absmax = np.maximum(np.abs(feats).max(axis=-1), 1e-12)
        scale = absmax / 127.0
        q = np.clip(np.round(feats / scale[..., None]), -127, 127)
        feats_store = q.astype(np.int8)
        norms = np.linalg.norm(q, axis=-1)
        state = state.replace(
            feat_scale=jnp.asarray(scale.reshape(V1 * K), jnp.float32))
    else:
        feats_store = feats
        norms = np.linalg.norm(feats, axis=-1)

    state = state.replace(
        feats=jnp.asarray(feats_store.reshape(V1 * K, D), store_dtype),
        feat_norm=jnp.asarray(norms.reshape(V1 * K)),
        feat_dist=jnp.asarray(dists.reshape(V1 * K)),
        feat_count=jnp.asarray(counts),
        rgb_sum=jnp.asarray(rgb_sum),
        weight=jnp.asarray(w),
        slot_pos=jnp.asarray(slot_pos),
        slot_map=jnp.asarray(slot_map),
        num_voxels=jnp.asarray(n, jnp.int32),
        initialized=jnp.ones((), jnp.bool_),
    )

    meta = {
        "original_pos": np.load(os.path.join(path, "original_pos.npy")),
        "base_height": np.load(os.path.join(path, "base_height.npy")),
        "map_height": (int(minh), int(maxh)),
    }
    lm_path = os.path.join(path, "long_memory.json")
    with open(lm_path) as f:
        meta["long_memory"] = json.load(f)
    return state, meta


# --- fast native snapshot ---------------------------------------------------

def _np_savable(a: np.ndarray) -> np.ndarray:
    """numpy serializes ml_dtypes bfloat16 as opaque 'V2' (unloadable);
    store such arrays as f32 and restore the dtype on load."""
    if a.dtype.kind == "V" or a.dtype.name == "bfloat16":
        return a.astype(np.float32)
    return a


def save_npz(state: VoxelStoreState, path: str, **extra) -> None:
    """Single-file dense snapshot (much faster than the per-group HDF5
    contract; intra-framework checkpoint format).  Includes the
    surprise-policy statistics (feat_sum/feat_obs) so the novelty gate
    survives a snapshot boundary."""
    n = int(state.num_voxels)
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    np.savez_compressed(
        path,
        num_voxels=n,
        feats=_np_savable(np.asarray(state.feats)[:n * K]),
        feat_norm=np.asarray(state.feat_norm)[:n * K],
        feat_scale=np.asarray(state.feat_scale)[
            :n * K if state.feat_scale.shape[0] > 1 else 1],
        feat_dist=np.asarray(state.feat_dist)[:n * K],
        feat_count=np.asarray(state.feat_count)[:n],
        rgb_sum=np.asarray(state.rgb_sum)[:n],
        weight=np.asarray(state.weight)[:n],
        slot_pos=np.asarray(state.slot_pos)[:n],
        cv_map=np.asarray(state.cv_map),
        max_height=np.asarray(state.max_height),
        inv_init_base_tf=np.asarray(state.inv_init_base_tf),
        initialized=np.asarray(state.initialized),
        dropped_voxels=np.asarray(state.dropped_voxels),
        feat_sum=np.asarray(state.feat_sum)[
            :n + 1 if state.feat_sum.shape[0] > 1 else 1],
        feat_obs=np.asarray(state.feat_obs)[
            :n + 1 if state.feat_obs.shape[0] > 1 else 1],
        **extra,
    )


def load_npz(path: str, cfg: MemoryConfig, store_dtype=jnp.float32):
    z = np.load(path, allow_pickle=False)
    n = int(z["num_voxels"])
    state = init_store(cfg, store_dtype=store_dtype)
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    G, H = cfg.grid_size, cfg.num_height_cells

    def fill(name, arr):
        buf = np.asarray(arr)
        out = np.asarray(getattr(state, name)).copy()
        out[:len(buf)] = buf
        return jnp.asarray(out)

    pos = np.asarray(z["slot_pos"])
    slot_map = np.full((G * G * H + 1,), -1, np.int32)
    lin = (pos[:, 0].astype(np.int64) * G + pos[:, 1]) * H + pos[:, 2]
    slot_map[lin] = np.arange(n, dtype=np.int32)

    scale_arr = z["feat_scale"] if "feat_scale" in z else None
    if scale_arr is not None and scale_arr.shape[0] > 1:
        state = state.replace(feat_scale=fill("feat_scale", scale_arr))
    if "feat_sum" in z and z["feat_sum"].shape[0] > 1 \
            and state.feat_sum.shape[0] > 1:
        state = state.replace(feat_sum=fill("feat_sum", z["feat_sum"]),
                              feat_obs=fill("feat_obs", z["feat_obs"]))
    if "dropped_voxels" in z:
        state = state.replace(
            dropped_voxels=jnp.asarray(z["dropped_voxels"]))
    state = state.replace(
        feats=fill("feats", z["feats"]).astype(store_dtype),
        feat_norm=fill("feat_norm", z["feat_norm"]),
        feat_dist=fill("feat_dist", z["feat_dist"]),
        feat_count=fill("feat_count", z["feat_count"]),
        rgb_sum=fill("rgb_sum", z["rgb_sum"]),
        weight=fill("weight", z["weight"]),
        slot_pos=fill("slot_pos", z["slot_pos"]),
        slot_map=jnp.asarray(slot_map),
        num_voxels=jnp.asarray(n, jnp.int32),
        cv_map=jnp.asarray(z["cv_map"]),
        max_height=jnp.asarray(z["max_height"]),
        inv_init_base_tf=jnp.asarray(z["inv_init_base_tf"]),
        initialized=jnp.asarray(z["initialized"]),
    )
    return state
