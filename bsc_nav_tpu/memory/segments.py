"""Segmented voxel store: scenes larger than one store's capacity.

SURVEY hard-parts list: "HDF5-equivalent streaming when a scene's token
store exceeds HBM".  The reference streams 50k-token chunks to disk and
scans HDF5 groups per query (memory_2.py:109, :623-667).  Here the unit
of growth is a whole capacity-bounded store SEGMENT:

  - ingest always targets the ACTIVE segment; when it nears capacity the
    segment is frozen and a fresh one started (the frame chain, top-down
    maps and the frozen segments' contents are carried forward);
  - the newest frozen segments stay device-resident; older ones spill to
    host RAM and are streamed back through the device at query time;
  - a query runs localize on every segment and merges candidates by
    voxel position (max score wins -- a voxel revisited after a rotation
    legitimately appears in several segments).

This trades query latency (one extra pass per spilled segment) for
unbounded scene size, exactly like the reference's disk-backed scan but
batched and device-side.

Measured policy (tools/segments_bench.py, TPU v5e behind the axon
tunnel, r4): a device-resident frozen segment adds ~63 ms/query; a
HOST-SPILLED segment adds ~41 s/query and ~80 s at spill time, because
the tunnel moves 0.03-0.04 GB/s (a direct-attached host's multi-GB/s
DMA would make the same spill ~100-500 ms).  Frozen segments are
therefore quantized to int8 ON DEVICE at rotation by default
(freeze_dtype="int8"): cosine stays exact over the quantized rows (the
per-row scale cancels; feat_norm becomes the int8-row norm, same
convention as the int8 active store, memory/ingest.py:352-362), HBM per
frozen segment halves, and spill — when it does happen — moves half the
bytes.  Spill remains the unbounded-scene escape hatch, not the fast
path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu.config import MemoryConfig
from bsc_nav_tpu.memory import query as Q
from bsc_nav_tpu.memory.store import VoxelStoreState, init_store


# per-row absmax int8 quantization shared with the live-store converter
# (store.quantize_feat_rows; frozen segments and the text-query phase
# use the same cosine-exact convention)
from bsc_nav_tpu.memory.store import quantize_feat_rows as _quantize_rows  # noqa: E402


def _freeze(state: VoxelStoreState) -> dict:
    """Query-relevant slices of a full segment (host numpy)."""
    n = int(state.num_voxels)
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    return {
        "feats": np.asarray(state.feats[: n * K]),
        "feat_norm": np.asarray(state.feat_norm[: n * K]),
        "feat_count": np.asarray(state.feat_count[:n]),
        "slot_pos": np.asarray(state.slot_pos[:n]),
        "n": n, "K": K,
    }


class SegmentedStore:
    """Manages one active store + frozen segments.

    Use `state` for ingest (reassign after each build step), call
    `rotate_if_full()` between batches, and `localize()` for queries.
    """

    def __init__(self, cfg: MemoryConfig, store_dtype=jnp.float32,
                 max_device_segments: int = 2,
                 rotate_at: float = 0.95,
                 freeze_dtype="int8"):
        self.cfg = cfg
        self.store_dtype = store_dtype
        self.max_device_segments = max_device_segments
        self.rotate_threshold = int(cfg.voxel_capacity * rotate_at)
        # "int8": quantize frozen segments on device (half HBM + half
        # spill bytes, cosine exact over quantized rows — the measured
        # TPU policy, module docstring); None: freeze in store_dtype
        self.freeze_dtype = freeze_dtype
        self.state = init_store(cfg, store_dtype=store_dtype)
        self.device_segments: List[VoxelStoreState] = []
        self.host_segments: List[dict] = []

    @property
    def num_segments(self) -> int:
        return 1 + len(self.device_segments) + len(self.host_segments)

    def total_voxels(self) -> int:
        n = int(self.state.num_voxels)
        n += sum(int(s.num_voxels) for s in self.device_segments)
        n += sum(s["n"] for s in self.host_segments)
        return n

    def rotate_if_full(self) -> bool:
        """Freeze the active segment when near capacity; start a fresh
        one that keeps the frame chain and top-down maps."""
        if int(self.state.num_voxels) < self.rotate_threshold:
            return False
        frozen = self.state
        if (self.freeze_dtype == "int8"
                and frozen.feats.dtype != jnp.int8):
            qi, qnorm, qscale = _quantize_rows(frozen.feats,
                                               frozen.feat_norm)
            frozen = frozen.replace(feats=qi, feat_norm=qnorm,
                                    feat_scale=qscale)
        fresh = init_store(self.cfg, store_dtype=self.store_dtype)
        # continuity: same allocentric frame, accumulated top-down maps
        self.state = fresh.replace(
            inv_init_base_tf=frozen.inv_init_base_tf,
            initialized=frozen.initialized,
            cv_map=frozen.cv_map,
            max_height=frozen.max_height,
        )
        self.device_segments.append(frozen)
        while len(self.device_segments) > self.max_device_segments:
            self.host_segments.append(_freeze(self.device_segments.pop(0)))
        return True

    # ------------------------------------------------------------------
    def _localize_host_segment(self, seg: dict, query: jnp.ndarray,
                               top_k: int, **masks
                               ) -> Tuple[np.ndarray, np.ndarray]:
        """Stream one spilled segment through the device, applying the
        same region/floor masks as the device-side Q.localize."""
        from bsc_nav_tpu.ops.similarity import max_cosine

        n, K = seg["n"], seg["K"]
        if n == 0:
            return np.zeros((0, 3), np.int32), np.zeros((0,), np.float32)
        per_voxel = np.asarray(max_cosine(
            jnp.asarray(seg["feats"]), jnp.asarray(seg["feat_norm"]),
            jnp.asarray(seg["feat_count"]), query))
        pos = np.asarray(seg["slot_pos"])
        keep = np.ones((n,), bool)
        if masks.get("use_region"):
            d2 = np.sum((pos.astype(np.float64)
                         - np.asarray(masks["curr_grid"],
                                      np.float64)[None]) ** 2, axis=-1)
            keep &= d2 <= float(masks["region_radius"]) ** 2
        if masks.get("use_floor"):
            fr = np.asarray(masks["floor_range"])
            keep &= (pos[:, 2] >= fr[0]) & (pos[:, 2] <= fr[1])
        per_voxel = np.where(keep, per_voxel[:n], -np.inf)
        k = min(top_k, n)
        idx = np.argsort(-per_voxel)[:k]
        return pos[idx], per_voxel[idx].astype(np.float32)

    def localize(self, query: jnp.ndarray, top_k: int = 100,
                 **masks) -> Tuple[np.ndarray, np.ndarray]:
        """Global top-K across all segments (position-deduplicated,
        max score per voxel)."""
        qn = query.astype(jnp.float32)
        qn = qn / jnp.maximum(jnp.linalg.norm(qn), 1e-12)

        cands_pos, cands_score = [], []
        for seg_state in [self.state] + self.device_segments:
            p, s = Q.localize(seg_state, query, top_k=top_k, **masks)
            live = np.asarray(s) > -np.inf
            cands_pos.append(np.asarray(p)[live])
            cands_score.append(np.asarray(s)[live])
        for seg in self.host_segments:
            p, s = self._localize_host_segment(seg, qn, top_k, **masks)
            live = s > -np.inf
            cands_pos.append(p[live])
            cands_score.append(s[live])

        if not any(len(p) for p in cands_pos):
            return np.zeros((0, 3), np.int32), np.zeros((0,), np.float32)
        pos = np.concatenate([p for p in cands_pos if len(p)])
        score = np.concatenate([s for s in cands_score if len(s)])

        # dedup by voxel position, keep the max score
        best = {}
        for p, s in zip(map(tuple, pos.tolist()), score.tolist()):
            if s > best.get(p, -np.inf):
                best[p] = s
        items = sorted(best.items(), key=lambda kv: -kv[1])[:top_k]
        out_pos = np.asarray([k for k, _ in items], np.int32)
        out_score = np.asarray([v for _, v in items], np.float32)
        return out_pos, out_score
