"""Long-term instance memory: detections -> 3D-located labeled instances.

Host-side counterpart of the reference's long_memory path (reference
memory_2.py:905-945): detector boxes -> box-center pixel -> depth
backprojection -> world voxel -> {label, loc, confidence}; plus the
dedup integration pass (memory_2.py:993-1025: same-label instances
within L1 distance <= threshold merge, keeping the higher confidence).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from bsc_nav_tpu import geometry as G
from bsc_nav_tpu.config import Config
from bsc_nav_tpu.models.detector import Detection


def instances_from_detections(
    detections: Sequence[Detection],
    depth: np.ndarray,
    cam_to_world: np.ndarray,
    cfg: Config,
) -> List[Dict]:
    """Locate each detection's box center in the voxel grid.

    cam_to_world: the full camera->allocentric transform for this frame
    (the `tf @ base @ base2cam` chain, memory_2.py:930).
    """
    H, W = depth.shape
    mem = cfg.memory
    calib = G.camera_intrinsics(H, W, cfg.sensor.hfov_deg)
    inv_calib = np.linalg.inv(calib)
    out: List[Dict] = []
    for det in detections:
        x1, y1, x2, y2 = det.xyxy
        col = int((x1 + x2) / 2)
        row = int((y1 + y2) / 2)
        if not (0 <= row < H and 0 <= col < W):
            continue
        z = float(depth[row, col])
        if not (cfg.sensor.min_depth < z < cfg.sensor.max_depth):
            continue   # same validity gate as memory_2.py:921
        p_cam = inv_calib @ np.array([col + 0.5, row + 0.5, 1.0]) * z
        p_w = cam_to_world[:3, :3] @ p_cam + cam_to_world[:3, 3]
        r = int(mem.grid_size / 2 - int(p_w[0] / mem.cell_size))
        c = int(mem.grid_size / 2 - int(p_w[1] / mem.cell_size))
        h = int(p_w[2] / mem.cell_size)
        if (r < 0 or r >= mem.grid_size or c < 0 or c >= mem.grid_size
                or h < mem.zmin or h >= mem.zmax):
            continue
        out.append({
            "label": det.label,
            "loc": [r, c, h - mem.zmin],
            "confidence": float(det.confidence),
        })
    return out


def instances_device(boxes, conf, cls_idx, valid, depth, cam_tfs,
                     cfg: Config, det_size: int):
    """DEVICE-side counterpart of `instances_from_detections` for a
    whole batch: detector boxes (in det_size pixel space) -> box-center
    depth backprojection -> world voxel, entirely on device, so the
    build loop transfers ONE small [B, K, 5] array instead of running
    per-detection host python that contends with the tunnel client for
    the CPU (reference path memory_2.py:905-945).

    boxes [B, K, 4] xyxy in det_size space; conf/cls_idx/valid [B, K];
    depth [B, H, W]; cam_tfs [B, 4, 4] camera->world.
    Returns (locs [B, K, 3] int32 grid (r, c, h-zmin), conf [B, K],
    cls_idx [B, K], ok [B, K] bool)."""
    import jax
    import jax.numpy as jnp

    H, W = depth.shape[1], depth.shape[2]
    mem = cfg.memory
    calib = G.camera_intrinsics(H, W, cfg.sensor.hfov_deg)
    inv_calib = jnp.asarray(np.linalg.inv(calib), jnp.float32)

    # box center pixel in the depth frame, matching the host path's
    # order exactly: scale corners to frame coords, CLIP per corner
    # (yolo_world._nms_detections), then center, then int truncation
    sx, sy = W / det_size, H / det_size
    x1 = jnp.clip(boxes[..., 0] * sx, 0, W)
    y1 = jnp.clip(boxes[..., 1] * sy, 0, H)
    x2 = jnp.clip(boxes[..., 2] * sx, 0, W)
    y2 = jnp.clip(boxes[..., 3] * sy, 0, H)
    col = jnp.trunc((x1 + x2) / 2)
    row = jnp.trunc((y1 + y2) / 2)
    in_frame = (row >= 0) & (row < H) & (col >= 0) & (col < W)
    rowc = jnp.clip(row, 0, H - 1).astype(jnp.int32)
    colc = jnp.clip(col, 0, W - 1).astype(jnp.int32)

    # flat 2-D gather (TPU gathers want flat operands, CLAUDE.md)
    z = jnp.take_along_axis(depth.reshape(depth.shape[0], H * W),
                            rowc * W + colc, axis=1)     # [B, K]
    z_ok = (z > cfg.sensor.min_depth) & (z < cfg.sensor.max_depth)

    pix = jnp.stack([colc.astype(jnp.float32) + 0.5,
                     rowc.astype(jnp.float32) + 0.5,
                     jnp.ones_like(z)], axis=-1)        # [B, K, 3]
    p_cam = jnp.einsum("ij,bkj->bki", inv_calib, pix) * z[..., None]
    p_w = (jnp.einsum("bij,bkj->bki", cam_tfs[:, :3, :3], p_cam)
           + cam_tfs[:, None, :3, 3])
    rc = G.world_to_grid(p_w, mem.grid_size, mem.cell_size)
    in_grid = G.grid_in_range(rc, mem.grid_size, mem.zmin, mem.zmax)
    locs = rc.at[..., 2].add(-mem.zmin)
    ok = valid & in_frame & z_ok & in_grid
    return locs, conf, cls_idx, ok


def instances_from_device(dev_out, classes: Sequence[str]) -> List[Dict]:
    """Host finalization: one small transfer -> instance dicts."""
    locs, conf, cls_idx, ok = (np.asarray(a) for a in dev_out)
    out: List[Dict] = []
    for b in range(locs.shape[0]):
        for k in np.nonzero(ok[b])[0]:
            out.append({
                "label": classes[int(cls_idx[b, k])],
                "loc": locs[b, k].tolist(),
                "confidence": float(conf[b, k]),
            })
    return out


def integrate(instances: List[Dict], threshold: int = 3) -> List[Dict]:
    """Deduplicate same-label instances within L1 grid distance
    (memory_2.py:993-1025 semantics: first-kept entry wins the slot, its
    loc/confidence upgraded if a closer duplicate is more confident)."""
    by_label: Dict[str, List[Dict]] = {}
    for item in instances:
        by_label.setdefault(item["label"], []).append(item)

    final: List[Dict] = []
    for label, items in by_label.items():
        # same greedy first-match semantics, vectorized inner scan (the
        # tunnel client contends for the single host core, so python-
        # bytecode count in the build loop matters; measured 16x python
        # slowdown while device work is in flight)
        locs = np.asarray([i["loc"] for i in items], np.int64)
        confs = np.asarray([i["confidence"] for i in items], np.float64)
        kept_loc = np.zeros((len(items), 3), np.int64)
        kept_conf = np.zeros(len(items), np.float64)
        m = 0
        for i in range(len(items)):
            if m:
                l1 = np.abs(kept_loc[:m] - locs[i]).sum(axis=1)
                hits = np.nonzero(l1 <= threshold)[0]
                if hits.size:
                    j = hits[0]
                    if confs[i] > kept_conf[j]:
                        kept_loc[j] = locs[i]
                        kept_conf[j] = confs[i]
                    continue
            kept_loc[m] = locs[i]
            kept_conf[m] = confs[i]
            m += 1
        final.extend({"label": label, "loc": kept_loc[j].tolist(),
                      "confidence": float(kept_conf[j])}
                     for j in range(m))
    return final


def integrate_state_init(capacity: int):
    """Device-resident long-term instance state: capacity-bounded
    buffers with one garbage row (index = capacity, repo convention).
    cls initialized to -1 so empty slots can never label-match."""
    import jax.numpy as jnp
    return (jnp.zeros((capacity + 1, 3), jnp.int32),
            jnp.zeros((capacity + 1,), jnp.float32),
            jnp.full((capacity + 1,), -1, jnp.int32),
            jnp.zeros((), jnp.int32))


def integrate_device_scan(state, locs, conf, cls_idx, ok,
                          threshold: int = 3):
    """DEVICE re-run of the reference's full cumulative integration
    (memory_2.py:993-1025: `long_memory_integration` is re-applied to
    the whole list every frame) as ONE jitted lax.scan: the previous
    keepers (slot order) followed by the new batch's detections
    (frame-major, conf-desc inside a frame = NMS output order) rebuild
    a fresh keeper list from scratch -- bit-identical to
    `integrate(kept_list + new_items)` on host, including the
    keeper-drift re-merges a purely incremental match would miss.

    Label grouping note: the host groups by label before scanning, but
    cross-label items never interact, so scanning in interleaved order
    with a label-equality hit test yields the same per-label keepers;
    only the output ordering differs (tests compare as multisets).

    state: integrate_state_init tuple; locs [B, K, 3] i32, conf/cls_idx/
    ok [B, K] from instances_device.  Returns the new state."""
    import jax
    import jax.numpy as jnp

    kept_loc, kept_conf, kept_cls, m = state
    C = kept_loc.shape[0] - 1
    it_loc = jnp.concatenate([kept_loc[:C], locs.reshape(-1, 3)], 0)
    it_conf = jnp.concatenate([kept_conf[:C], conf.reshape(-1)], 0)
    it_cls = jnp.concatenate(
        [kept_cls[:C], cls_idx.reshape(-1).astype(jnp.int32)], 0)
    it_ok = jnp.concatenate([jnp.arange(C) < m, ok.reshape(-1)], 0)

    slot = jnp.arange(C)

    def step(carry, item):
        k_loc, k_conf, k_cls, n = carry
        loc, cf, cl, valid = item
        d = jnp.abs(k_loc[:C] - loc[None, :]).sum(1)
        hit = (d <= threshold) & (k_cls[:C] == cl) & (slot < n) & valid
        any_hit = jnp.any(hit)
        j = jnp.argmax(hit)                    # first keeper hit
        upgrade = any_hit & (cf > k_conf[j])
        append = valid & ~any_hit & (n < C)
        widx = jnp.where(upgrade, j, jnp.where(append, n, C))
        k_loc = k_loc.at[widx].set(loc)
        k_conf = k_conf.at[widx].set(cf)
        k_cls = k_cls.at[widx].set(cl)
        return (k_loc, k_conf, k_cls, n + append.astype(jnp.int32)), None

    out, _ = jax.lax.scan(step, integrate_state_init(C),
                          (it_loc, it_conf, it_cls, it_ok))
    return out


def instances_from_integrate_state(state, classes: Sequence[str]
                                   ) -> List[Dict]:
    """ONE small transfer -> instance dicts (host order = slot order)."""
    k_loc, k_conf, k_cls, m = (np.asarray(a) for a in state)
    return [{"label": classes[int(k_cls[i])],
             "loc": k_loc[i].tolist(),
             "confidence": float(k_conf[i])} for i in range(int(m))]


def filter_by_floor(instances: List[Dict], floor_min: int,
                    floor_max: int) -> List[Dict]:
    """Single-floor filter (memory_2.py:693-705)."""
    return [o for o in instances
            if floor_min <= o["loc"][2] <= floor_max]
