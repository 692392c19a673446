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


def integrate(instances: List[Dict], threshold: int = 3) -> List[Dict]:
    """Deduplicate same-label instances within L1 grid distance
    (memory_2.py:993-1025 semantics: first-kept entry wins the slot, its
    loc/confidence upgraded if a closer duplicate is more confident)."""
    by_label: Dict[str, List[Dict]] = {}
    for item in instances:
        by_label.setdefault(item["label"], []).append(item)

    final: List[Dict] = []
    for label, items in by_label.items():
        kept: List[Dict] = []
        for itm in items:
            merged = False
            for f in kept:
                l1 = sum(abs(a - b) for a, b in zip(f["loc"], itm["loc"]))
                if l1 <= threshold:
                    if itm["confidence"] > f["confidence"]:
                        f["loc"] = itm["loc"]
                        f["confidence"] = itm["confidence"]
                    merged = True
                    break
            if not merged:
                kept.append(dict(itm))
        final.extend(kept)
    return final


def filter_by_floor(instances: List[Dict], floor_min: int,
                    floor_max: int) -> List[Dict]:
    """Single-floor filter (memory_2.py:693-705)."""
    return [o for o in instances
            if floor_min <= o["loc"][2] <= floor_max]
