"""Multi-floor detection and floor height ranges.

Host-side re-implementation of the reference's load-time floor logic
(reference memory_2.py:203-256): DBSCAN over the agent base heights
sampled during mapping (eps 0.4, min_samples = len//5), floor ranges
carved out of the occupied-height span, then the current floor chosen by
the agent's height.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from sklearn.cluster import DBSCAN


def detect_floors(base_heights: Sequence[float]) -> List[float]:
    """Cluster sampled base heights into floor heights (ascending)."""
    arr = np.asarray(list(base_heights), float).reshape(-1, 1)
    if len(arr) == 0:
        return []
    min_samples = max(1, len(arr) // 5)
    labels = DBSCAN(eps=0.4, min_samples=min_samples).fit(arr).labels_
    floors = [float(arr[labels == l].mean())
              for l in sorted(set(labels)) if l != -1]
    return sorted(floors)


def floor_ranges(floor_heights: Sequence[float],
                 pos_h_range: Tuple[int, int],
                 cell_size: float) -> List[Tuple[int, int]]:
    """Per-floor [min_h, max_h] voxel-height ranges (memory_2.py:224-241):
    the lowest floor starts at the occupied minimum, the highest ends at
    the occupied maximum, intermediate boundaries at the height gaps."""
    lo, hi = pos_h_range
    n = len(floor_heights)
    if n <= 1:
        return [(int(lo), int(hi))]
    out = []
    for i in range(n):
        if i == 0:
            fmin = lo
            fmax = lo + (floor_heights[1] - floor_heights[0]) / cell_size
        elif i == n - 1:
            fmin = lo + (floor_heights[i] - floor_heights[0]) / cell_size
            fmax = hi
        else:
            fmin = lo + (floor_heights[i] - floor_heights[0]) / cell_size
            fmax = lo + (floor_heights[i + 1] - floor_heights[0]) / cell_size
        out.append((int(fmin) + 1, int(fmax) - 1))
    return out


def current_floor_range(base_heights: Sequence[float],
                        agent_height: float,
                        occupied_heights: np.ndarray,
                        cell_size: float) -> Tuple[int, int, int]:
    """(floor_index, min_h, max_h) for the floor the agent stands on."""
    floors = detect_floors(base_heights)
    if not floors:
        lo = int(occupied_heights.min()) if len(occupied_heights) else 0
        hi = int(occupied_heights.max()) if len(occupied_heights) else 0
        return 0, lo, hi
    lo = int(occupied_heights.min())
    hi = int(occupied_heights.max())
    idx = int(np.argmin(np.abs(np.asarray(floors) - agent_height)))
    ranges = floor_ranges(floors, (lo, hi), cell_size)
    fmin, fmax = ranges[idx] if idx < len(ranges) else (lo, hi)
    return idx, fmin, fmax
