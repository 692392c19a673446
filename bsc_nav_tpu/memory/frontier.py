"""Frontier-based exploration over the top-down map (vectorized).

Re-designs the reference's FrontierExplorer (reference
memory_2.py:1147-1387), whose per-cell Python scans over the 1000x1000
grid were hot loop #4 (SURVEY §3), as array ops:

  - navigable mask:   known cells (cv_map nonzero) AND pathfinder-navigable
  - frontiers:        navigable cells 4-adjacent to unknown cells
  - clusters:         scipy connected components, min size filter
  - information gain: box-filter count of unknown cells around a cluster
                      center (uniform_filter == the reference's radius
                      scan)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy import ndimage


def find_frontiers(known: np.ndarray, navigable: np.ndarray) -> np.ndarray:
    """Boolean frontier mask: known+navigable cells adjacent (4-neigh) to
    at least one unknown cell (memory_2.py:1186-1208)."""
    unknown = ~known
    near_unknown = ndimage.binary_dilation(
        unknown, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool))
    return navigable & known & near_unknown


def cluster_frontiers(frontier_mask: np.ndarray, min_cluster_size: int = 10
                      ) -> List[np.ndarray]:
    """Connected frontier clusters (4-connectivity BFS in the reference,
    memory_2.py:1210-1248), filtered by size.  Returns per-cluster
    arrays of (x, y) cells."""
    lab, n = ndimage.label(
        frontier_mask,
        structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool))
    clusters = []
    for i in range(1, n + 1):
        cells = np.argwhere(lab == i)
        if len(cells) >= min_cluster_size:
            clusters.append(cells)
    return clusters


def information_gain_map(known: np.ndarray, radius: int) -> np.ndarray:
    """Count of unknown cells in a (2r+1)^2 window around every cell
    (memory_2.py:1259-1278)."""
    unknown = (~known).astype(np.float32)
    size = 2 * radius + 1
    return ndimage.uniform_filter(
        unknown, size=size, mode="constant") * (size * size)


def select_frontier_target(
    known: np.ndarray,
    navigable: np.ndarray,
    min_cluster_size: int = 10,
    ig_radius: int = 5,
) -> Optional[Tuple[float, float]]:
    """Full frontier step: mask -> clusters -> best center by information
    gain.  None when exploration is exhausted (memory_2.py:1280-1307)."""
    frontiers = find_frontiers(known, navigable)
    if not frontiers.any():
        return None
    clusters = cluster_frontiers(frontiers, min_cluster_size)
    if not clusters:
        return None
    ig = information_gain_map(known, ig_radius)
    best, best_ig = None, 0.0
    for cells in clusters:
        cx, cy = cells.mean(axis=0)
        g = float(ig[int(round(cx)), int(round(cy))])
        if g > best_ig:
            best_ig = g
            best = (float(cx), float(cy))
    return best
