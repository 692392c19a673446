"""Host-side clustering of query candidates.

Counterparts of the reference's DBSCAN utilities: similarity-weighted
cluster centers over the top-K voxels (reference
objnav_benchmark.py:477-495) and adaptive auto-eps clustering
(reference utils.py:219-322; the knee-point eps search is implemented
here directly since `kneed` is not a dependency).

N is ~100, so this stays on host (sklearn).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from sklearn.cluster import DBSCAN
from sklearn.neighbors import NearestNeighbors


def weighted_cluster_centers(
    top_k_positions: np.ndarray,
    top_k_similarity: np.ndarray,
    eps: float = 10.0,
    min_samples: int = 5,
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """DBSCAN the top-K voxels; return similarity-weighted centers sorted
    by mean similarity (objnav_benchmark.py:477-495 semantics)."""
    pos = np.asarray(top_k_positions, float)
    sim = np.asarray(top_k_similarity, float)
    if len(pos) == 0:
        return np.zeros((0, pos.shape[-1] if pos.ndim == 2 else 3)), \
            np.zeros(0, int), []
    labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(pos)
    info = []
    for lbl in sorted(set(labels) - {-1}):
        m = labels == lbl
        w = sim[m]
        center = np.average(pos[m], axis=0, weights=w)
        info.append((float(w.mean()), center, int(m.sum())))
    info.sort(key=lambda x: x[0], reverse=True)
    centers = (np.stack([c for _, c, _ in info])
               if info else np.zeros((0, pos.shape[1])))
    sizes = [s for _, _, s in info]
    return centers, labels, sizes


def _knee_index(sorted_vals: np.ndarray) -> int:
    """Elbow of an increasing curve: the point farthest below the chord
    from first to last value (max-distance-to-line heuristic, standing in
    for kneed.KneeLocator at utils.py:253-259)."""
    n = len(sorted_vals)
    if n < 3:
        return n - 1
    x = np.arange(n, dtype=float)
    y = np.asarray(sorted_vals, float)
    x0, y0, x1, y1 = x[0], y[0], x[-1], y[-1]
    denom = np.hypot(x1 - x0, y1 - y0) + 1e-12
    d = ((y1 - y0) * x - (x1 - x0) * y + x1 * y0 - y1 * x0) / denom
    return int(np.argmax(d))


def adaptive_clustering(points: np.ndarray, confidences: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Auto-eps DBSCAN with confidence-weighted centers
    (utils.py:219-322 behavior: knee-based eps, adaptive min_samples,
    one retry with loosened parameters)."""
    points = np.asarray(points, float)
    confidences = np.asarray(confidences, float)
    n = len(points)
    if n == 0:
        return np.zeros((0, 3)), np.zeros(0), np.zeros(0, int)
    if n == 1:
        return points.copy(), confidences.copy(), np.zeros(1, int)

    k = min(n - 1, max(5, int(np.sqrt(n))))
    nbrs = NearestNeighbors(n_neighbors=k).fit(points)
    distances, _ = nbrs.kneighbors(points)
    dist_sorted = np.sort(distances[:, -1])
    knee = _knee_index(dist_sorted)
    eps = dist_sorted[knee] * 0.5 if knee > 0 else float(np.median(dist_sorted))
    if eps <= 0:
        eps = float(np.mean(dist_sorted) + np.std(dist_sorted)) or 1.0
    min_samples = max(2, min(n // 20, int(np.log(n) / 1.5)))

    labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(points)
    n_clusters = len(set(labels)) - (1 if -1 in labels else 0)

    expected_min = max(1, int(np.sqrt(n) / 3))
    if n_clusters == 0 or (n > 20 and n_clusters < expected_min):
        eps = eps * (1.5 if n_clusters == 0 else 0.7)
        min_samples = max(2, min_samples - 1)
        labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(points)
        n_clusters = len(set(labels)) - (1 if -1 in labels else 0)

    centers, confs = [], []
    for i in range(n_clusters):
        m = labels == i
        centers.append(np.average(points[m], axis=0, weights=confidences[m]))
        confs.append(float(confidences[m].mean()))
    return np.asarray(centers), np.asarray(confs), labels
