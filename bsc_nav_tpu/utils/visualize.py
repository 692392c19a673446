"""3D memory visualization (reference vis_3d*.py equivalents).

The reference uses interactive Open3D viewers over the saved
grid_rgb_pos/grid_rgb arrays with top-K highlighting (vis_3d.py:6),
distance-transparency (vis_3d_v2.py:9-33) and cluster-center views
(vis_3d_v3.py).  Headless-first here:

  - render_pointcloud_png: matplotlib 3D scatter of the colored voxel
    cloud with optional top-K / cluster-center highlights -> PNG;
  - render_topdown_png: the cv_map top-down color map -> PNG;
  - open3d_view: interactive viewer when open3d is installed (gated).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _state_cloud(state):
    from bsc_nav_tpu.memory.store import fused_rgb
    n = int(state.num_voxels)
    pos = np.asarray(state.slot_pos)[:n]
    rgb = np.asarray(fused_rgb(state))[:n]
    return pos, rgb


def render_pointcloud_png(state, path: str,
                          highlight: Optional[np.ndarray] = None,
                          centers: Optional[np.ndarray] = None,
                          max_points: int = 50_000,
                          elev: float = 55.0, azim: float = -60.0) -> str:
    """Voxel point cloud -> PNG (vis_3d.py behavior, headless)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pos, rgb = _state_cloud(state)
    if len(pos) > max_points:
        sel = np.random.default_rng(0).choice(len(pos), max_points,
                                              replace=False)
        pos, rgb = pos[sel], rgb[sel]

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pos[:, 1], pos[:, 0], pos[:, 2], c=rgb / 255.0, s=1,
               alpha=0.5, linewidths=0)
    if highlight is not None and len(highlight):
        h = np.asarray(highlight)
        ax.scatter(h[:, 1], h[:, 0], h[:, 2], c="red", s=40, marker="*",
                   label="top-K")
    if centers is not None and len(centers):
        c = np.asarray(centers)
        ax.scatter(c[:, 1], c[:, 0], c[:, 2], c="lime", s=120, marker="X",
                   edgecolors="k", label="cluster centers")
    if highlight is not None or centers is not None:
        ax.legend()
    ax.set_xlabel("col")
    ax.set_ylabel("row")
    ax.set_zlabel("h")
    ax.view_init(elev=elev, azim=azim)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def render_topdown_png(state, path: str, grid_size: int) -> str:
    """cv_map top-down color map -> PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cv = np.asarray(state.cv_map)[: grid_size * grid_size]
    img = cv.reshape(grid_size, grid_size, 3)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(img)
    ax.set_title("top-down memory map (cv_map)")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def open3d_view(state, highlight: Optional[np.ndarray] = None) -> None:
    """Interactive Open3D viewer (vis_3d.py parity; requires open3d)."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError(
            "open3d is not installed; use render_pointcloud_png for "
            "headless rendering") from e

    pos, rgb = _state_cloud(state)
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(pos.astype(float))
    pc.colors = o3d.utility.Vector3dVector(rgb.astype(float) / 255.0)
    geoms = [pc]
    if highlight is not None and len(highlight):
        hl = o3d.geometry.PointCloud()
        hl.points = o3d.utility.Vector3dVector(
            np.asarray(highlight, float))
        hl.paint_uniform_color([1.0, 0.0, 0.0])
        geoms.append(hl)
    o3d.visualization.draw_geometries(geoms)
