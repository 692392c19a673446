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


class TrajectoryDrawer:
    """2D top-down trajectory renderer (reference BSCAgent.py:173-276):
    an RGB map built from the memory point cloud below the camera height,
    with the agent pose, FOV wedge and accumulated path drawn per step.
    Pure numpy; returns uint8 frames suitable for video overlay."""

    PATH_COLOR = np.array([102, 102, 255], np.uint8)
    AGENT_COLOR = np.array([76, 0, 153], np.uint8)
    FOV_COLOR = np.array([160, 160, 160], np.uint8)

    def __init__(self, state, cfg, origin, fov_deg: float = 90.0,
                 radius: int = 30):
        self.cfg = cfg
        self.origin = np.asarray(origin)
        self.fov = np.radians(fov_deg)
        self.radius = radius
        gs = cfg.memory.grid_size
        self.base_map = np.asarray(state.cv_map)[: gs * gs].reshape(
            gs, gs, 3).copy()
        self._path: list = []

    def _loc2grid(self, position):
        m = self.cfg.memory
        row = int((position[2] - self.origin[2]) / m.cell_size
                  + m.grid_size // 2)
        col = int((position[0] - self.origin[0]) / m.cell_size
                  + m.grid_size // 2)
        return row, col

    def _draw_disk(self, img, r, c, rad, color):
        gs = img.shape[0]
        rr, cc = np.ogrid[:gs, :gs]
        mask = (rr - r) ** 2 + (cc - c) ** 2 <= rad * rad
        img[mask] = color

    def _draw_line(self, img, p0, p1, color):
        n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) + 1
        rs = np.linspace(p0[0], p1[0], n).astype(int)
        cs = np.linspace(p0[1], p1[1], n).astype(int)
        gs = img.shape[0]
        ok = (rs >= 0) & (rs < gs) & (cs >= 0) & (cs < gs)
        img[rs[ok], cs[ok]] = color

    def step(self, position, yaw: float) -> np.ndarray:
        """Record the agent pose and return the rendered frame."""
        r, c = self._loc2grid(position)
        if self._path:
            self._draw_line(self.base_map, self._path[-1], (r, c),
                            self.PATH_COLOR)
        self._path.append((r, c))

        frame = self.base_map.copy()
        # FOV wedge (agent looks along -z == -row direction at yaw 0)
        gs = frame.shape[0]
        angles = np.linspace(yaw - self.fov / 2, yaw + self.fov / 2, 40)
        for a in angles:
            pr = r - self.radius * np.cos(a)
            pc = c - self.radius * np.sin(a)
            self._draw_line(frame, (r, c), (pr, pc), self.FOV_COLOR)
        self._draw_disk(frame, r, c, 3, self.AGENT_COLOR)
        return frame


def render_token_matching(query_img, ref_img, similarity_2d,
                          path: str) -> str:
    """Query image | reference image | patch-similarity heatmap
    (reference matching2D / plot_token_matching, memory_2.py:278-295,
    utils.py:111-129), headless PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 5))
    axes[0].imshow(np.asarray(query_img)[..., :3])
    axes[0].set_title("query")
    axes[1].imshow(np.asarray(ref_img)[..., :3])
    axes[1].set_title("reference")
    im = axes[2].imshow(np.asarray(similarity_2d), cmap="inferno")
    axes[2].set_title("token similarity")
    for ax in axes:
        ax.axis("off")
    fig.colorbar(im, ax=axes[2], fraction=0.046)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
