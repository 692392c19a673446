"""Native runtime kernels vs the pure-Python reference implementations."""

import numpy as np
import pytest

from bsc_nav_tpu import runtime_native as RN
from bsc_nav_tpu.env.pathfinding import GridPathfinder
from bsc_nav_tpu.memory import frontier as FR

pytestmark = pytest.mark.skipif(
    not RN.available(), reason="no C++ toolchain / native build failed")


def make_grid(seed=0, n=48):
    rng = np.random.default_rng(seed)
    nav = np.ones((n, n), bool)
    nav[:2], nav[-2:], nav[:, :2], nav[:, -2:] = False, False, False, False
    for _ in range(6):
        i, j = rng.integers(5, n - 10, 2)
        nav[i:i + 5, j:j + 5] = False
    return nav


def test_distance_field_matches_python():
    nav = make_grid()
    pf = GridPathfinder(nav, (0.0, 0.0), 1.0)
    native = RN.NativeNavGrid(nav)
    start = pf.cell_to_world(5, 5)
    py_field = pf.distance_field(start)
    c_field = native.distance_field(5, 5)
    np.testing.assert_allclose(
        np.where(np.isfinite(py_field), py_field, -1),
        np.where(np.isfinite(c_field), c_field, -1), rtol=1e-5)


def test_astar_matches_python_cost():
    nav = make_grid(seed=1)
    pf = GridPathfinder(nav, (0.0, 0.0), 1.0)
    native = RN.NativeNavGrid(nav)
    path_py = pf.shortest_path(pf.cell_to_world(5, 5),
                               pf.cell_to_world(40, 40))
    path_c = native.astar(5, 5, 40, 40)
    assert (path_py is None) == (path_c is None)
    if path_py is not None:
        def cost(cells):
            c = np.asarray(cells, float)
            return np.linalg.norm(np.diff(c, axis=0), axis=1).sum()
        py_cells = [pf.world_to_cell(p) for p in path_py]
        np.testing.assert_allclose(cost(py_cells), cost(path_c), rtol=1e-5)
        # endpoints + navigability
        assert tuple(path_c[0]) == (5, 5) and tuple(path_c[-1]) == (40, 40)
        assert all(nav[i, j] for i, j in path_c)


def test_frontiers_match_python():
    known = np.zeros((40, 40), bool)
    known[:20] = True
    navigable = make_grid(seed=2, n=40)
    py = FR.find_frontiers(known, navigable)
    c = RN.NativeNavGrid.frontiers(known, navigable)
    np.testing.assert_array_equal(py, c)


def test_label_components():
    mask = np.zeros((20, 20), bool)
    mask[2:5, 2:5] = True
    mask[10:14, 10:12] = True
    labels, n = RN.NativeNavGrid.label(mask, connectivity=4)
    assert n == 2
    assert labels[3, 3] != labels[11, 11]
    assert labels[0, 0] == -1


def test_frame_queue_roundtrip():
    q = RN.FrameQueue(capacity=4, h=8, w=8)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        rgb = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        depth = rng.uniform(0, 5, (8, 8)).astype(np.float32)
        pose = rng.normal(size=7).astype(np.float32)
        assert q.push(rgb, depth, pose)
        frames.append((rgb, depth, pose))
    assert len(q) == 3
    rgb_b, depth_b, poses_b, m = q.pop_batch(8)
    assert m == 3 and len(q) == 0
    for i, (r, d, p) in enumerate(frames):
        np.testing.assert_array_equal(rgb_b[i], r)
        np.testing.assert_array_equal(depth_b[i], d)
        np.testing.assert_array_equal(poses_b[i], p)

    # overflow protection
    for i in range(5):
        ok = q.push(*frames[0])
        assert ok == (i < 4)
