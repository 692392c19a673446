"""VLN-CE top-down map: connectivity graph, edge-constrained nearest node,
overlays, fog of war, MP3D raw-format parsing."""

import json

import numpy as np

from bsc_nav_tpu.env.pathfinding import GridPathfinder
from bsc_nav_tpu.env.vlnce_maps import (
    MAP_BORDER_INDICATOR, MAP_MP3D_WAYPOINT, MAP_REFERENCE_POINT,
    MAP_SHORTEST_PATH_COLOR, MAP_SOURCE_POINT_INDICATOR,
    MAP_TARGET_POINT_INDICATOR, GRADIENT_START, ConnectivityGraph,
    TopDownMapVLNCE, colorize_topdown_map, get_nearest_node,
    update_nearest_node)


def open_pathfinder(n=40, res=0.25):
    nav = np.ones((n, n), bool)
    nav[0, :] = nav[-1, :] = nav[:, 0] = nav[:, -1] = False
    return GridPathfinder(nav, origin_xz=(0.0, 0.0), resolution=res)


def line_graph():
    """A -- B -- C in a row, plus D far off but UNCONNECTED to A."""
    g = ConnectivityGraph()
    g.add_node("A", [1.0, 0.0, 5.0])
    g.add_node("B", [4.0, 0.0, 5.0])
    g.add_node("C", [7.0, 0.0, 5.0])
    g.add_node("D", [6.9, 0.0, 5.1])   # nearest to C-ish positions
    g.add_edge("A", "B")
    g.add_edge("B", "C")
    return g


def test_nearest_node_global_vs_edge_constrained():
    g = line_graph()
    # global nearest to (6.9, 5.1) is D
    assert get_nearest_node(g, (6.9, 5.1)) == "D"
    # but starting from A, the nearest may only advance along edges:
    # A -> B -> C; D is unreachable
    n = update_nearest_node(g, "A", (6.9, 5.1))
    assert n == "B"
    n = update_nearest_node(g, n, (6.9, 5.1))
    assert n == "C"
    n = update_nearest_node(g, n, (6.9, 5.1))
    assert n == "C"                       # D not adjacent -> stays C


def test_reset_draws_static_overlays():
    pf = open_pathfinder()
    m = TopDownMapVLNCE(pf, graph=line_graph())
    start, goal = np.array([1.0, 0.0, 1.0]), np.array([8.0, 0.0, 8.0])
    m.reset(start, goal, reference_path=[start, [8.0, 0.0, 1.0], goal])
    vals = set(np.unique(m._map).tolist())
    assert MAP_BORDER_INDICATOR in vals
    assert MAP_SOURCE_POINT_INDICATOR in vals
    assert MAP_TARGET_POINT_INDICATOR in vals
    assert MAP_SHORTEST_PATH_COLOR in vals
    assert MAP_REFERENCE_POINT in vals
    assert MAP_MP3D_WAYPOINT in vals


def test_update_draws_gradient_trail_and_reveals_fog():
    pf = open_pathfinder()
    m = TopDownMapVLNCE(pf, graph=line_graph())
    m.reset(np.array([1.0, 0.0, 5.0]), np.array([9.0, 0.0, 5.0]))
    fog0 = int(m._fog.sum())
    metric = None
    for k in range(1, 9):
        metric = m.update(np.array([1.0 + k * 0.8, 0.0, 5.0]), yaw=-np.pi / 2)
    assert int(m._fog.sum()) > fog0
    assert (m._map >= GRADIENT_START).any()        # trail painted
    # nearest node advanced A -> B -> C along edges
    assert m._nearest_node == "C"
    assert metric["agent_map_coord"] == pf.world_to_cell([7.4, 0.0, 5.0])
    assert metric["meters_per_px"] == pf.res
    assert metric["map"].shape == pf.nav.shape


def test_colorize_shapes_and_fog_darkening():
    pf = open_pathfinder(16)
    m = TopDownMapVLNCE(pf)
    m.reset(np.array([1.0, 0.0, 1.0]), np.array([3.0, 0.0, 3.0]))
    rgb = m.render()
    assert rgb.shape == (*pf.nav.shape, 3) and rgb.dtype == np.uint8
    # unexplored valid cells darker than explored valid cells
    ind, fog = m._map, m._fog
    lit = rgb[(ind == 1) & (fog > 0)]
    dark = rgb[(ind == 1) & (fog == 0)]
    if len(lit) and len(dark):
        assert dark.mean() < lit.mean()
    # no-fog colorize keeps palette colors
    rgb2 = colorize_topdown_map(ind)
    assert (rgb2[ind == 1] == 150).all()


def test_mp3d_raw_connectivity_parsing(tmp_path):
    def pose(x, y_up, z_mp3d):
        p = np.eye(4)
        p[0, 3], p[1, 3], p[2, 3] = x, z_mp3d, y_up   # mp3d z-up storage
        return p.reshape(-1).tolist()

    entries = [
        {"image_id": "n0", "pose": pose(0.0, 1.5, 0.0),
         "included": True, "unobstructed": [False, True, False]},
        {"image_id": "n1", "pose": pose(2.0, 1.5, 0.0),
         "included": True, "unobstructed": [True, False, True]},
        {"image_id": "n2", "pose": pose(4.0, 1.5, 0.0),
         "included": False, "unobstructed": [False, True, False]},
    ]
    f = tmp_path / "scan_connectivity.json"
    f.write_text(json.dumps(entries))
    g = ConnectivityGraph.from_mp3d_connectivity(str(f))
    assert set(g.positions) == {"n0", "n1"}        # n2 excluded
    # mp3d z-up (x, y, z) -> habitat y-up (x, z, -y): height 1.5 stays up
    np.testing.assert_allclose(g.positions["n0"], [0.0, 1.5, 0.0])
    np.testing.assert_allclose(g.positions["n1"], [2.0, 1.5, 0.0])
    assert g.neighbors("n0") == ["n1"]             # undirected, n2 dropped
    assert g.neighbors("n1") == ["n0"]


def test_sampled_graph_respects_obstacles():
    from bsc_nav_tpu.env.vlnce_maps import sample_connectivity_graph
    nav = np.ones((40, 40), bool)
    nav[:, 19:21] = False                 # wall splits the grid in two
    nav[0, :] = nav[-1, :] = nav[:, 0] = nav[:, -1] = False
    pf = GridPathfinder(nav, origin_xz=(0.0, 0.0), resolution=0.25)
    g = sample_connectivity_graph(pf, spacing_m=1.0)
    assert len(g) > 10
    # no edge crosses the wall: neighbors stay on the same side
    for nid in g:
        j = int(nid.split("_")[1])
        for nb in g.neighbors(nid):
            jb = int(nb.split("_")[1])
            assert (j < 19) == (jb < 19), f"edge {nid}-{nb} crosses wall"


def test_fake_benchmark_env_vlnce_topdown():
    from bsc_nav_tpu.config import small_test_config
    from bsc_nav_tpu.env.benchmark import FakeBenchmarkEnv, episodes_for_scene
    from bsc_nav_tpu.env.fake import BoxScene

    cfg = small_test_config()
    scene = BoxScene.default()
    eps = episodes_for_scene(scene, start=(0.0, 0.0, 0.0), seed=0)
    bench = FakeBenchmarkEnv(cfg, eps, scene=scene, topdown="vlnce")
    bench.reset()
    for a in ["move_forward", "turn_left", "move_forward", "stop"]:
        bench.step(a)
    m = bench.get_metrics()
    td = m["top_down_map"]
    assert td.ndim == 3 and td.dtype == np.uint8
    ind = bench.top_down_map._map
    assert MAP_SOURCE_POINT_INDICATOR in np.unique(ind)
    assert MAP_MP3D_WAYPOINT in np.unique(ind)     # sampled nodes drawn
    assert bench.top_down_map._nearest_node is not None


def test_json_dict_roundtrip(tmp_path):
    g = line_graph()
    d = {"nodes": {k: v.tolist() for k, v in g.positions.items()},
         "edges": [["A", "B"], ["B", "C"]]}
    f = tmp_path / "g.json"
    f.write_text(json.dumps(d))
    g2 = ConnectivityGraph.from_json(str(f))
    assert set(g2.positions) == set(g.positions)
    assert sorted(g2.neighbors("B")) == ["A", "C"]
