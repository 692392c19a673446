"""Unit tests for agent-layer components: clustering, long-term memory,
floors, frontier exploration, LLM contract parsing."""

import numpy as np
import pytest

from bsc_nav_tpu.agents import llm as L
from bsc_nav_tpu.agents.clustering import (
    adaptive_clustering, weighted_cluster_centers)
from bsc_nav_tpu.memory import floors as F
from bsc_nav_tpu.memory import frontier as FR
from bsc_nav_tpu.memory import longterm as LT
from bsc_nav_tpu.models.detector import ColorPrototypeDetector, Detection
from bsc_nav_tpu.agents import robot as R


def test_weighted_cluster_centers_two_blobs(rng):
    a = rng.normal(scale=1.0, size=(30, 3)) + np.array([0, 0, 0])
    b = rng.normal(scale=1.0, size=(30, 3)) + np.array([50, 50, 0])
    pos = np.vstack([a, b])
    sim = np.concatenate([np.full(30, 0.9), np.full(30, 0.5)])
    centers, labels, sizes = weighted_cluster_centers(pos, sim, eps=10,
                                                      min_samples=5)
    assert len(centers) == 2
    # higher-similarity cluster first
    assert np.linalg.norm(centers[0] - [0, 0, 0]) < 3
    assert np.linalg.norm(centers[1] - [50, 50, 0]) < 3


def test_adaptive_clustering(rng):
    pts = np.vstack([rng.normal(scale=0.5, size=(40, 3)),
                     rng.normal(scale=0.5, size=(40, 3)) + 20])
    conf = np.ones(80)
    centers, confs, labels = adaptive_clustering(pts, conf)
    # the reference heuristic intentionally over-segments (utils.py:266,
    # :279-289); require both blobs represented rather than an exact count
    assert len(centers) >= 2
    d0 = np.linalg.norm(centers - np.zeros(3), axis=1).min()
    d1 = np.linalg.norm(centers - np.full(3, 20.0), axis=1).min()
    assert d0 < 2.0 and d1 < 2.0


def test_longterm_integration_dedup():
    inst = [
        {"label": "chair", "loc": [10, 10, 5], "confidence": 0.6},
        {"label": "chair", "loc": [11, 10, 5], "confidence": 0.9},  # merge
        {"label": "chair", "loc": [30, 10, 5], "confidence": 0.7},  # keep
        {"label": "table", "loc": [10, 10, 5], "confidence": 0.8},  # other lbl
    ]
    out = LT.integrate(inst, threshold=3)
    chairs = [o for o in out if o["label"] == "chair"]
    assert len(chairs) == 2
    # merged entry upgraded to the higher-confidence duplicate
    near = [c for c in chairs if abs(c["loc"][0] - 10) <= 1][0]
    assert near["confidence"] == 0.9 and near["loc"] == [11, 10, 5]
    assert len([o for o in out if o["label"] == "table"]) == 1


def test_integrate_device_scan_matches_host_cumulative(rng):
    """The device-resident keeper scan (longterm.integrate_device_scan)
    re-runs the reference's cumulative integration every batch; over a
    multi-batch stream it must produce the same keeper multiset as the
    host path `list = integrate(list + new_batch)` (the agent's
    long_memory_dict update, memory_2.py:993-1025 semantics)."""
    import jax
    import jax.numpy as jnp

    classes = ["chair", "table", "sofa"]
    B, K, T, cap = 2, 4, 5, 64
    scan = jax.jit(LT.integrate_device_scan, static_argnames="threshold")

    state = LT.integrate_state_init(cap)
    host: list = []
    for _ in range(T):
        # clustered random detections so merges/upgrades actually occur
        locs = rng.integers(0, 6, size=(B, K, 3)).astype(np.int32)
        conf = rng.random((B, K)).astype(np.float32)
        cls_idx = rng.integers(0, len(classes), size=(B, K)).astype(np.int32)
        ok = rng.random((B, K)) > 0.3

        state = scan(state, jnp.asarray(locs), jnp.asarray(conf),
                     jnp.asarray(cls_idx), jnp.asarray(ok), threshold=3)

        new = [{"label": classes[cls_idx[b, k]],
                "loc": locs[b, k].tolist(),
                "confidence": float(conf[b, k])}
               for b in range(B) for k in range(K) if ok[b, k]]
        host = LT.integrate(host + new, threshold=3)

        got = LT.instances_from_integrate_state(state, classes)
        key = lambda o: (o["label"], tuple(o["loc"]),
                         round(o["confidence"], 5))
        assert sorted(map(key, got)) == sorted(map(key, host))


def test_floor_detection_two_floors():
    base = [0.1] * 20 + [3.1] * 20
    floors = F.detect_floors(base)
    assert len(floors) == 2
    assert abs(floors[0] - 0.1) < 0.05 and abs(floors[1] - 3.1) < 0.05

    heights = np.concatenate([np.arange(0, 30), np.arange(30, 64)])
    idx, lo, hi = F.current_floor_range(base, 0.2, heights, 0.1)
    assert idx == 0
    assert lo <= 5 and hi < 64


def test_frontier_selection():
    known = np.zeros((40, 40), bool)
    known[:20] = True                  # bottom half explored
    navigable = np.ones((40, 40), bool)
    target = FR.select_frontier_target(known, navigable,
                                       min_cluster_size=5, ig_radius=3)
    assert target is not None
    # frontier row sits at the known/unknown boundary
    assert 17 <= target[0] <= 20

    # fully-known map: exploration exhausted
    assert FR.select_frontier_target(
        np.ones((40, 40), bool), navigable) is None


def test_color_detector_finds_box():
    img = np.full((60, 60, 3), 200, np.uint8)
    img[10:30, 20:40] = (200, 30, 30)
    det = ColorPrototypeDetector({"bed": (200, 30, 30)}, confidence=0.5)
    out = det.detect(img)
    assert len(out) == 1
    d = out[0]
    assert d.label == "bed" and d.confidence > 0.5
    x1, y1, x2, y2 = d.xyxy
    assert (x1, y1, x2, y2) == (20.0, 10.0, 40.0, 30.0)


def test_instances_from_detections_locates_in_grid():
    from bsc_nav_tpu.config import small_test_config
    cfg = small_test_config()
    H = W = cfg.sensor.height
    depth = np.full((H, W), 2.0, np.float32)
    det = [Detection("bed", 0.9, (W // 2 - 5, H // 2 - 5, W // 2 + 5,
                                  H // 2 + 5))]
    cam_tf = np.eye(4)   # camera frame == allocentric frame
    out = LT.instances_from_detections(det, depth, cam_tf, cfg)
    assert len(out) == 1
    r, c, h = out[0]["loc"]
    # center pixel at depth 2: x~0, y~0, z=2 -> row=gs/2, col=gs/2, h=20-zmin
    assert abs(r - cfg.memory.grid_size // 2) <= 1
    assert abs(c - cfg.memory.grid_size // 2) <= 1
    assert h == int(2.0 / cfg.memory.cell_size) - cfg.memory.zmin


def test_llm_contract_regexes():
    ans = ("**Result**: (Nav Loc 1: [10, 20, 5], Nav Loc 2: [11, 21, 6])")
    m = R.PATTERN_RESULT.search(ans)
    locs = R.PATTERN_RESULT_LOC.findall(m.group(1))
    assert locs == [("10", "20", "5"), ("11", "21", "6")]

    assert R.PATTERN_UNABLE.search("**Result**: (Nav Loc: Unable to find)")
    assert R.PATTERN_SUCCESS.search("Success: yes\nneed forward: no")
    assert R.PATTERN_FORWARD.search("need forward: no").group(1) == "no"
    assert R.PATTERN_STRATEGY.search(
        "**Strategy**: 'move_forward'").group(1) == "move_forward"


def test_mock_llm_and_retry():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    assert L.retry(flaky, attempts=5, base_delay=0.0) == "ok"

    with pytest.raises(RuntimeError):
        L.retry(lambda: "bad", attempts=2, base_delay=0.0,
                validate=lambda a: a == "good")

    client = L.MockLLMClient(
        responders=[(lambda t: "Judge whether" in t,
                     lambda t: "Success: yes\nneed forward: no")])
    out = L.succeed_determine_singleview(
        client, "a bed", [np.zeros((8, 8, 3), np.uint8)])
    assert "Success: yes" in out
    assert client.calls[0]["model"] == "gpt-4o"


def test_batched_detection_at_flush():
    """detect_batch-capable detectors run once per flush (amortized
    device dispatch) and still populate the long-term memory."""
    import jax
    from bsc_nav_tpu.config import small_test_config
    from bsc_nav_tpu.agents.spatial_memory import (
        Perception, VoxelTokenMemory)
    from bsc_nav_tpu.env.fake import FakeNavEnv
    from bsc_nav_tpu.models import vit

    class BatchColorDetector(ColorPrototypeDetector):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.batch_calls = 0
            self.single_calls = 0

        def detect(self, rgb):
            self.single_calls += 1
            return super().detect(rgb)

        def detect_batch(self, rgbs):
            self.batch_calls += 1
            return [super(BatchColorDetector, self).detect(r) for r in rgbs]

    from bsc_nav_tpu.env.pathfinding import AgentState, Quat
    cfg = small_test_config()
    env = FakeNavEnv(cfg, seed=3)
    # center spawn so scene objects fall inside the small test grid
    env.reset(init_state=AgentState(np.zeros(3), Quat()), build_map=True)
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=1,
                            heads=2, num_registers=0)
    det = BatchColorDetector({"bed": (200, 30, 30)}, confidence=0.3)
    mem = VoxelTokenMemory(
        cfg, env=env, perception=Perception.create(
            cfg, vit_cfg=vit_cfg, batch_size=4),
        detector=det)
    obs = env.sims.get_sensor_observations(0)
    mem.excute(obs, ["turn_left"] * 12)
    mem.flush()
    assert det.single_calls == 0
    assert det.batch_calls >= 1
    assert len(mem.long_memory_dict) >= 1


def test_frontier_exploration_end_to_end():
    """explore_entire_space: vectorized navigable mask + frontier
    selection + navigation grows the map (memory_2.py:1347-1387 flow)."""
    import jax
    from bsc_nav_tpu.config import small_test_config
    from bsc_nav_tpu.agents.spatial_memory import (
        Perception, VoxelTokenMemory)
    from bsc_nav_tpu.env.fake import FakeNavEnv
    from bsc_nav_tpu.env.pathfinding import AgentState, Quat
    from bsc_nav_tpu.models import vit

    cfg = small_test_config()
    env = FakeNavEnv(cfg, seed=5)
    env.reset(init_state=AgentState(np.zeros(3), Quat()), build_map=True)
    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=32, depth=1,
                            heads=2, num_registers=0)
    mem = VoxelTokenMemory(
        cfg, env=env,
        perception=Perception.create(cfg, vit_cfg=vit_cfg, batch_size=4))
    mem.explore_entire_space(max_iterations=2, save=False)
    assert int(mem.state.num_voxels) > 100
    known = mem._known_mask()
    assert known.sum() > 50
    nav = mem._navigable_mask(np.zeros(3))
    # navigable area excludes obstacles but covers much of the room
    assert 0.1 < nav.mean() <= 1.0


def test_device_nms_matches_host_nms():
    """nms_device (batched class-wise suppression on device) keeps the
    same detection set as the host greedy NMS at conf 0.55."""
    import jax.numpy as jnp
    from bsc_nav_tpu.models import yolo_world as Y

    rng = np.random.default_rng(7)
    B, K = 4, 64
    boxes = rng.uniform(0, 600, size=(B, K, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(
        10, 120, size=(B, K, 2)).astype(np.float32)
    conf = np.sort(rng.uniform(0, 1, size=(B, K)).astype(np.float32),
                   axis=1)[:, ::-1].copy()      # desc, like decode_topk
    cls_idx = rng.integers(0, 5, size=(B, K)).astype(np.int32)

    dbx, dcf, dci, dok = Y.nms_device(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_idx),
        iou_thr=0.5, conf_thr=0.55, k_out=32)
    dbx, dcf, dci, dok = (np.asarray(a) for a in (dbx, dcf, dci, dok))

    for b in range(B):
        sel = conf[b] >= 0.55
        want = set()
        for ci in np.unique(cls_idx[b][sel]):
            m = cls_idx[b][sel] == ci
            keep = Y.nms(boxes[b][sel][m], conf[b][sel][m], 0.5)
            want |= {(float(conf[b][sel][m][k]), int(ci)) for k in keep}
        got = {(float(dcf[b, j]), int(dci[b, j]))
               for j in np.nonzero(dok[b])[0]}
        assert got == want


def test_device_nms_crowded_scene_capacity():
    """Crowded scene (review finding): >k_out disjoint above-threshold
    boxes must fill exactly k_out survivors and they must be the
    highest-confidence host-NMS keepers -- the capacity bound truncates
    by confidence, never by position or class."""
    import jax.numpy as jnp
    from bsc_nav_tpu.models import yolo_world as Y

    rng = np.random.default_rng(11)
    K, k_out = 256, 64
    # a 12x10 grid of disjoint 40px boxes: every one survives greedy NMS
    n_grid = 120
    gx, gy = np.meshgrid(np.arange(12), np.arange(10))
    x1 = (gx.ravel() * 52).astype(np.float32)
    y1 = (gy.ravel() * 52).astype(np.float32)
    boxes = np.zeros((1, K, 4), np.float32)
    conf = np.zeros((1, K), np.float32)
    cls_idx = rng.integers(0, 5, size=(1, K)).astype(np.int32)
    conf[0, :n_grid] = np.sort(rng.uniform(0.6, 1.0, n_grid))[::-1]
    boxes[0, :n_grid, 0] = x1
    boxes[0, :n_grid, 1] = y1
    boxes[0, :n_grid, 2] = x1 + 40
    boxes[0, :n_grid, 3] = y1 + 40
    # the tail: sub-threshold duplicates that must never suppress
    boxes[0, n_grid:] = boxes[0, :K - n_grid]
    conf[0, n_grid:] = 0.1

    dbx, dcf, dci, dok = (np.asarray(a) for a in Y.nms_device(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_idx),
        iou_thr=0.5, conf_thr=0.55, k_out=k_out))
    assert dok[0].sum() == k_out, "capacity must fill with survivors"
    # survivors are exactly the k_out highest-confidence grid boxes
    np.testing.assert_allclose(np.sort(dcf[0])[::-1],
                               conf[0, :k_out])
    kept = {tuple(b) for b in dbx[0][dok[0]].round(1).tolist()}
    want = {tuple(b) for b in boxes[0, :k_out].round(1).tolist()}
    assert kept == want


def test_device_instances_match_host_path():
    """Device NMS + device backprojection == the host NMS +
    instances_from_detections chain (the build loop's long-term memory
    feed, reference memory_2.py:905-945)."""
    import jax.numpy as jnp
    from bsc_nav_tpu import geometry as G
    from bsc_nav_tpu.config import small_test_config
    from bsc_nav_tpu.models import yolo_world as Y
    from bsc_nav_tpu.models.detector import Detection

    cfg = small_test_config()
    H = W = cfg.sensor.height
    det_size = 64
    rng = np.random.default_rng(3)
    B, K = 3, 32
    boxes = rng.uniform(0, det_size - 12, size=(B, K, 4)).astype(
        np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(
        2, 12, size=(B, K, 2)).astype(np.float32)
    conf = np.sort(rng.uniform(0, 1, size=(B, K)).astype(np.float32),
                   axis=1)[:, ::-1].copy()
    cls_idx = rng.integers(0, 4, size=(B, K)).astype(np.int32)
    depth = rng.uniform(0.2, 9.5, size=(B, H, W)).astype(np.float32)
    # full SE(3) transforms (rotation + translation), not just eye+t:
    # a rotation-handling bug must fail this test
    cam_tfs = np.zeros((B, 4, 4), np.float32)
    for b in range(B):
        a, be, c = rng.uniform(-np.pi, np.pi, 3)
        Rz = np.array([[np.cos(a), -np.sin(a), 0],
                       [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        Ry = np.array([[np.cos(be), 0, np.sin(be)], [0, 1, 0],
                       [-np.sin(be), 0, np.cos(be)]])
        Rx = np.array([[1, 0, 0], [0, np.cos(c), -np.sin(c)],
                       [0, np.sin(c), np.cos(c)]])
        cam_tfs[b, :3, :3] = Rz @ Ry @ Rx
        cam_tfs[b, :3, 3] = rng.uniform(-1, 1, 3)
        cam_tfs[b, 3, 3] = 1.0
    classes = ["bed", "sofa", "chair", "table"]

    nd = Y.nms_device(jnp.asarray(boxes), jnp.asarray(conf),
                      jnp.asarray(cls_idx), iou_thr=0.5, conf_thr=0.55,
                      k_out=16)
    dev = LT.instances_device(nd[0], nd[1], nd[2], nd[3],
                              jnp.asarray(depth), jnp.asarray(cam_tfs),
                              cfg, det_size)
    got = LT.instances_from_device(dev, classes)

    want = []
    for b in range(B):
        sel = conf[b] >= 0.55
        dets = []
        for ci in np.unique(cls_idx[b][sel]):
            m = cls_idx[b][sel] == ci
            for k in Y.nms(boxes[b][sel][m], conf[b][sel][m], 0.5):
                bx = boxes[b][sel][m][k] * np.array(
                    [W / det_size, H / det_size] * 2)
                bx = np.clip(bx, 0, [W, H, W, H])
                dets.append(Detection(classes[int(ci)],
                                      float(conf[b][sel][m][k]),
                                      tuple(bx.tolist())))
        want += LT.instances_from_detections(dets, depth[b], cam_tfs[b],
                                             cfg)

    key = lambda d: (d["label"], round(d["confidence"], 5),
                     tuple(d["loc"]))
    assert sorted(map(key, got)) == sorted(map(key, want))


def _prefetch_robot(monkeypatch, stage1_succeeds: bool):
    """Control-flow harness for move2textprompt's stage-2 prefetch
    (device work mocked; the real dispatch parity is covered by
    tests/test_text_query_fused.py::test_async_prefetch_matches_blocking)."""
    calls = {"async": 0, "blocking": 0, "finish": 0}

    class _Im:
        imagine_core = object()          # fused-path eligibility marker

    class _QueryCfg:
        cluster_eps = 10.0
        cluster_min_samples = 2

    class _AgentCfg:
        use_only_working_memory = False

    class _Cfg:
        agent = _AgentCfg()
        query = _QueryCfg()

    class _Mem:
        imagination = _Im()
        cfg = _Cfg()
        memory_save_path = None

        def voxel_localized_async(self, prompt, K=100, **kw):
            calls["async"] += 1
            assert prompt.startswith("ENH ")     # extended prompt reached it

            def thunk():
                calls["finish"] += 1
                top = np.array([[3, 4, 5], [3, 4, 6], [3, 5, 5]])
                return top[:1], top, np.array([0.9, 0.8, 0.7])
            return thunk

        def voxel_localized(self, *a, **kw):
            calls["blocking"] += 1
            top = np.array([[3, 4, 5]])
            return top[:1], top, np.array([0.9])

    class _Sim:
        def get_sensor_observations(self, _):
            return {"rgb": np.zeros((4, 4, 3), np.uint8)}

    class _Bench:
        sim = _Sim()

    r = R.ObjectNavRobot.__new__(R.ObjectNavRobot)
    r.memory = _Mem()
    r.benchmark_env = _Bench()
    r.task_over = False
    r.nav_log = {"long_memory_query": 0, "working_memory_query": 0,
                 "search_point": 0, "success": 0}
    monkeypatch.setattr(R.L, "imagenary_helper",
                        lambda client, t: "ENH " + t)
    r.client = None
    r.long_term_memory_retrival_v2 = lambda prompt: np.array([[1, 2, 3]])
    stage = {"n": 0}

    def navigate(best, prompt, max_candidates=3):
        stage["n"] += 1
        if stage["n"] == 1:              # stage-1 candidates
            # the stage-2 program must already be IN FLIGHT here
            assert calls["async"] == 1 and calls["finish"] == 0
            return stage1_succeeds
        return True
    r._navigate_candidates = navigate
    r._finish = lambda: "done"
    return r, calls


def test_move2textprompt_prefetch_consumed_on_stage1_miss(monkeypatch):
    r, calls = _prefetch_robot(monkeypatch, stage1_succeeds=False)
    assert r.move2textprompt("a bed") == "done"
    # stage 2 used the prefetched result: no second dispatch, no
    # blocking re-query -- one device program per retrieval stage
    assert calls == {"async": 1, "blocking": 0, "finish": 1}


def test_move2textprompt_prefetch_discarded_on_stage1_hit(monkeypatch):
    r, calls = _prefetch_robot(monkeypatch, stage1_succeeds=True)
    assert r.move2textprompt("a bed") == "done"
    assert calls["finish"] == 0 and calls["blocking"] == 0
