"""World construction for the benchmark drivers.

Builds (cfg, bench_env, memory, robot deps) from CLI flags.  Two
backends:
  --env fake     synthetic box world, runnable anywhere (CI smoke runs)
  --env habitat  habitat-sim scenes (requires the habitat conda stack;
                 gated import, reference env.py:472-499 factories)

Model weights: converted .npz checkpoints under --weights-dir activate
the real DINOv2/CLIP paths; without them the fake-world color
matchers/detectors keep every driver executable offline.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it via
# the config API BEFORE any bsc_nav_tpu import can initialize the
# backend (e.g. a module-scope constant), or a CPU-requested readiness
# check silently grabs the tunneled TPU.
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from bsc_nav_tpu.config import (
    AgentConfig, Config, MemoryConfig, QueryConfig, SensorConfig)
from bsc_nav_tpu.agents import llm as L
from bsc_nav_tpu.agents.matchers import CLIPMatcher, ColorViewScorer
from bsc_nav_tpu.agents.spatial_memory import Perception, VoxelTokenMemory
from bsc_nav_tpu.env.benchmark import FakeBenchmarkEnv, episodes_for_scene
from bsc_nav_tpu.env.fake import BoxScene
from bsc_nav_tpu.env.pathfinding import AgentState, Quat
from bsc_nav_tpu.models import vit
from bsc_nav_tpu.models.detector import ColorPrototypeDetector

FAKE_PROTOTYPES = {
    "bed": (200, 30, 30),
    "plant": (30, 180, 40),
    "sofa": (40, 60, 220),
    "tv monitor": (230, 220, 40),
    "table": (150, 90, 40),
}

# human color names for the fake objects (EQA ground truth + oracle)
FAKE_COLOR_NAMES = {
    "bed": "red",
    "plant": "green",
    "sofa": "blue",
    "tv monitor": "yellow",
    "table": "brown",
}


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--env", choices=["fake", "habitat"], default="fake")
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--csv", type=str, default=None)
    p.add_argument("--llm", choices=["mock", "openai", "local"], default="mock")
    p.add_argument("--llm-model", type=str, default="gpt-4o")
    p.add_argument("--memory-root", type=str, default="./memory")
    p.add_argument("--weights-dir", type=str, default=None)
    p.add_argument("--record-video", action="store_true")
    p.add_argument("--log-root", type=str, default="./tmp")
    p.add_argument("--use-only-working-memory", action="store_true")
    p.add_argument("--load-single-floor", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    # habitat backend paths (reference args.py:90-107)
    p.add_argument("--benchmark-dataset", default="hm3d")
    p.add_argument("--scene-prefix", default="")
    p.add_argument("--episode-prefix", default="")
    p.add_argument("--success-distance", type=float, default=None)
    p.add_argument("--store-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="token-store precision (int8: half HBM, "
                        "cosine-exact scores, faster query scans)")
    p.add_argument("--num-workers", type=int, default=1,
                   help="episode-farming worker count (benchmarks/farm.py:"
                        " strided episode split; one CSV shard per worker)")
    p.add_argument("--worker-id", type=int, default=0)
    p.add_argument("--int8", default="clip,llm,diffusion",
                   help="comma list of int8-served stages: "
                        "encoder,clip,llm,diffusion (W8A8, ops/quant.py; "
                        "defaults = the stages with measured on-TPU wins, "
                        "docs/tpu_smoke_r04.json); 'none' disables all")
    p.add_argument("--detector", default="auto",
                   choices=["auto", "clip-patch", "grounding-dino"],
                   help="long-term-memory detector backend on the "
                        "habitat path (auto: CLIP-patch when CLIP "
                        "weights exist; grounding-dino needs "
                        "grounding_dino_tiny.npz + vocab.txt under "
                        "--weights-dir)")


def fake_config(args) -> Config:
    return Config(
        sensor=SensorConfig(width=64, height=64),
        memory=MemoryConfig(
            grid_size=96, floor_height=-3.2, map_height=3.2, token_dim=32,
            cache_size=4, voxel_capacity=(1 << 13) - 8, depth_sample_rate=4),
        query=QueryConfig(top_k=32, query_width=56, query_height=56,
                          cluster_min_samples=3),
        agent=AgentConfig(
            random_move_num=3,
            use_only_working_memory=args.use_only_working_memory,
            load_single_floor=args.load_single_floor,
            max_path_len=500),
        memory_path=args.memory_root,
        seed=args.seed,
    )


def _int8_set(args):
    raw = getattr(args, "int8", "")
    if raw.strip() == "none":
        return set()
    return {t.strip() for t in raw.split(",") if t.strip()}


def habitat_config(args) -> Config:
    cfg = Config(memory_path=args.memory_root)
    int8 = _int8_set(args)
    return cfg.replace(
        agent=AgentConfig(
            use_only_working_memory=args.use_only_working_memory,
            load_single_floor=args.load_single_floor),
        models=cfg.models.__class__(
            weights_dir=args.weights_dir,
            encoder_int8="encoder" in int8,
            clip_int8="clip" in int8,
            llm_int8="llm" in int8,
            diffusion_int8="diffusion" in int8))


def make_llm(args, bench=None):
    if args.llm == "openai":
        return L.OpenAICompatClient()
    if args.llm == "local":
        # in-process Qwen2.5-VL judge (reference objnav_benchmark.py:
        # 165-171 serves it remotely; here it runs on the TPU directly)
        from bsc_nav_tpu.agents.local_vlm import load_local_vlm
        assert args.weights_dir, "--llm local needs --weights-dir"
        return load_local_vlm(args.weights_dir,
                              quantize="llm" in _int8_set(args))
    import re as _re

    def _echo_braced_goal(t):
        # instruction text like "Walk to the X and stop ..." -> one subgoal
        m = _re.search(r"Walk to the ([a-z ]+?) and stop", t)
        goal = m.group(1) if m else "bed"
        return f"1. Move to the {{{goal}}}"

    def _oracle_judge(t):
        # fake-world VLM judge: answer from the TRUE goal distance so
        # success reflects localization+navigation quality rather than
        # mock optimism (a real VLM sees the goal in the image)
        if bench is not None:
            d = bench.get_metrics()["distance_to_goal"]
            thr = getattr(bench, "success_distance", 1.5)
            if d <= thr:
                return "Success: yes\nneed forward: no"
            return "Success: no\ntoo far"
        return "Success: yes\nneed forward: no"

    def _oracle_answer(t):
        # fake-world EQA oracle: answer color questions from the scene's
        # true object colors (a real VLM reads them off the image), BUT
        # only when the agent actually got near the object -- otherwise
        # an honest "I cannot see it" (so accuracy tracks navigation)
        m = _re.search(r"[Ww]hat color is the ([a-z ]+?)\?", t)
        if m and m.group(1) in FAKE_COLOR_NAMES:
            if bench is not None:
                d = bench.get_metrics()["distance_to_goal"]
                if d > getattr(bench, "success_distance", 1.5) + 1.0:
                    return "I cannot see it from here."
            return f"It is {FAKE_COLOR_NAMES[m.group(1)]}."
        return "mock answer"

    return L.MockLLMClient(responders=[
        (lambda t: "Judge whether" in t or "Compare the goal image" in t,
         _oracle_judge),
        (lambda t: "Rewrite the following" in t, lambda t: t[-500:]),
        (lambda t: "Merge the two descriptions" in t, lambda t: t[-500:]),
        (lambda t: "Decompose the indoor navigation" in t,
         _echo_braced_goal),
        (lambda t: "names a nearby target" in t,
         lambda t: (_re.search(r"Instruction: ([a-zA-Z ]+?)\n", t)
                    or _re.search(r"Instruction: ([a-zA-Z ]+)", t)
                    ).group(1) if _re.search(
                        r"Instruction: ([a-zA-Z ]+)", t) else "a bed"),
        (lambda t: "navigates to the relevant instance" in t,
         lambda t: "Now, we need to go to {a %s}" % (
             (_re.search(r"[Ww]hat color is the ([a-z ]+?)\?", t)
              or _re.search(r"Question:.*?the ([a-z ]+?)\?", t)
              or _re.search(r"(bed)", "bed")).group(1))),
        (lambda t: "Answer the question" in t, _oracle_answer),
    ])


class SceneImagination:
    """Fake-backend imagination: render the named scene object
    (stand-in for the SD3.5 text->image path, memory_2.py:258-276)."""

    def __init__(self, cfg, scene: BoxScene):
        import math
        from bsc_nav_tpu.env.fake import FakeNavEnv
        self.scene = scene
        self.env = FakeNavEnv(cfg, scene=scene, seed=17)
        self._math = math

    def __call__(self, text: str) -> np.ndarray:
        math = self._math
        import re as _re
        box = next(
            (b for b in self.scene.boxes
             if b.label and _re.search(rf"\b{_re.escape(b.label)}\b",
                                       text)),
            self.scene.boxes[0])
        c = np.asarray(box.center)
        views = []
        for off in [(-0.8, -0.8), (-0.9, 0.0), (0.0, -0.9)]:
            pos = c + np.array([off[0], -c[1], off[1]])
            yaw = math.atan2(-(c[0] - pos[0]), -(c[2] - pos[2]))
            self.env.agent.set_state(AgentState(pos, Quat.from_yaw(yaw)))
            self.env.pitch = -math.radians(45)
            obs = self.env.sims.get_sensor_observations(0)
            views.append(obs["rgb"][:, :, :3])
        return np.stack(views)


def build_world(args, task: str = "objnav"
                ) -> Tuple[Config, object, VoxelTokenMemory, dict]:
    """Returns (cfg, bench_env, memory, extras) with extras carrying the
    llm client / matcher / imagination for robot construction."""
    # persistent compile cache for every driver/demo session (pallas-
    # location-stable keys — see utils/compile_cache.py; without it an
    # agent session repays ~5 min of compiles after ANY source edit)
    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if args.env == "habitat":
        from bsc_nav_tpu.env.habitat_env import build_habitat_world
        return build_habitat_world(args, task)

    cfg = fake_config(args)
    scene = BoxScene.default()
    episodes = episodes_for_scene(scene, start=(0.0, 0.0, 0.0),
                                  seed=args.seed)
    if task == "vlnce":
        for ep in episodes:
            ep.instruction = (f"Walk to the {ep.object_category} and stop "
                              f"right in front of it.")
    if task == "eqa":
        for ep in episodes:
            ep.question = f"What color is the {ep.object_category}?"
    if task == "textnav":
        for ep in episodes:
            ep.intrinsic_attributes = f"a {ep.object_category}"
            ep.extrinsic_attributes = "in the corner of the room"
    bench = FakeBenchmarkEnv(
        cfg, episodes, scene=scene, seed=args.seed,
        success_distance=args.success_distance or 1.5,
        topdown="vlnce" if task == "vlnce" else "fog")

    vit_cfg = vit.ViTConfig(img_size=56, patch_size=14, dim=32, depth=2,
                            heads=2, num_registers=1)
    perception = Perception.create(cfg, vit_cfg=vit_cfg,
                                   batch_size=args.batch_size)
    detector = ColorPrototypeDetector(FAKE_PROTOTYPES, confidence=0.5)
    imagination = SceneImagination(cfg, scene)
    import jax.numpy as jnp
    memory = VoxelTokenMemory(
        cfg, env=bench.nav_env, perception=perception, detector=detector,
        imagination=imagination,
        store_dtype=getattr(jnp, args.store_dtype))

    extras = {
        "llm": make_llm(args, bench=bench),
        "matcher": ColorViewScorer(FAKE_PROTOTYPES),
        "imagination": imagination,
        "scene": scene,
    }
    return cfg, bench, memory, extras


def build_memory_fake(memory, bench) -> None:
    """Build the scene memory from the agent's current pose, restoring
    the pose afterwards (shared by drivers and demo)."""
    state = bench.sim.agents[0].get_state()
    bench.nav_env.reset(
        init_state=AgentState(np.asarray(state.position), Quat()),
        build_map=True)
    memory.exploring_create_memory(save=False)
    # restore the episode start pose
    bench.nav_env.agent.set_state(state)


def ensure_memory_fake(robot, bench) -> None:
    """Build the scene memory once (the per-scene caching of the
    reference drivers, objnav_benchmark.py:1289-1294)."""
    if int(robot.memory.state.num_voxels) > 0:
        return
    build_memory_fake(robot.memory, bench)


def island_stats(bench):
    pf = bench.sim.pathfinder
    state = bench.sim.agents[0].get_state()
    island = pf.get_island(state.position)
    return island, pf.island_area(island)


def readiness_check(args) -> int:
    """One-command readiness gate: `python -m benchmarks.setup --check`.

    Validates everything the real-habitat benchmark path needs (habitat
    install, scene/dataset paths, converted weights) and then runs ONE
    mocked episode end-to-end through the actual objnav driver, so the
    first machine with habitat + scenes + checkpoints validates
    unattended (reference run path: objnav_benchmark.py:1233-1327).
    Returns a shell exit code: 0 = everything requested is ready."""
    import importlib.util
    import json as _json
    import tempfile

    ok = True

    def row(label, good, detail=""):
        nonlocal ok
        mark = "ok     " if good else "MISSING"
        print(f"  [{mark}] {label}" + (f" -- {detail}" if detail else ""))
        if not good:
            ok = False
        return good

    print("== bsc-nav-tpu readiness check ==")

    # 1. device backend (the axon TPU plugin ignores the JAX_PLATFORMS
    # env var; honor it through the config API like bench.py does)
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    try:
        devs = jax.devices()
        row("jax backend", True, f"{jax.default_backend()}: {devs}")
    except Exception as e:                      # noqa: BLE001
        row("jax backend", False, f"{type(e).__name__}: {e}")

    # 2. habitat-sim (the only habitat package the env layer imports).
    # Only fatal when the invocation actually asked for habitat; a
    # machine running the offline stack is still READY without it.
    habitat_requested = bool(args.scene_prefix or args.episode_prefix
                             or args.env == "habitat")
    have_habitat = importlib.util.find_spec("habitat_sim") is not None
    if have_habitat or habitat_requested:
        row("habitat_sim importable", have_habitat,
            "" if have_habitat else "conda install habitat-sim")
    else:
        print("  [absent ] habitat_sim (optional here; fake backend "
              "fully usable -- pass --scene-prefix/--episode-prefix to "
              "require it)")

    # 3. dataset/scene paths (only judged if the user pointed at them)
    episodes = []
    if args.episode_prefix:
        try:
            from bsc_nav_tpu.env import datasets as DS
            loader = (DS.load_r2r_episodes if args.task == "vlnce"
                      else DS.load_objectnav_episodes)
            episodes = loader(args.episode_prefix, limit=1)
            row("episode dataset parses", bool(episodes),
                f"{args.episode_prefix}")
        except Exception as e:                  # noqa: BLE001
            row("episode dataset parses", False,
                f"{args.episode_prefix}: {type(e).__name__}: {e}")
    else:
        print("  [skip   ] --episode-prefix not given")
    if args.scene_prefix:
        if episodes:
            sp = os.path.join(args.scene_prefix, episodes[0].scene_id)
            row("first episode scene file", os.path.exists(sp), sp)
        else:
            row("scene prefix exists", os.path.isdir(args.scene_prefix),
                args.scene_prefix)
    else:
        print("  [skip   ] --scene-prefix not given")

    # 4. converted checkpoints (tools/weights_manifest.json contract)
    if args.weights_dir:
        man = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "weights_manifest.json")
        with open(man) as f:
            models = _json.load(f)["models"]
        missing = [m["out"] for m in models.values()
                   if not os.path.exists(
                       os.path.join(args.weights_dir, m["out"]))]
        row("converted weights complete", not missing,
            ("all present; run `python tools/convert_weights.py "
             "verify-all --manifest` for parity" if not missing else
             f"missing from {args.weights_dir}: {', '.join(missing)}"))
    else:
        print("  [skip   ] --weights-dir not given (random-init serving)")

    # 5. one mocked episode end-to-end through the REAL driver
    from benchmarks import objnav as _objnav
    with tempfile.TemporaryDirectory() as td:
        try:
            recs = _objnav.main([
                "--env", "fake", "--episodes", "1", "--llm", "mock",
                "--csv", os.path.join(td, "check.csv"),
                "--log-root", td, "--memory-root", td])
            row("mocked episode end-to-end", bool(recs),
                f"success={recs[0].metrics['success']:.0f} "
                f"spl={recs[0].metrics['spl']:.2f}" if recs else "")
        except Exception as e:                  # noqa: BLE001
            row("mocked episode end-to-end", False,
                f"{type(e).__name__}: {e}")

    # 6. the real habitat world, if everything for it is present
    if have_habitat and episodes and args.scene_prefix:
        try:
            import copy
            a = copy.copy(args)
            a.env, a.episodes = "habitat", 1
            cfg, bench, memory, extras = build_world(a, task=args.task)
            bench.reset()
            m = bench.get_metrics()
            row("habitat world builds + resets", True,
                f"distance_to_goal={m['distance_to_goal']:.2f}")
        except Exception as e:                  # noqa: BLE001
            row("habitat world builds + resets", False,
                f"{type(e).__name__}: {e}")
    else:
        print("  [skip   ] habitat world (needs habitat_sim + "
              "--scene-prefix + --episode-prefix)")

    print(f"== readiness: {'READY' if ok else 'NOT READY'} ==")
    return 0 if ok else 1


if __name__ == "__main__":
    _p = argparse.ArgumentParser(
        description="readiness check: python -m benchmarks.setup --check")
    add_common_args(_p)
    _p.add_argument("--check", action="store_true")
    _p.add_argument("--task", default="objnav",
                    choices=["objnav", "ovnav", "imagenav", "textnav",
                             "vlnce", "eqa"])
    _a = _p.parse_args()
    if not _a.check:
        _p.error("this module is a library; the only CLI is --check")
    raise SystemExit(readiness_check(_a))
