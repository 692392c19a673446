"""Host-side spatial memory agent: the framework's `VoxelTokenMemory`.

Mirrors the reference class of the same name (reference memory_2.py:38)
with a TPU-first split: the env stepping, detector bookkeeping, floor
logic and persistence live here on host; everything between "RGB-D frame
+ pose in" and "top-K voxels out" runs as the jitted pipelines in
memory/pipeline.py.  Frames are queued and ingested in fixed-size
batches (static shapes; short batches are padded with zero-depth frames
whose points are all masked invalid).

Public surface (reference memory_2.py):
  excute, obs2voxeltoken, long_memory, long_memory_integration,
  long_memory_filter, voxel_localized, imaginary, load_memory,
  create_memory, exploring_create_memory, explore_entire_space.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from bsc_nav_tpu import geometry as G
from bsc_nav_tpu.config import Config
from bsc_nav_tpu.memory import floors as F
from bsc_nav_tpu.memory import frontier as FR
from bsc_nav_tpu.memory import longterm as LT
from bsc_nav_tpu.memory import persistence as P
from bsc_nav_tpu.memory.pipeline import make_build_step, make_query_step
from bsc_nav_tpu.memory.store import init_store
from bsc_nav_tpu.models import vit


@dataclasses.dataclass
class Perception:
    """Bundle of compiled perception programs shared across scenes
    (the reference preloads DINOv2/YOLO once and passes them in,
    create_memory_for_dataset.py:58-60)."""

    vit_params: dict
    vit_cfg: vit.ViTConfig
    build_step: Callable
    query_step: Callable
    pool_step: Optional[Callable] = None   # images -> pooled query vector
    batch_size: int = 8
    compute_dtype: object = jnp.float32

    @staticmethod
    def create(cfg: Config, vit_cfg: Optional[vit.ViTConfig] = None,
               vit_params: Optional[dict] = None, batch_size: int = 8,
               compute_dtype=jnp.float32, seed: int = 0) -> "Perception":
        vit_cfg = vit_cfg or vit.CONFIGS[cfg.models.encoder]
        if vit_params is None:
            weights = (os.path.join(cfg.models.weights_dir,
                                    cfg.models.encoder + ".npz")
                       if cfg.models.weights_dir else None)
            if weights and os.path.exists(weights):
                from bsc_nav_tpu.models.weights import load_dinov2_npz
                vit_params = load_dinov2_npz(weights, vit_cfg)
            else:
                if weights:
                    # loud, not silent: a typo'd weights dir would
                    # otherwise run the full benchmark on noise
                    # embeddings and look like an algorithmic
                    # regression (review finding).  No weights dir at
                    # all = intentional random init (tests/fake world).
                    import sys
                    print(
                        f"[perception] WARNING: encoder weights not "
                        f"found at {weights!r} -- using RANDOM-INIT "
                        f"{cfg.models.encoder} params (meaningless for "
                        f"real scenes)", file=sys.stderr)
                vit_params = vit.init_params(
                    vit_cfg, jax.random.PRNGKey(seed))
        if cfg.models.encoder_int8:
            # serving-only W8A8 (config.ModelConfig.encoder_int8); the
            # dispatching _linear serves quantized leaves transparently
            # in build/query/pool programs alike
            vit_params = vit.quantize_params(vit_params)
        from bsc_nav_tpu.memory.query import gaussian_center_pool

        @jax.jit
        def pool_step(params, images_uint8):
            q = (cfg.query.query_height, cfg.query.query_width)
            x = vit.preprocess(images_uint8, out_hw=q).astype(compute_dtype)
            tokens = vit.forward_features(
                params, x, vit_cfg)["x_norm_patchtokens"]
            return gaussian_center_pool(tokens)

        return Perception(
            vit_params=vit_params,
            vit_cfg=vit_cfg,
            build_step=make_build_step(cfg, vit_cfg, compute_dtype),
            query_step=make_query_step(cfg, vit_cfg, compute_dtype),
            pool_step=pool_step,
            batch_size=batch_size,
            compute_dtype=compute_dtype,
        )


def state_to_pose_vec(agent_state) -> np.ndarray:
    """habitat AgentState -> (px,py,pz,qx,qy,qz,qw)."""
    p, r = agent_state.position, agent_state.rotation
    return np.array([p[0], p[1], p[2], r.x, r.y, r.z, r.w], np.float32)


class VoxelTokenMemory:
    def __init__(self, cfg: Config, env, perception: Perception,
                 detector=None, imagination=None,
                 memory_path: Optional[str] = None,
                 store_dtype=jnp.float32,
                 segmented: bool = False,
                 max_device_segments: int = 1,
                 text_query_split: Optional[bool] = None):
        self.cfg = cfg
        self.Env = env
        self.perception = perception
        self.detector = detector
        self.imagination = imagination
        self._text_query_step = None     # lazily-built fused text query
        self._text_pool_step = None      # lazily-built split first half
        # split text query: imagination+encode+pool in one program, the
        # localize scan in a second, chained device-side ([D] pooled
        # handoff, no host round trip).  None = auto: split when T5
        # conditioning meets a big store -- the one combination whose
        # single fused program exceeds the TPU compile server (round-5
        # bisection, tools/t5_compile_bisect.py: 2^14-voxel store
        # compiles fused+T5, 2^18 does not)
        self.text_query_split = text_query_split
        self.last_imagined = None        # device imgs from the last one
        self.memory_save_path = memory_path or os.path.join(
            cfg.memory_path, cfg.sim.scene_name)

        self.store_dtype = store_dtype
        self.segments = None
        if segmented:
            from bsc_nav_tpu.memory.segments import SegmentedStore
            self.segments = SegmentedStore(
                cfg.memory, store_dtype=store_dtype,
                max_device_segments=max_device_segments)
            self.state = self.segments.state
        else:
            self.state = init_store(cfg.memory, store_dtype=store_dtype)
        self._key = jax.random.PRNGKey(cfg.seed)
        self._queue: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._inv_init_host: Optional[np.ndarray] = None
        self._base_tf = G.base_axes_transform()
        self._base2cam = G.base_to_cam_transform(cfg.sensor.sensor_height)

        self.long_memory_dict: List[dict] = []
        self.base_height: List[float] = []
        self.step_count = 0

        self.load_single_floor = cfg.agent.load_single_floor
        self.floor_min_height: Optional[int] = None
        self.floor_max_height: Optional[int] = None

        # convenience aliases used by the robots (reference naming)
        self.gs = cfg.memory.grid_size
        self.cs = cfg.memory.cell_size
        self.minh = cfg.memory.zmin
        self.maxh = cfg.memory.zmax

    # ------------------------------------------------------------------
    # frame ingestion
    # ------------------------------------------------------------------
    def _host_cam_to_world(self, pose: np.ndarray) -> np.ndarray:
        hab = np.asarray(G.pose_vec_to_tf(jnp.asarray(pose, jnp.float32)))
        base_pose = self._base_tf @ hab @ np.linalg.inv(self._base_tf)
        if self._inv_init_host is None:
            init = self._base_tf @ hab @ np.linalg.inv(self._base_tf)
            self._inv_init_host = np.linalg.inv(init)
        tf = self._inv_init_host @ base_pose
        return tf @ self._base_tf @ self._base2cam

    def push_frame(self, obs, pose: np.ndarray) -> None:
        rgb = np.asarray(obs["rgb"])[:, :, :3]
        depth = np.asarray(obs["depth"], np.float32)
        cam_tf = self._host_cam_to_world(pose)
        self._queue.append((rgb, depth, pose.astype(np.float32)))
        if self.detector is not None and not hasattr(self.detector,
                                                     "detect_batch"):
            # host-only detectors run inline; device-backed detectors
            # (detect_batch) run once per flush to amortize dispatch
            dets = self.detector.detect(rgb)
            if dets:
                self.long_memory_dict.extend(
                    LT.instances_from_detections(
                        dets, depth, cam_tf, self.cfg))
                self.long_memory_integration()
        if len(self._queue) >= self.perception.batch_size:
            self.flush()

    def flush(self) -> None:
        """Ingest all queued frames (padding the batch with zero-depth
        frames, whose points all fail the min-depth gate)."""
        if not self._queue:
            return
        B = self.perception.batch_size
        H, W = self.cfg.sensor.height, self.cfg.sensor.width
        if self.detector is not None and hasattr(
                self.detector, "detect_batch_instances"):
            # fully device-side long-term feed (forward -> decode ->
            # NMS -> depth backprojection in ONE dispatch; host python
            # in the build loop contends with the tunnel client)
            rgbs = np.stack([f[0] for f in self._queue])
            depths = np.stack([f[1] for f in self._queue])
            cam_tfs = np.stack([self._host_cam_to_world(f[2])
                                for f in self._queue])
            new = self.detector.detect_batch_instances(
                rgbs, depths, cam_tfs, self.cfg)
            if new:
                self.long_memory_dict.extend(new)
                self.long_memory_integration()
        elif self.detector is not None and hasattr(self.detector,
                                                   "detect_batch"):
            rgbs = np.stack([f[0] for f in self._queue])
            all_dets = self.detector.detect_batch(rgbs)
            for (rgb_f, depth_f, pose_f), dets in zip(self._queue, all_dets):
                if dets:
                    cam_tf = self._host_cam_to_world(pose_f)
                    self.long_memory_dict.extend(
                        LT.instances_from_detections(
                            dets, depth_f, cam_tf, self.cfg))
            if any(all_dets):
                self.long_memory_integration()
        while self._queue:
            chunk = self._queue[:B]
            self._queue = self._queue[B:]
            n = len(chunk)
            rgb = np.zeros((B, H, W, 3), np.uint8)
            depth = np.zeros((B, H, W), np.float32)
            poses = np.tile(chunk[0][2], (B, 1))
            for i, (r, d, p) in enumerate(chunk):
                rgb[i], depth[i], poses[i] = r, d, p
            carry = (self.state, self._key)
            carry, stats = self.perception.build_step(
                carry, self.perception.vit_params,
                jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses))
            self.state, self._key = carry
            if self.segments is not None:
                self.segments.state = self.state
                if self.segments.rotate_if_full():
                    self.state = self.segments.state

    # reference single-frame API (memory_2.py:842)
    def obs2voxeltoken(self, obs, pose: np.ndarray) -> None:
        self.push_frame(obs, np.asarray(pose, np.float32))

    def long_memory(self, obs) -> None:
        """Standalone detector pass (memory_2.py:905); push_frame already
        runs detection when a detector is configured."""
        if self.detector is None:
            return
        state = self.Env.agent.get_state()
        pose = state_to_pose_vec(state)
        rgb = np.asarray(obs["rgb"])[:, :, :3]
        depth = np.asarray(obs["depth"], np.float32)
        dets = self.detector.detect(rgb)
        if dets:
            cam_tf = self._host_cam_to_world(pose)
            self.long_memory_dict.extend(
                LT.instances_from_detections(dets, depth, cam_tf, self.cfg))
        self.long_memory_integration()

    def long_memory_integration(self, threshold: Optional[int] = None):
        self.long_memory_dict = LT.integrate(
            self.long_memory_dict,
            threshold or self.cfg.detector.dedup_l1_threshold)

    def long_memory_filter(self) -> List[dict]:
        if self.load_single_floor and self.floor_min_height is not None:
            return LT.filter_by_floor(
                self.long_memory_dict, self.floor_min_height,
                self.floor_max_height)
        return self.long_memory_dict

    # ------------------------------------------------------------------
    # env stepping (reference excute, memory_2.py:1086-1101)
    # ------------------------------------------------------------------
    def excute(self, obs, actions: Sequence[str]):
        for action in actions:
            if action == "stop":
                continue
            obs = self.Env.sims.step(action)
            self.step_count += 1
            state = self.Env.agent.get_state()
            if self.step_count % 10 == 0:
                self.base_height.append(float(state.position[1]))
            self.push_frame(obs, state_to_pose_vec(state))
        return obs

    # ------------------------------------------------------------------
    # queries (reference voxel_localized, memory_2.py:563-671)
    # ------------------------------------------------------------------
    def imaginary(self, text_prompt: str) -> np.ndarray:
        """text -> query images via the imagination model
        (memory_2.py:258-276; SD3.5 in the reference, pluggable here)."""
        if self.imagination is None:
            raise RuntimeError(
                "no imagination model configured (text queries need one; "
                "pass imagination= to VoxelTokenMemory)")
        return self.imagination(text_prompt)

    def _mask_kwargs(self, region_radius: float, curr_grid):
        """Region + single-floor mask arguments shared by every
        localize-shaped jitted step (query_step / text_query_step)."""
        use_region = bool(np.isfinite(region_radius))
        use_floor = (self.load_single_floor
                     and self.floor_min_height is not None)
        return dict(
            use_region=use_region,
            curr_grid=jnp.asarray(
                curr_grid if curr_grid is not None else np.zeros(3),
                jnp.int32),
            region_radius=float(region_radius if use_region else 0.0),
            use_floor=bool(use_floor),
            floor_range=jnp.asarray(
                [self.floor_min_height or 0, self.floor_max_height or 0],
                jnp.int32),
        )

    @staticmethod
    def _live_topk(positions, scores):
        """Drop -inf (masked / empty-store) rows; reference returns only
        occupied voxels (memory_2.py:653-671)."""
        positions = np.asarray(positions)
        scores = np.asarray(scores)
        live = scores > -np.inf
        positions, scores = positions[live], scores[live]
        if len(positions) == 0:
            return np.zeros((0, 3), int), np.zeros((0, 3), int), scores
        return positions[:1], positions, scores

    def _get_text_query_step(self):
        if self._text_query_step is None:
            from bsc_nav_tpu.memory.pipeline import make_text_query_step
            self._text_query_step = make_text_query_step(
                self.cfg, self.perception.vit_cfg, self.imagination,
                self.perception.compute_dtype)
        return self._text_query_step

    def _get_text_pool_step(self):
        if self._text_pool_step is None:
            from bsc_nav_tpu.memory.pipeline import make_text_pool_step
            self._text_pool_step = make_text_pool_step(
                self.cfg, self.perception.vit_cfg, self.imagination,
                self.perception.compute_dtype)
        return self._text_pool_step

    def _use_split_textq(self) -> bool:
        if self.text_query_split is not None:
            return self.text_query_split
        return (getattr(self.imagination, "t5_params", None) is not None
                and self.state.feat_count.shape[0] > (1 << 16))

    def voxel_localized_async(self, prompt, K: int = 100,
                              region_radius: float = np.inf,
                              curr_grid=None):
        """Dispatch the fused text query WITHOUT materializing: returns
        a zero-arg thunk producing voxel_localized's (best, topk, sims)
        tuple, or None when the fused single-program path is unavailable
        (non-str prompt, no composable imagination, segmented store).

        JAX dispatch is asynchronous, so the ~seconds of diffusion
        sampling + store scan run on device while the host keeps
        stepping the simulator: the agent PREFETCHES stage-2 retrieval
        at the decision point and overlaps it with stage-1 navigation
        (the reference pays the two stages serially,
        objnav_benchmark.py:519-574 then memory_2.py:563-671)."""
        if not (isinstance(prompt, str)
                and self.imagination is not None
                and hasattr(self.imagination, "imagine_core")
                and not (self.segments is not None
                         and self.segments.num_segments > 1)):
            return None
        self.flush()
        im = self.imagination
        ids, ids_u, t5_ids, t5_ids_u = im.prep_inputs(prompt)
        if self._use_split_textq():
            # device-chained split: pooled [D] handoff, no host sync
            from bsc_nav_tpu.memory.query import localize
            pooled, imgs = self._get_text_pool_step()(
                self.perception.vit_params, im.mmdit_params,
                im.vae_params, im.text_params, im.t5_params,
                ids, ids_u, t5_ids, t5_ids_u, im.next_key())
            positions, scores = localize(
                self.state, pooled, top_k=K,
                **self._mask_kwargs(region_radius, curr_grid))
        else:
            positions, scores, imgs = self._get_text_query_step()(
                self.state, self.perception.vit_params,
                im.mmdit_params, im.vae_params, im.text_params,
                im.t5_params, ids, ids_u, t5_ids, t5_ids_u, im.next_key(),
                top_k=K, **self._mask_kwargs(region_radius, curr_grid))

        def finish():
            # device arrays, unsynced until here: consumers that want
            # the imagined views (VLM verification, visualization)
            # materialize lazily
            self.last_imagined = imgs
            return self._live_topk(positions, scores)

        return finish

    def _voxel_localized_text_fused(self, prompt: str, K: int,
                                    region_radius: float, curr_grid):
        """Single-program text query: imagination + encode + localize
        traced together (memory.pipeline.make_text_query_step) -- no
        decoded-image round trip through the host between the diffusion
        samples and the DINOv2 encode."""
        return self.voxel_localized_async(
            prompt, K, region_radius, curr_grid)()

    def voxel_localized(self, prompt, K: int = 100,
                        region_radius: float = np.inf,
                        curr_grid=None):
        """Returns (best_pos [1,3], top_k_positions [<=K,3],
        top_k_similarity [<=K]) like memory_2.py:671."""
        self.flush()
        if isinstance(prompt, str):
            if (self.imagination is not None
                    and hasattr(self.imagination, "imagine_core")
                    and not (self.segments is not None
                             and self.segments.num_segments > 1)):
                return self._voxel_localized_text_fused(
                    prompt, K, region_radius, curr_grid)
            imgs = self.imaginary(prompt)
        else:
            arr = np.asarray(prompt)
            imgs = arr[None] if arr.ndim == 3 else arr
            imgs = imgs[:, :, :, :3]
        imgs = jnp.asarray(imgs.astype(np.uint8))

        use_region = np.isfinite(region_radius)
        use_floor = (self.load_single_floor
                     and self.floor_min_height is not None)

        if self.segments is not None and self.segments.num_segments > 1:
            # segmented scenes: pooled query vector, global merged top-K
            self.segments.state = self.state
            pooled = self.perception.pool_step(
                self.perception.vit_params, imgs)
            kwargs = {}
            if use_region:
                kwargs = dict(use_region=True,
                              curr_grid=jnp.asarray(curr_grid, jnp.int32),
                              region_radius=float(region_radius))
            if use_floor:
                kwargs.update(use_floor=True, floor_range=jnp.asarray(
                    [self.floor_min_height, self.floor_max_height],
                    jnp.int32))
            positions, scores = self.segments.localize(
                pooled, top_k=K, **kwargs)
            if len(positions) == 0:
                return (np.zeros((0, 3), int), np.zeros((0, 3), int),
                        np.zeros((0,), np.float32))
            return positions[:1], positions, scores

        positions, scores = self.perception.query_step(
            self.state, self.perception.vit_params, imgs, top_k=K,
            **self._mask_kwargs(region_radius, curr_grid))
        return self._live_topk(positions, scores)

    def voxel_localized_batch(self, prompts, K: int = 100,
                              region_radii=None, curr_grid=None):
        """Localize MULTIPLE queries against the store in ONE pass.

        The single-query scan is matvec-limited (one active MXU column,
        CLAUDE.md perf note); batching turns it into a [VK, D] x [D, Q]
        matmul so Q queries cost barely more than one.  Each prompt may
        be a str (runs the imagination model), an image [H, W, 3], or an
        image group [N, H, W, 3].  Repeated prompts (same str, or the
        same array object) are pooled/imagined ONCE -- a growing-radius
        sweep passes the same prompt with different radii and pays for
        one imagination run.  Returns a list of
        (best_pos [1,3], top_k_positions, top_k_similarity) tuples with
        the same semantics as voxel_localized, including the
        single-floor height mask and (when region_radii is given, one
        radius per prompt with np.inf = unrestricted, around curr_grid
        [3] or per-query [Q,3]) the region-radius mask."""
        import jax.numpy as jnp
        from bsc_nav_tpu.memory.query import localize_batch

        self.flush()
        pooled = []
        pooled_cache = {}
        for p in prompts:
            key = p if isinstance(p, str) else id(p)
            if key in pooled_cache:
                pooled.append(pooled_cache[key])
                continue
            if isinstance(p, str):
                imgs = self.imaginary(p)
            else:
                arr = np.asarray(p)
                imgs = arr[None] if arr.ndim == 3 else arr
            imgs = jnp.asarray(imgs[:, :, :, :3].astype(np.uint8))
            q = self.perception.pool_step(self.perception.vit_params, imgs)
            pooled_cache[key] = q
            pooled.append(q)

        # same single-floor mask as voxel_localized
        use_floor = (self.load_single_floor
                     and self.floor_min_height is not None)
        floor_kwargs = dict(
            use_floor=True,
            floor_range=jnp.asarray(
                [self.floor_min_height, self.floor_max_height],
                jnp.int32)) if use_floor else {}

        Q = len(prompts)
        radii = (np.full(Q, np.inf, np.float32) if region_radii is None
                 else np.asarray(region_radii, np.float32))
        grids = None
        if curr_grid is not None:
            grids = np.asarray(curr_grid, np.int32)
            if grids.ndim == 1:
                grids = np.broadcast_to(grids, (Q, 3))
        assert grids is not None or not np.isfinite(radii).any(), (
            "finite region_radii need curr_grid")

        if self.segments is not None and self.segments.num_segments > 1:
            # segmented scenes: per-query merged top-K across segments
            self.segments.state = self.state
            out = []
            for qi, q in enumerate(pooled):
                kwargs = dict(floor_kwargs)
                if np.isfinite(radii[qi]):
                    kwargs.update(
                        use_region=True,
                        curr_grid=jnp.asarray(grids[qi], jnp.int32),
                        region_radius=float(radii[qi]))
                positions, scores = self.segments.localize(
                    q, top_k=K, **kwargs)
                out.append((positions[:1], positions, scores)
                           if len(positions) else
                           (np.zeros((0, 3), int), np.zeros((0, 3), int),
                            np.zeros((0,), np.float32)))
            return out

        region_kwargs = {}
        if np.isfinite(radii).any():
            region_kwargs = dict(
                use_region=True,
                curr_grid=jnp.asarray(grids, jnp.int32),
                region_radii=jnp.asarray(radii))
        positions, scores = localize_batch(
            self.state, jnp.stack(pooled), top_k=K, **floor_kwargs,
            **region_kwargs)
        positions = np.asarray(positions)
        scores = np.asarray(scores)
        out = []
        for q in range(len(prompts)):
            live = scores[q] > -np.inf
            pos, sc = positions[q][live], scores[q][live]
            out.append((pos[:1], pos, sc) if len(pos) else
                       (np.zeros((0, 3), int), np.zeros((0, 3), int), sc))
        return out

    # ------------------------------------------------------------------
    # memory construction flows
    # ------------------------------------------------------------------
    def exploring_create_memory(self, save: bool = True) -> None:
        """Random-walk mapping (memory_2.py:1104-1145): visit
        random_move_num same-island waypoints, spinning 360deg at each."""
        pf = self.Env.plnner.pathfinder
        obs = self.Env.sims.get_sensor_observations(0)
        state = self.Env.agent.get_state()
        self.push_frame(obs, state_to_pose_vec(state))
        n_turns = int(360 / self.cfg.actions.turn_left_deg)
        for _ in range(self.cfg.agent.random_move_num):
            island_begin = pf.get_island(self.Env.agent.get_state().position)
            subgoal = pf.get_random_navigable_point()
            tries = 0
            while ((not pf.is_navigable(subgoal)
                    or pf.get_island(subgoal) != island_begin)
                   and tries < 100):
                subgoal = pf.get_random_navigable_point()
                tries += 1
            try:
                path, goal = self.Env.move2point(subgoal)
                obs = self.excute(obs, path)
                self.base_height.append(
                    float(self.Env.agent.get_state().position[1]))
                obs = self.excute(obs, ["turn_left"] * n_turns)
            except Exception as e:          # noqa: BLE001 (nav failures)
                print(f"move failed: {e}")
                continue
        self.flush()
        if save:
            self.save()

    def explore_entire_space(self, max_iterations: Optional[int] = None,
                             save: bool = True) -> None:
        """Frontier exploration (memory_2.py:1347-1387) using the
        vectorized frontier ops."""
        max_iterations = max_iterations or self.cfg.agent.explore_max_iterations
        n_turns = int(360 / self.cfg.actions.turn_left_deg)
        obs = self.Env.sims.get_sensor_observations(0)
        origin = np.asarray(self.Env.original_state.position)
        for _ in range(max_iterations):
            obs = self.excute(obs, ["turn_left"] * n_turns)
            self.flush()
            known = self._known_mask()
            navigable = self._navigable_mask(origin)
            target = FR.select_frontier_target(known, navigable)
            if target is None:
                break
            subgoal = self._grid2loc_2d(target[0], target[1], origin)
            subgoal = self.Env.get_navigable_point_near(subgoal)
            try:
                path, goal = self.Env.move2point(subgoal)
                obs = self.excute(obs, path)
            except Exception as e:          # noqa: BLE001
                print(f"frontier move failed: {e}")
                continue
        self.flush()
        if save:
            self.save()

    def _known_mask(self) -> np.ndarray:
        gs = self.gs
        cv = np.asarray(self.state.cv_map)[: gs * gs].reshape(gs, gs, 3)
        return cv.sum(axis=-1) > 0

    def _navigable_mask(self, origin: np.ndarray) -> np.ndarray:
        """Memory-grid-aligned navigability mask (the reference's
        build_navigable_mask, memory_2.py:1174-1184, was a 1000^2 Python
        loop over navmesh queries -- hot loop #4).  Grid pathfinders are
        sampled vectorized; navmesh pathfinders fall back to per-cell
        queries (candidate for the C++ runtime on large grids)."""
        gs, cs = self.gs, self.cs
        rows = origin[2] + (np.arange(gs) - gs // 2) * cs   # world z
        cols = origin[0] + (np.arange(gs) - gs // 2) * cs   # world x
        pf = self.Env.plnner.pathfinder
        if hasattr(pf, "nav"):
            # vectorized cell lookup into the occupancy grid
            i = np.floor((cols - pf.origin[0]) / pf.res).astype(int)
            j = np.floor((rows - pf.origin[1]) / pf.res).astype(int)
            ok_i = (i >= 0) & (i < pf.nav.shape[0])
            ok_j = (j >= 0) & (j < pf.nav.shape[1])
            out = np.zeros((gs, gs), bool)
            ii = np.clip(i, 0, pf.nav.shape[0] - 1)
            jj = np.clip(j, 0, pf.nav.shape[1] - 1)
            # memory grid is (row=z, col=x)
            out[:, :] = pf.nav[ii[None, :], jj[:, None]]
            out &= ok_i[None, :] & ok_j[:, None]
            return out
        out = np.zeros((gs, gs), bool)
        for r in range(gs):
            for c in range(gs):
                out[r, c] = pf.is_navigable(
                    np.array([cols[c], origin[1], rows[r]]))
        return out

    def _grid2loc_2d(self, x: float, y: float, origin: np.ndarray):
        """Frontier grid cell -> world (memory_2.py:1148-1158); formula
        shared with geometry.grid_to_world_2d."""
        return G.grid_to_world_2d((x, y), origin, self.gs, self.cs)

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def save(self, path: Optional[str] = None) -> None:
        self.flush()
        path = path or self.memory_save_path
        P.save_reference_format(
            self.state, path, self.cfg.memory,
            original_pos=np.asarray(self.Env.original_state.position),
            base_height=self.base_height,
            long_memory=self.long_memory_dict)

    def load_memory(self, init_state=None, build_map: bool = False,
                    path: Optional[str] = None) -> None:
        path = path or self.memory_save_path
        self.Env.reset(init_state=init_state, build_map=build_map)
        if build_map:
            return
        self.state, meta = P.load_reference_format(
            path, self.cfg.memory, store_dtype=self.store_dtype)
        self.long_memory_dict = list(meta["long_memory"])
        self.base_height = list(meta["base_height"])
        self.Env.original_state.position = np.asarray(meta["original_pos"])
        # rebase the frame chain to the SAVED build-start pose (identity
        # rotation -- build_map keeps the grid axis-aligned, reference
        # env.py:66-70): continued ingestion and host detections must
        # land in the loaded map's coordinates, not the global/current
        # frame (review finding)
        pose0 = np.concatenate(
            [np.asarray(meta["original_pos"], np.float32),
             np.asarray([0, 0, 0, 1], np.float32)])
        inv_init = np.asarray(G.initial_base_inverse(
            jnp.asarray(pose0), jnp.asarray(self._base_tf, jnp.float32)))
        self.state = self.state.replace(
            inv_init_base_tf=jnp.asarray(inv_init, jnp.float32))
        self._inv_init_host = inv_init.astype(np.float64)
        if self.load_single_floor and len(self.base_height):
            n = int(self.state.num_voxels)
            heights = np.asarray(self.state.slot_pos)[:n, 2]
            agent_h = float(self.Env.agent.get_state().position[1])
            _, self.floor_min_height, self.floor_max_height = (
                F.current_floor_range(
                    self.base_height, agent_h, heights, self.cs))

    # reference alias (create_memory is keyboard-driven there,
    # memory_2.py:1027; headless builds use the exploring variant)
    def create_memory(self) -> None:
        self.exploring_create_memory()
