"""Headline benchmark: memory-build throughput at the reference workload.

Workload definition (BASELINE.md "perf-relevant reference constants"):
  680x680 RGB-D frames, DINOv2 ViT-L/14-reg patch encoder @224 (random
  bf16 weights -- identical FLOPs to the real checkpoint), ~462
  backprojected points/frame (depth_sample_rate 1000), voxel grid
  1000^2 x 200 @ 0.1 m, <=10 tokens/voxel.

Reference baseline: the A100 reference path executes DINOv2 forward +
a per-point Python loop + chunked HDF5 writes per frame
(memory_2.py:842-903, :326-358).  Its wall clock is printed but not
recorded in the repo (BASELINE.md); we use a deliberately GENEROUS
estimate of 10 frames/sec for the A100 reference (DINOv2 ViT-L fp32
forward alone is ~25 ms/frame unbatched; the Python voxel loop and HDF5
flushes come on top), so vs_baseline = fps / 10.0 understates the gain.

Prints ONE JSON line:
  {"metric": "memory_build_frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N/10, ...}
"""

import json
import os
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import numpy as np


REFERENCE_A100_FPS_ESTIMATE = 10.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the big pipelines take minutes to compile
    # cold; cached runs start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/bsc_nav_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from bsc_nav_tpu.config import Config, MemoryConfig
    from bsc_nav_tpu.memory.pipeline import make_build_step, make_query_step
    from bsc_nav_tpu.memory.store import init_store, store_nbytes
    from bsc_nav_tpu.models import vit

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # full reference workload geometry; capacity sized for one scene
    cfg = Config(
        memory=MemoryConfig(voxel_capacity=(1 << 18) - 8),
    )
    vit_cfg = vit.DINOV2_VITL14_REG
    store_dtype = jnp.bfloat16
    log(f"store bytes: {store_nbytes(cfg.memory, store_dtype)/1e9:.2f} GB")

    B = int(os.environ.get("BENCH_BATCH", 32))
    H, W = cfg.sensor.height, cfg.sensor.width
    rng = np.random.default_rng(0)

    params = vit.init_params(vit_cfg, jax.random.PRNGKey(0),
                             dtype=jnp.bfloat16)
    state = init_store(cfg.memory, store_dtype=store_dtype)
    build_step = make_build_step(cfg, vit_cfg, compute_dtype=jnp.bfloat16)
    query_step = make_query_step(cfg, vit_cfg, compute_dtype=jnp.bfloat16)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        rgb = jnp.asarray(r.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8))
        depth = jnp.asarray(r.uniform(0.3, 9.0, size=(B, H, W)), jnp.float32)
        poses = np.zeros((B, 7), np.float32)
        poses[:, :3] = r.uniform(-5, 5, size=(B, 3))
        poses[:, 6] = 1.0
        return rgb, depth, jnp.asarray(poses)

    batches = [make_batch(s) for s in range(4)]

    # warmup / compile.  NOTE: sync via value materialization --
    # block_until_ready does not reliably wait on tunneled TPU runtimes.
    carry = (state, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    carry, stats = build_step(carry, params, *batches[0])
    log(f"build compile+first: {time.perf_counter()-t0:.1f}s, "
        f"voxels={int(stats['num_voxels'])}")

    # timed build (no eager host ops inside the loop)
    n_iters = 12
    t0 = time.perf_counter()
    for i in range(n_iters):
        carry, stats = build_step(carry, params, *batches[i % 4])
    n_vox_final = int(stats["num_voxels"])          # forces execution
    dt = time.perf_counter() - t0
    state = carry[0]
    fps = n_iters * B / dt
    log(f"build: {n_iters*B} frames in {dt:.2f}s -> {fps:.1f} frames/s, "
        f"voxels={n_vox_final}, dropped={int(stats['dropped_voxels'])}")

    # query latency (text-query path: 3 imagination images -> top-100)
    qimg = jnp.asarray(rng.integers(0, 255, size=(3, 512, 512, 3),
                                    dtype=np.uint8))
    pos, scores = query_step(state, params, qimg, top_k=100)
    _ = float(scores[0])
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        pos, scores = query_step(state, params, qimg, top_k=100)
        _ = float(scores[0])                        # forces execution
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat) * 1000)
    # the tunneled-TPU host<->device round trip dominates small-latency
    # measurements; report it so the device-side latency is legible
    triv = jax.jit(lambda x: x + 1)
    _ = float(triv(jnp.zeros(8))[0])
    rtt = []
    for _i in range(10):
        t0 = time.perf_counter()
        _ = float(triv(jnp.zeros(8))[0])
        rtt.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtt) * 1000)
    log(f"query p50: {p50:.1f} ms (top score {float(scores[0]):.3f}); "
        f"sync round-trip overhead ~{rtt_ms:.1f} ms")

    print(json.dumps({
        "metric": "memory_build_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_A100_FPS_ESTIMATE, 2),
        "query_localize_p50_ms": round(p50, 2),
        "sync_rtt_ms": round(rtt_ms, 2),
        "backend": backend,
        "batch": B,
        "baseline_note": "A100 reference estimated at 10 fps (unrecorded in repo; see BASELINE.md)",
    }))


if __name__ == "__main__":
    main()
